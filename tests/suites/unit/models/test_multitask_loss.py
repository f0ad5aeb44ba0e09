"""Masked uncertainty-weighted multitask loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.models import multitask_loss as mtl


def _params(tasks=("primary_emotion", "valence")):
    return mtl.init_multitask_loss_params(tasks)


def test_zero_log_variance_reduces_to_sum_of_masked_means():
    params = _params()
    losses = {
        "primary_emotion": jnp.asarray([1.0, 3.0]),
        "valence": jnp.asarray([2.0, 100.0]),
    }
    masks = {
        "primary_emotion": jnp.asarray([1, 1]),
        "valence": jnp.asarray([1, 0]),  # second target missing → excluded
    }
    total = mtl.multitask_loss(params, losses, masks)
    assert float(total) == pytest.approx(2.0 + 2.0)  # means 2.0 and 2.0


def test_primary_weight_is_clamped_from_below():
    params = _params(("primary_emotion",))
    # A huge log-variance would shrink exp(-lv) to ~0; the clamp holds 0.25.
    params["log_variances"]["primary_emotion"] = jnp.asarray(10.0)
    total = mtl.multitask_loss(
        params,
        {"primary_emotion": jnp.asarray([4.0])},
        {"primary_emotion": jnp.asarray([1])},
    )
    assert float(total) == pytest.approx(0.25 * 4.0 + 10.0)


def test_auxiliary_weight_is_not_clamped():
    params = _params(("primary_emotion", "valence"))
    params["log_variances"]["valence"] = jnp.asarray(10.0)
    total = mtl.multitask_loss(
        params,
        {"valence": jnp.asarray([4.0]), "primary_emotion": jnp.asarray([0.0])},
        {"valence": jnp.asarray([1]), "primary_emotion": jnp.asarray([1])},
    )
    assert float(total) == pytest.approx(np.exp(-10.0) * 4.0 + 10.0)


def test_fully_masked_task_contributes_zero():
    params = _params()
    total = mtl.multitask_loss(
        params,
        {"primary_emotion": jnp.asarray([1.0]), "valence": jnp.asarray([50.0])},
        {"primary_emotion": jnp.asarray([1]), "valence": jnp.asarray([0])},
    )
    assert float(total) == pytest.approx(1.0)


def test_loss_is_differentiable_wrt_log_variances():
    params = _params(("primary_emotion",))

    def objective(p):
        return mtl.multitask_loss(
            p,
            {"primary_emotion": jnp.asarray([2.0, 4.0])},
            {"primary_emotion": jnp.asarray([1, 1])},
        )

    grads = jax.grad(objective)(params)
    grad = float(grads["log_variances"]["primary_emotion"])
    # d/dlv [exp(-lv)*3 + lv] at lv=0 with clamp inactive: -3 + 1 = -2.
    assert grad == pytest.approx(-2.0)


def test_validation_contract():
    with pytest.raises(ValueError, match="At least one"):
        mtl.init_multitask_loss_params(())
    with pytest.raises(ValueError, match="'\\.'"):
        mtl.init_multitask_loss_params(("a.b",))
    params = _params()
    with pytest.raises(ValueError, match="No available targets"):
        mtl.validate_multitask_inputs(params, {}, {})
    with pytest.raises(ValueError, match="shapes differ"):
        mtl.multitask_loss(
            params,
            {"primary_emotion": jnp.asarray([1.0, 2.0])},
            {"primary_emotion": jnp.asarray([1])},
        )
    with pytest.raises(ValueError, match="minimum_primary_weight"):
        mtl.multitask_loss(params, {}, {}, minimum_primary_weight=0.0)


def test_scalar_losses_promote():
    params = _params(("primary_emotion",))
    total = mtl.multitask_loss(
        params,
        {"primary_emotion": jnp.asarray(5.0)},
        {"primary_emotion": jnp.asarray(1)},
    )
    assert float(total) == pytest.approx(5.0)
