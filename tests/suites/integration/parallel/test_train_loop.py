"""Device-side training loop (`make_sharded_train_loop`) on the virtual mesh.

The loop is the production dispatch shape on TPU (K optimizer steps per
dispatch via lax.scan — per-step dispatch re-ships the multi-GB param tree
over any non-local link); these tests pin that it computes exactly the same
training trajectory as the per-step `make_sharded_train_step`, and that
per-block rematerialization (`WhisperEncoder(remat=True)`, required to fit
large-v3 training on a 16 GB chip) does not change the numerics.
"""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ser_tpu._internal.config.schema import MeshConfig
from ser_tpu.models.whisper import (
    CHUNK_SAMPLES,
    WhisperConfig,
    WhisperEncoder,
    init_whisper_encoder_params,
)
from ser_tpu.parallel.mesh import build_mesh
from ser_tpu.parallel.train_step import (
    encoder_classifier_loss,
    make_sharded_train_loop,
    make_sharded_train_step,
)


def _fixture(batch, steps=1):
    config = WhisperConfig.tiny()
    rng = np.random.default_rng(7)
    head = {
        "w1": jnp.asarray(
            rng.standard_normal((2 * config.d_model, 16)) * 0.02, jnp.float32
        ),
        "b1": jnp.zeros(16, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((16, 8)) * 0.02, jnp.float32),
        "b2": jnp.zeros(8, jnp.float32),
    }
    shape = (steps, batch, CHUNK_SAMPLES) if steps else (batch, CHUNK_SAMPLES)
    waves = jnp.asarray(rng.standard_normal(shape) * 0.1, dtype=jnp.float32)
    label_shape = (steps, batch) if steps else (batch,)
    labels = jnp.asarray(rng.integers(0, 8, size=label_shape), dtype=jnp.int32)
    return config, head, waves, labels


def test_train_loop_matches_sequential_steps():
    """K scanned steps == K sequential dispatches, loss for loss."""
    config, head, waves, labels = _fixture(batch=4, steps=2)
    encoder = WhisperEncoder(config)
    params = init_whisper_encoder_params(config, seed=0)
    mesh = build_mesh(MeshConfig(model_axis_size=2))

    place, run_steps, loop_opt = make_sharded_train_loop(
        encoder, mesh, optimizer=optax.sgd(1e-3)
    )
    with mesh:
        l_params, l_head, l_waves, l_labels = place(params, head, waves, labels)
        loop_state = loop_opt.init((l_params, l_head))
        l_params, l_head, _, losses = run_steps(
            l_params, l_head, loop_state, l_waves, l_labels
        )
        losses = np.asarray(losses)
    assert losses.shape == (2,)

    step_place, step, step_opt = make_sharded_train_step(
        encoder, mesh, optimizer=optax.sgd(1e-3)
    )
    with mesh:
        s_params, s_head, s_waves, s_labels = step_place(
            params, head, waves[0], labels[0]
        )
        state = step_opt.init((s_params, s_head))
        step_losses = []
        for i in range(2):
            if i:
                s_waves = jnp.asarray(waves[i])
                s_labels = jnp.asarray(labels[i])
            s_params, s_head, state, loss = step(
                s_params, s_head, state, s_waves, s_labels
            )
            step_losses.append(float(loss))
    np.testing.assert_allclose(losses, step_losses, rtol=1e-5)
    # Final params agree too (same trajectory, not just same losses).
    np.testing.assert_allclose(
        np.asarray(l_head["w2"]), np.asarray(s_head["w2"]), rtol=1e-5, atol=1e-7
    )


def test_train_loop_masked_pooling_carries_valid_samples():
    config, head, waves, labels = _fixture(batch=4, steps=2)
    encoder = WhisperEncoder(config)
    params = init_whisper_encoder_params(config, seed=0)
    # data axis 4 so the per-step batch of 4 divides it (dim 1 is sharded).
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    rng = np.random.default_rng(3)
    valid = jnp.asarray(
        rng.integers(CHUNK_SAMPLES // 2, CHUNK_SAMPLES, size=(2, 4)), jnp.int32
    )
    place, run_steps, opt = make_sharded_train_loop(
        encoder, mesh, optimizer=optax.sgd(1e-3)
    )
    with mesh:
        params, head, waves, labels = place(params, head, waves, labels)
        state = opt.init((params, head))
        _, _, _, masked_losses = run_steps(params, head, state, waves, labels, valid)
    masked = np.asarray(masked_losses)
    assert np.all(np.isfinite(masked))
    # The masked pool sees different statistics than the unmasked one.
    first_unmasked = float(
        encoder_classifier_loss(
            encoder,
            init_whisper_encoder_params(config, seed=0),
            _fixture(batch=4, steps=2)[1],
            waves[0],
            labels[0],
        )
    )
    assert masked[0] != pytest.approx(first_unmasked, rel=1e-6)


def test_remat_encoder_numerics_identical():
    """remat=True is a memory schedule, not a numerics change."""
    config, head, waves, labels = _fixture(batch=2, steps=0)
    params = init_whisper_encoder_params(config, seed=0)
    plain = encoder_classifier_loss(
        WhisperEncoder(config), params, head, waves, labels
    )
    remat = encoder_classifier_loss(
        WhisperEncoder(config, remat=True), params, head, waves, labels
    )
    assert float(plain) == pytest.approx(float(remat), abs=1e-6)

    import jax

    g_plain = jax.grad(
        lambda p: encoder_classifier_loss(WhisperEncoder(config), p, head, waves, labels)
    )(params)
    g_remat = jax.grad(
        lambda p: encoder_classifier_loss(
            WhisperEncoder(config, remat=True), p, head, waves, labels
        )
    )(params)
    leaves_plain = jax.tree_util.tree_leaves(g_plain)
    leaves_remat = jax.tree_util.tree_leaves(g_remat)
    for a, b in zip(leaves_plain, leaves_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_remat_dots_policy_numerics_identical():
    """remat_policy='dots' (save Dense outputs, recompute the rest) changes
    only the memory/recompute schedule — loss and grads match full remat."""
    import jax

    config, head, waves, labels = _fixture(batch=2, steps=0)
    params = init_whisper_encoder_params(config, seed=0)

    def loss_for(policy):
        return encoder_classifier_loss(
            WhisperEncoder(config, remat=True, remat_policy=policy),
            params, head, waves, labels,
        )

    assert float(loss_for("full")) == pytest.approx(float(loss_for("dots")), abs=1e-6)
    g_full = jax.grad(
        lambda p: encoder_classifier_loss(
            WhisperEncoder(config, remat=True, remat_policy="full"),
            p, head, waves, labels,
        )
    )(params)
    g_dots = jax.grad(
        lambda p: encoder_classifier_loss(
            WhisperEncoder(config, remat=True, remat_policy="dots"),
            p, head, waves, labels,
        )
    )(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_full), jax.tree_util.tree_leaves(g_dots)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_train_loop_adafactor_state_places_and_trains():
    """Adafactor's factored state (1-D row/col accumulators) survives
    `place_optimizer_state` + the scanned loop: losses finite, params move."""
    from ser_tpu.parallel.train_step import place_optimizer_state

    config, head, waves, labels = _fixture(batch=4, steps=2)
    encoder = WhisperEncoder(config, remat=True, remat_policy="dots")
    params = init_whisper_encoder_params(config, seed=0)
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    place, run_steps, opt = make_sharded_train_loop(
        encoder, mesh, optimizer=optax.adafactor(1e-3)
    )
    with mesh:
        params, head, waves, labels = place(params, head, waves, labels)
        before = np.asarray(head["w2"]).copy()
        state = place_optimizer_state(mesh, opt.init((params, head)))
        params, head, state, losses = run_steps(params, head, state, waves, labels)
        losses = np.asarray(losses)
    assert losses.shape == (2,) and np.all(np.isfinite(losses))
    assert not np.allclose(np.asarray(head["w2"]), before)
