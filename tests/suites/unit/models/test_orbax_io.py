"""Orbax checkpoint round-trip tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu._internal.models.orbax_io import load_checkpoint, save_checkpoint


def test_pytree_round_trip(tmp_path):
    state = {
        "layer_0": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.zeros(4)},
        "scale": jnp.asarray(2.5),
    }
    path = save_checkpoint(state, tmp_path / "ckpt")
    restored = load_checkpoint(path)
    np.testing.assert_allclose(restored["layer_0"]["kernel"], np.arange(12.0).reshape(3, 4))
    np.testing.assert_allclose(restored["scale"], 2.5)


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(tmp_path / "nope")


def test_encoder_params_keyed_by_model_id(tmp_path):
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.models.orbax_io import (
        checkpoint_encoder_params,
        restore_encoder_params,
    )

    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_MODEL_CACHE_DIR": str(tmp_path)})
    )
    params = {"w": jnp.ones((2, 2))}
    checkpoint_encoder_params(params, model_id="org/model-a", settings=settings)
    restored = restore_encoder_params(model_id="org/model-a", settings=settings)
    np.testing.assert_allclose(restored["w"], np.ones((2, 2)))


def test_overwrite_is_crash_safe(tmp_path):
    """Overwriting saves to a staging sibling first; the old checkpoint is
    removed only after the new one is fully committed, and a committed
    staging copy is recoverable."""
    import numpy as np

    from ser_tpu._internal.models import orbax_io

    target = tmp_path / "ckpt" / "latest"
    orbax_io.save_checkpoint({"w": np.ones(3)}, target)
    orbax_io.save_checkpoint({"w": np.full(3, 2.0)}, target)
    restored = orbax_io.load_checkpoint(target)
    assert float(np.asarray(restored["w"])[0]) == 2.0
    assert not target.with_name(target.name + ".staging").exists()

    # Simulated crash between rmtree(old) and rename(staging): recovery.
    import shutil

    staging = target.with_name(target.name + ".staging")
    shutil.move(str(target), str(staging))
    restored = orbax_io.load_checkpoint(target)
    assert float(np.asarray(restored["w"])[0]) == 2.0
    assert target.exists() and not staging.exists()
