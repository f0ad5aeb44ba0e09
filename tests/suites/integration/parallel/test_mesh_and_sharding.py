"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ser_tpu._internal.config.schema import MeshConfig
from ser_tpu.parallel.mesh import build_mesh, mesh_shape_for
from ser_tpu.parallel.sharding import batch_sharding, encoder_param_sharding
from ser_tpu.parallel.train_step import make_sharded_train_step
from ser_tpu.models.whisper import (
    CHUNK_SAMPLES,
    WhisperConfig,
    WhisperEncoder,
    init_whisper_encoder_params,
)


def test_mesh_shape_resolution():
    assert mesh_shape_for(8, MeshConfig()) == (8, 1)
    assert mesh_shape_for(8, MeshConfig(model_axis_size=2)) == (4, 2)
    assert mesh_shape_for(8, MeshConfig(data_axis_size=2, model_axis_size=4)) == (2, 4)
    with pytest.raises(ValueError):
        mesh_shape_for(8, MeshConfig(model_axis_size=3))


def test_build_mesh_uses_all_devices():
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())


def test_encoder_param_sharding_specs():
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    config = WhisperConfig.tiny()
    params = init_whisper_encoder_params(config)
    shardings = encoder_param_sharding(mesh, params)
    # FFN in-proj: column parallel (output dim over model axis).
    spec_in = shardings["layer_0"]["mlp_in"]["kernel"].spec
    assert spec_in == jax.sharding.PartitionSpec(None, "model")
    # FFN out-proj: row parallel (input dim over model axis).
    spec_out = shardings["layer_0"]["mlp_out"]["kernel"].spec
    # No trailing None: P("model", None) != P("model") in the jit cache key,
    # and with_sharding_constraint/GSPMD normalize to the short form.
    assert spec_out == jax.sharding.PartitionSpec("model")
    # Norm scales replicate.
    assert shardings["final_ln"]["scale"].spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_runs_and_matches_single_device():
    """The dp+tp sharded step must produce the same loss as unsharded."""
    config = WhisperConfig.tiny()
    encoder = WhisperEncoder(config)
    params = init_whisper_encoder_params(config, seed=0)

    rng = np.random.default_rng(0)
    head = {
        "w1": jnp.asarray(rng.standard_normal((2 * config.d_model, 16)) * 0.02, jnp.float32),
        "b1": jnp.zeros(16, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((16, 8)) * 0.02, jnp.float32),
        "b2": jnp.zeros(8, jnp.float32),
    }
    waveform = jnp.asarray(
        rng.standard_normal((8, CHUNK_SAMPLES)) * 0.1, dtype=jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 8, size=8), dtype=jnp.int32)

    from ser_tpu.parallel.train_step import encoder_classifier_loss

    reference_loss = float(encoder_classifier_loss(encoder, params, head, waveform, labels))

    mesh = build_mesh(MeshConfig(model_axis_size=2))
    place, step, optimizer = make_sharded_train_step(
        encoder, mesh, optimizer=optax.sgd(1e-3)
    )
    with mesh:
        p_params, p_head, p_wave, p_labels = place(params, head, waveform, labels)
        opt_state = optimizer.init((p_params, p_head))
        new_params, new_head, _, loss = step(p_params, p_head, opt_state, p_wave, p_labels)
    assert float(loss) == pytest.approx(reference_loss, rel=1e-4)
    # Parameters actually changed (a real update happened).
    delta = float(
        jnp.abs(new_head["w2"] - head["w2"]).max()
    )
    assert delta > 0


def test_batch_sharding_distributes_leading_axis():
    mesh = build_mesh(MeshConfig())
    sharding = batch_sharding(mesh, 2)
    x = jax.device_put(jnp.zeros((8, 4)), sharding)
    assert len(x.addressable_shards) == len(jax.devices())
    assert x.addressable_shards[0].data.shape == (1, 4)
