"""Sharded train-state checkpoint/resume on the virtual mesh.

The contract: interrupting the scanned training loop, checkpointing, and
resuming in "another process" (fresh template state, restore by shardings)
continues the EXACT trajectory — and tensor-parallel leaves come back
sharded, not replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ser_tpu._internal.config.schema import MeshConfig
from ser_tpu.models.whisper import (
    CHUNK_SAMPLES,
    WhisperConfig,
    WhisperEncoder,
    init_whisper_encoder_params,
)
from ser_tpu.parallel.checkpoint import restore_train_state, save_train_state
from ser_tpu.parallel.mesh import build_mesh
from ser_tpu.parallel.train_step import make_sharded_train_loop


def _head(config, rng):
    return {
        "w1": jnp.asarray(
            rng.standard_normal((2 * config.d_model, 16)) * 0.02, jnp.float32
        ),
        "b1": jnp.zeros(16, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((16, 8)) * 0.02, jnp.float32),
        "b2": jnp.zeros(8, jnp.float32),
    }


def test_checkpoint_resume_continues_exact_trajectory(tmp_path):
    config = WhisperConfig.tiny()
    encoder = WhisperEncoder(config)
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    rng = np.random.default_rng(11)
    waves = jnp.asarray(
        rng.standard_normal((4, 4, CHUNK_SAMPLES)) * 0.1, dtype=jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 8, size=(4, 4)), dtype=jnp.int32)
    place, run_steps, optimizer = make_sharded_train_loop(
        encoder, mesh, optimizer=optax.adam(1e-3)
    )

    # Uninterrupted run: 4 steps.
    with mesh:
        p0, h0, w0, l0 = place(
            init_whisper_encoder_params(config, seed=0), _head(config, np.random.default_rng(11)), waves, labels
        )
        state0 = optimizer.init((p0, h0))
        _, _, _, straight = run_steps(p0, h0, state0, w0, l0)
        straight = np.asarray(straight)

    # Interrupted run: 2 steps, checkpoint, "new process" resume, 2 more.
    with mesh:
        p1, h1, w1, l1 = place(
            init_whisper_encoder_params(config, seed=0), _head(config, np.random.default_rng(11)), waves, labels
        )
        state1 = optimizer.init((p1, h1))
        p1, h1, state1, first = run_steps(p1, h1, state1, w1[:2], l1[:2])
        ckpt = save_train_state(
            tmp_path / "trainstate",
            encoder_params=p1,
            head_params=h1,
            opt_state=state1,
            step=2,
        )
        # Fresh template state (what a resuming process would initialize).
        pt, ht, _, _ = place(
            init_whisper_encoder_params(config, seed=99), _head(config, np.random.default_rng(0)), waves, labels
        )
        statet = optimizer.init((pt, ht))
        rp, rh, rstate, step = restore_train_state(
            ckpt,
            mesh=mesh,
            encoder_params_like=pt,
            head_params_like=ht,
            opt_state_like=statet,
        )
        assert step == 2
        _, _, _, rest = run_steps(rp, rh, rstate, w1[2:], l1[2:])
    resumed = np.concatenate([np.asarray(first), np.asarray(rest)])
    np.testing.assert_allclose(resumed, straight, rtol=1e-6, atol=1e-7)

    # Tensor-parallel kernels restore SHARDED (their template's placement),
    # not replicated.
    kernel = rp["layer_0"]["mlp_in"]["kernel"]
    tp = mesh.shape["model"]
    assert kernel.addressable_shards[0].data.shape == (
        kernel.shape[0],
        kernel.shape[1] // tp,
    )
    # Adam moments carry the same layout as their params.
    mu_kernel = rstate[0].mu[0]["layer_0"]["mlp_in"]["kernel"]
    assert mu_kernel.addressable_shards[0].data.shape == (
        mu_kernel.shape[0],
        mu_kernel.shape[1] // tp,
    )
