"""Sharding regression contract: the compiled train step really distributes.

GSPMD failures are silent — a wrong PartitionSpec typically falls back to
full replication and the program still runs, just without the memory/compute
win. These tests pin the two observable guarantees of the Megatron layout
(`parallel/sharding.py`): per-device shard bytes shrink by the model-axis
factor, and the compiled module contains the all-reduce collectives the
row-parallel projections and data-parallel gradient sync require.
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
from ser_tpu.parallel.mesh import build_mesh
from ser_tpu.parallel.train_step import make_sharded_train_step


def _compiled_step(mesh, config, encoder, params):
    rng = np.random.default_rng(0)
    head = {
        "w1": jnp.zeros((2 * config.d_model, 16)),
        "b1": jnp.zeros(16),
        "w2": jnp.zeros((16, 8)),
        "b2": jnp.zeros(8),
    }
    wave = jnp.asarray(
        rng.standard_normal((8, CHUNK_SAMPLES)) * 0.1, dtype=jnp.float32
    )
    labels = jnp.zeros(8, jnp.int32)
    place, step, optimizer = make_sharded_train_step(
        encoder, mesh, optimizer=optax.sgd(1e-3)
    )
    with mesh:
        p, h, w, l = place(params, head, wave, labels)
        state = optimizer.init((p, h))
        compiled = step.lower(p, h, state, w, l).compile()
    return p, compiled


def test_tensor_parallel_params_actually_shard():
    config = WhisperConfig.tiny()
    encoder = WhisperEncoder(config)
    params = init_whisper_encoder_params(config, seed=0)
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    placed, _ = _compiled_step(mesh, config, encoder, params)

    tp = mesh.shape["model"]
    # Column-parallel in-proj: output dim divided over the model axis.
    kernel = placed["layer_0"]["mlp_in"]["kernel"]
    assert kernel.addressable_shards[0].data.shape == (
        kernel.shape[0],
        kernel.shape[1] // tp,
    )
    # Row-parallel out-proj: input dim divided.
    out_kernel = placed["layer_0"]["mlp_out"]["kernel"]
    assert out_kernel.addressable_shards[0].data.shape == (
        out_kernel.shape[0] // tp,
        out_kernel.shape[1],
    )
    # Replicated leaves stay whole.
    scale = placed["final_ln"]["scale"]
    assert scale.addressable_shards[0].data.shape == scale.shape

    # Aggregate guard against silent full replication: per-device encoder
    # bytes must be strictly below the full tree (the 2D kernels dominate).
    full_bytes = sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(params)
    )
    shard_bytes = sum(
        leaf.addressable_shards[0].data.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(placed)
    )
    assert shard_bytes < 0.8 * full_bytes


def test_compiled_step_contains_collectives():
    """Row-parallel psums + dp grad sync must appear as all-reduces."""
    config = WhisperConfig.tiny()
    encoder = WhisperEncoder(config)
    params = init_whisper_encoder_params(config, seed=0)
    mesh = build_mesh(MeshConfig(model_axis_size=2))
    _, compiled = _compiled_step(mesh, config, encoder, params)
    hlo = compiled.as_text()
    assert hlo.count("all-reduce") >= 2, (
        "Expected Megatron row-parallel psums and data-parallel gradient "
        "all-reduces in the compiled module; GSPMD inserted none."
    )
