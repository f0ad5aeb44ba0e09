"""Sharding rules: where each tensor lives on the mesh.

Recipe (scaling-book style): annotate inputs/params with NamedShardings and
let XLA insert the collectives. Encoder parameters shard tensor-parallel over
the ``model`` axis on the FFN contraction dims and attention projections
(Megatron layout: column-parallel in-proj, row-parallel out-proj → one psum
per block); batches shard over ``data``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ser_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Leading-axis data-parallel placement for an ndim-rank batch tensor."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def stacked_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Data-parallel placement on dim 1 of a (steps, batch, ...) super-batch
    (dim 0 is scan time in the K-steps-per-dispatch training loop)."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def _spec_for_param(path: tuple[str, ...], value: jax.Array) -> P:
    """Tensor-parallel spec for one encoder parameter by name/shape.

    Column-parallel: q/k/v and FFN-in kernels shard their output dim.
    Row-parallel: attention-out and FFN-out kernels shard their input dim.
    Everything else (norms, convs, biases of row-parallel layers) replicates.
    """
    name = "/".join(path)
    if value.ndim != 2:
        return P()
    if any(tag in name for tag in ("ffn_in", "mlp_in", "/q/", "/k/", "/v/")) or name.endswith(
        ("q/kernel", "k/kernel", "v/kernel")
    ):
        return P(None, MODEL_AXIS)
    if any(tag in name for tag in ("ffn_out", "mlp_out", "attn_out", "/out/")):
        # NO trailing None: with_sharding_constraint normalizes
        # P('model', None) to P('model',), and the two are UNEQUAL in the
        # jit cache key — a step whose inputs were placed with the trailing
        # None recompiles when fed its own (constrained) outputs.
        return P(MODEL_AXIS)
    return P()


def encoder_param_sharding(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for an encoder parameter tree."""

    def assign(path, value):
        keys = tuple(
            getattr(entry, "key", getattr(entry, "name", str(entry))) for entry in path
        )
        return NamedSharding(mesh, _spec_for_param(keys, value))

    return jax.tree_util.tree_map_with_path(assign, params)


__all__ = ["batch_sharding", "encoder_param_sharding", "replicated"]
