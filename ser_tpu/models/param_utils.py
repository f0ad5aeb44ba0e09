"""Parameter-tree utilities shared by the model families."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params_bf16(params: dict) -> dict:
    """Float params → bfloat16 storage (integer/bool leaves untouched).

    For inference-only use with a bf16 compute policy: the matmul path casts
    f32→bf16 per op anyway (XLA hoists those casts out of decode loops, so
    f32 storage kept BOTH copies resident in HBM); storing bf16 halves the
    footprint at identical matmul numerics. LayerNorm affines (consumed in
    f32) see bf16-rounded values — within the documented bf16 policy error.
    """

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.asarray(leaf, dtype=jnp.bfloat16)
        return leaf

    return jax.tree_util.tree_map(cast, params)


__all__ = ["cast_params_bf16"]
