"""Fused Pallas kernels for the KV-cache decode step's attention groups.

MEASURED NEGATIVE RESULT (round 3, real v5e — ``DECODE_ABLATION_r03.json``):
this gridless variant runs 5.38 ms/step vs XLA's 4.74 at large-v3/batch 2
(align32: 5.58 vs 4.69), and the earlier per-(row, head) grid variant ran
5.0. The step is weight-bandwidth-bound (~1.5 GB of layer weights per token),
XLA already pipelines those reads, and the kernels' unrolled (1, Dh)×(Dh, S)
matmuls underutilize the MXU. ``fused=True`` stays available (token-for-token
parity pinned by tests) for future hardware/compiler revisions; the default
decode path keeps XLA.

Original motivation: the decode loop sits ~1.5× above its ~3.2 ms HBM
roofline, and ``scripts/profile_decode_ablation.py`` apportions the overhang
to the self-attention (~1.9 ms vs ~0.7 roofline) and cross-attention (~1.6 ms
vs ~0.6) groups. The MLP group is already AT its bandwidth bound
(~1.06 ms vs ~1.02), so it stays in XLA in every variant.

Mosaic-shaped design (each rule below broke a previous draft on the real
compiler):
- No in-kernel reshapes that change the lane dimension (``tpu.reshape``
  rejected): heads are a grid dimension and every block's trailing two dims
  either match the array or are (8, 128)-divisible.
- No dynamic sublane indexing (``cannot statically prove index is a multiple
  of 8``): the current row/head is selected with an iota-mask reduction over
  a full block, and per-row writes are masked read-modify-writes on full
  blocks held in scratch.
- Grid is ``(H, R)`` with rows fastest, so the per-head output blocks (the
  alignment weights) are visited consecutively and the f32 output-projection
  accumulator (a full ``(R, d)`` scratch) collects every head's partial before
  ONE full-block flush at the last step.

Numerics mirror ``models/whisper_decode._decoder_token_step`` op for op:
float32 layer norm, bf16 matmuls with f32 accumulation rounded to bf16 at op
outputs, f32 softmax, bf16 residual adds. Per-head f32 partial sums replace
one long f32 chain (O(1e-7) relative reassociation); fused and unfused
decodes agree token for token (pinned by CPU interpret-mode tests).

K/V cache updates stay in XLA (``dynamic_update_slice`` aliases in place);
only the attention arithmetic fuses.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# The fully-resident working sets (22.2 MB for the cross block at
# large-v3/batch 2) exceed Mosaic's 16 MB default scoped-vmem budget; v5e has
# 128 MB of VMEM, so raise the per-kernel cap rather than tile the operands
# (tiling is exactly the grid sequentialization that measured slower).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _use_interpret() -> bool:
    """Interpret mode off-TPU: the same kernels run (slowly) everywhere."""
    return jax.default_backend() != "tpu"


def _ln_f32(x, scale, bias, eps):
    """flax ``nn.LayerNorm`` fast-variance numerics in float32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean_sq - jnp.square(mean))
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _bf16_dot(a, w):
    """XLA's matmul contract: f32 accumulation, weight dtype at the output."""
    return jnp.dot(a, w, preferred_element_type=jnp.float32).astype(w.dtype)


# --------------------------------------------------------------------------- #
# Kernel A: LN → fused-QKV projection (one op instead of norm+matmul+bias)
# --------------------------------------------------------------------------- #


def _ln_qkv_kernel(x_ref, scale_ref, bias_ref, wqkv_ref, bqkv_ref, out_ref, *, eps):
    h = _ln_f32(x_ref[:], scale_ref[:], bias_ref[:], eps)
    out_ref[:] = (_bf16_dot(h.astype(wqkv_ref.dtype), wqkv_ref[:]) + bqkv_ref[:]).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("eps",))
def ln_qkv_project(
    x: jax.Array,  # (R, d)
    ln_scale: jax.Array,  # (1, d)
    ln_bias: jax.Array,  # (1, d)
    w_qkv: jax.Array,  # (d, 3d)
    b_qkv: jax.Array,  # (1, 3d)
    *,
    eps: float,
) -> jax.Array:
    """Fused pre-norm + QKV projection; returns (R, 3d)."""
    rows = x.shape[0]
    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, w_qkv.shape[1]), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(x, ln_scale, ln_bias, w_qkv, b_qkv)


# --------------------------------------------------------------------------- #
# Kernel B: masked cached self-attention + out-projection + residual
# --------------------------------------------------------------------------- #


def _stack_rows(rows_list: list, d_model: int) -> jax.Array:
    """Combines per-row ``(1, d)`` values into ``(R, d)`` without reshapes.

    Static sublane stores, ``concatenate``, AND full-width boolean masks all
    hit Mosaic layout rules (a ``(R, d)`` i1 ``where`` mask died on an
    "Invalid relayout" between bf16/f32 tilings); a narrow f32 one-hot column
    broadcast-multiplied against each row is layout-trivial. Returns float32;
    the caller casts.
    """
    total = len(rows_list)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)
    combined = jnp.zeros((total, d_model), dtype=jnp.float32)
    for index, value in enumerate(rows_list):
        onehot = (row_ids == index).astype(jnp.float32)  # (R, 1)
        combined = combined + onehot * value.astype(jnp.float32)
    return combined


def _self_attend_kernel(
    pos_ref,  # SMEM (1,)
    q_ref,  # (R, H, Dh)
    k_ref,  # (R, H, Dh, Smax)
    v_ref,  # (R, H, Smax, Dh)
    wout_ref,  # (H, Dh, d)
    bout_ref,  # (1, d)
    x_ref,  # (R, d) residual
    out_ref,  # (R, d)
):
    rows, n_heads, head_dim = q_ref.shape
    s_max = k_ref.shape[-1]
    d_model = x_ref.shape[-1]
    cdt = q_ref.dtype
    # Trace-time sqrt: math.sqrt on the static head dim (Mosaic has no
    # runtime sqrt legalization); same divide-by-bf16-constant as XLA.
    inv_scale = jnp.asarray(math.sqrt(head_dim), dtype=cdt)
    visible = jax.lax.broadcasted_iota(jnp.int32, (1, s_max), 1) <= pos_ref[0]
    bias = jnp.where(visible, 0.0, _NEG_INF)

    out_rows: list[jax.Array] = []
    for row in range(rows):
        acc = jnp.zeros((1, d_model), dtype=jnp.float32)
        for head in range(n_heads):
            q = q_ref[row, head : head + 1, :]  # (1, Dh) — static indices
            k = k_ref[row, head]  # (Dh, Smax)
            v = v_ref[row, head]  # (Smax, Dh)
            scores = _bf16_dot(q, k) / inv_scale
            scores = scores + bias.astype(scores.dtype)
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            out_h = _bf16_dot(weights.astype(cdt), v)  # (1, Dh)
            acc = acc + jnp.dot(out_h, wout_ref[head], preferred_element_type=jnp.float32)
        y = acc.astype(cdt) + bout_ref[:]
        out_rows.append(x_ref[row : row + 1, :] + y)
    out_ref[:] = _stack_rows(out_rows, d_model).astype(out_ref.dtype)


def self_attend_and_out(
    q_heads: jax.Array,  # (R, H, Dh)
    k_cache: jax.Array,  # (R, H, Dh, Smax)
    v_cache: jax.Array,  # (R, H, Smax, Dh)
    w_out_heads: jax.Array,  # (H, Dh, d)
    b_out: jax.Array,  # (1, d)
    x_residual: jax.Array,  # (R, d)
    position: jax.Array,  # scalar int32
) -> jax.Array:
    """Fused masked self-attention + out-projection + residual, ONE kernel step.

    Gridless by design: a per-(row, head) grid measured SLOWER than the XLA
    baseline (5.0 vs 4.7 ms/step at large-v3/batch 2 — 1920 sequential grid
    steps per token out-cost the saved XLA dispatches), so the loops unroll
    INSIDE one kernel invocation over fully-resident VMEM operands
    (caches 9.2 MB + w_out 3.3 MB at large-v3/batch 2).
    """
    rows, d_model = x_residual.shape
    return pl.pallas_call(
        _self_attend_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, d_model), x_residual.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(
        jnp.asarray(position, dtype=jnp.int32).reshape((1,)),
        q_heads,
        k_cache,
        v_cache,
        w_out_heads,
        b_out,
        x_residual,
    )


# --------------------------------------------------------------------------- #
# Kernel C: the whole cross-attention block (LN → Q → attend → out → +x)
# --------------------------------------------------------------------------- #


def _cross_step_kernel(
    x_ref,  # (R, d)
    scale_ref,  # (1, d)
    bias_ref,  # (1, d)
    wq_ref,  # (H, d, Dh)
    bq_ref,  # (H, 1, Dh)
    k_ref,  # (R, H, Dh, S)
    v_ref,  # (R, H, S, Dh)
    wout_ref,  # (H, Dh, d)
    bout_ref,  # (1, d)
    out_ref,  # (R, d)
    weights_ref,  # (H, R, S) f32 — alignment capture
    *,
    eps: float,
):
    rows, d_model = x_ref.shape
    n_heads = wq_ref.shape[0]
    head_dim = wq_ref.shape[-1]
    s_len = k_ref.shape[-1]
    cdt = x_ref.dtype
    inv_scale = jnp.asarray(math.sqrt(head_dim), dtype=cdt)
    h_normed = _ln_f32(x_ref[:], scale_ref[:], bias_ref[:], eps).astype(cdt)  # (R, d)

    out_rows: list[jax.Array] = []
    weight_rows: list[list[jax.Array]] = [[] for _ in range(n_heads)]
    for row in range(rows):
        x_row = h_normed[row : row + 1, :]
        acc = jnp.zeros((1, d_model), dtype=jnp.float32)
        for head in range(n_heads):
            q = _bf16_dot(x_row, wq_ref[head]) + bq_ref[head]  # (1, Dh)
            k = k_ref[row, head]  # (Dh, S)
            v = v_ref[row, head]  # (S, Dh)
            scores = _bf16_dot(q, k) / inv_scale
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)  # (1, S)
            weight_rows[head].append(weights)
            out_h = _bf16_dot(weights.astype(cdt), v)  # (1, Dh)
            acc = acc + jnp.dot(out_h, wout_ref[head], preferred_element_type=jnp.float32)
        y = acc.astype(cdt) + bout_ref[:]
        out_rows.append(x_ref[row : row + 1, :] + y)
    out_ref[:] = _stack_rows(out_rows, d_model).astype(out_ref.dtype)
    for head in range(n_heads):
        weights_ref[head] = _stack_rows(weight_rows[head], s_len)


@functools.partial(jax.jit, static_argnames=("eps",))
def cross_attention_step(
    x: jax.Array,  # (R, d)
    ln_scale: jax.Array,  # (1, d)
    ln_bias: jax.Array,  # (1, d)
    w_q_heads: jax.Array,  # (H, d, Dh)
    b_q_heads: jax.Array,  # (H, 1, Dh)
    cross_k: jax.Array,  # (R, H, Dh, S)
    cross_v: jax.Array,  # (R, H, S, Dh)
    w_out_heads: jax.Array,  # (H, Dh, d)
    b_out: jax.Array,  # (1, d)
    *,
    eps: float,
) -> tuple[jax.Array, jax.Array]:
    """The full cross-attention block in one kernel.

    Returns (x' ``(R, d)``, f32 attention weights ``(H, R, S)``); alignment
    capture indexes ``weights[head]`` directly. Gridless single-step kernel
    — the entire block's working set (K/V 7.7 MB + w_q/w_o 6.6 MB at
    large-v3/batch 2) is VMEM-resident; see :func:`self_attend_and_out` for
    why the per-head grid variant was abandoned.
    """
    rows, d_model = x.shape
    n_heads, _, _ = w_q_heads.shape
    s_len = cross_k.shape[-1]
    return pl.pallas_call(
        functools.partial(_cross_step_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((rows, d_model), x.dtype),
            jax.ShapeDtypeStruct((n_heads, rows, s_len), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_use_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(x, ln_scale, ln_bias, w_q_heads, b_q_heads, cross_k, cross_v, w_out_heads, b_out)


# --------------------------------------------------------------------------- #
# Per-call weight re-layouts (host-side, once per decode dispatch)
# --------------------------------------------------------------------------- #


def per_head_out_proj(w_out: jax.Array, n_heads: int) -> jax.Array:
    """``(d, d)`` output projection → ``(H, Dh, d)`` per-head blocks."""
    d_in, d_out = w_out.shape
    return w_out.reshape(n_heads, d_in // n_heads, d_out)


def per_head_q_proj(w_q: jax.Array, b_q: jax.Array, n_heads: int) -> tuple[jax.Array, jax.Array]:
    """``(d, d)`` Q projection → ``(H, d, Dh)`` blocks + ``(H, 1, Dh)`` bias."""
    d_in, d_out = w_q.shape
    head_dim = d_out // n_heads
    w = jnp.transpose(w_q.reshape(d_in, n_heads, head_dim), (1, 0, 2))
    b = b_q.reshape(n_heads, 1, head_dim)
    return w, b


__all__ = [
    "cross_attention_step",
    "ln_qkv_project",
    "per_head_out_proj",
    "per_head_q_proj",
    "self_attend_and_out",
]
