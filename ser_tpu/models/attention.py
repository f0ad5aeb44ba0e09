"""Attention dispatch: Pallas flash attention on TPU, einsum elsewhere.

Unfused attention materializes (B, H, T, T) score tensors — at the accurate
profile's T=1500 that is gigabytes of HBM traffic per batch and the dominant
cost of the encode (SURVEY §6 headline metric). On TPU this module routes to
the canonical Pallas flash-attention kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) with:

- sequence padding to the kernel's block granularity,
- padding masked via segment ids (valid=0, pad=1 so cross-segment attention is
  cut), which also carries the encoders' variable-length frame masks, and
- **full-sequence block sizes**: the kernel's DEFAULT BlockSizes lose to XLA
  2.6x at the encode shapes (382 vs 147 ms per 32-layer stack), but
  block_q = block_k = padded_T runs the same stack in 65 ms — 2.26x FASTER
  than XLA's einsum attention (ATTN_ABLATION_r03.json, v5e, bf16, T=1500,
  H=20, D=64, batch 8; max|delta| vs einsum 1e-4).

The einsum path remains the reference implementation (CPU tests, decoders) and
the numerical ground truth the flash path is verified against.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_FLASH_BLOCK = 512
#: Largest single block edge: a (2048, 2048) f32 score block is 16 MB of VMEM
#: scratch, comfortably inside v5e's budget next to the q/k/v tiles.
_MAX_BLOCK = 2048


def _flash_enabled() -> bool:
    # Default ON for accelerators: with full-sequence BlockSizes the Pallas
    # flash kernel beats XLA's fused einsum attention 2.26x at the encode
    # shapes (ATTN_ABLATION_r03.json; the round-2 negative result used the
    # kernel's default blocks, which lose 2.6x). SER_FLASH_ATTENTION=0
    # restores the einsum path; CPU always uses einsum.
    if os.environ.get("SER_FLASH_ATTENTION", "1").strip().lower() not in ("1", "true", "on"):
        return False
    return jax.default_backend() not in ("cpu",)


def _pad_len(length: int) -> int:
    # The kernel requires divisibility by its major block sizes (up to 512).
    block = _FLASH_BLOCK if length >= _FLASH_BLOCK else 128
    return ((length + block - 1) // block) * block


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    frame_mask: jax.Array | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Bidirectional MHA. q/k/v: (B, T, H, D) → (B, T, H, D).

    ``frame_mask`` (B, T) excludes padded frames from keys/queries.
    """
    if _flash_enabled():
        return _flash_path(q, k, v, frame_mask=frame_mask)
    return _einsum_path(q, k, v, frame_mask=frame_mask, compute_dtype=compute_dtype)


def _einsum_path(q, k, v, *, frame_mask, compute_dtype):
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(head_dim, dtype=compute_dtype)
    )
    if frame_mask is not None:
        bias = jnp.where(frame_mask[:, None, None, :], 0.0, -1e30)
        scores = scores + bias.astype(scores.dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _block_sizes(padded: int):
    """Full-sequence blocks (the measured optimum), VMEM-capped.

    ``padded`` is a multiple of 128 (<512) or 512 (>=512); every candidate
    edge below divides it. Larger blocks amortize the kernel's softmax
    rescaling and keep the score tile resident in VMEM across the whole
    k-sweep — the measured ordering at T=1536 was 1536x1536 (64.9 ms) <
    1536x512 (71.3) < 512x512 (75.8) < defaults (382) vs einsum 146.8.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    if padded <= _MAX_BLOCK:
        edge = padded
    else:
        edge = max(b for b in (2048, 1536, 1024, 512) if padded % b == 0)
    # Backward kernels carry extra per-block scratch (dk/dv accumulators +
    # recomputed scores): a 1536 edge needs 19.5 MB of scoped VMEM vs the
    # 16 MB budget (measured OOM in flash_mha_bwd_dkv on v5e at the training
    # step's large-v3 shapes). 512 keeps every bwd tile resident; forward
    # keeps the measured full-sequence optimum.
    bwd_edge = min(edge, 512) if padded % 512 == 0 else edge
    return BlockSizes(
        block_q=edge,
        block_k_major=edge,
        block_k=edge,
        block_b=1,
        block_q_major_dkv=bwd_edge,
        block_k_major_dkv=bwd_edge,
        block_k_dkv=bwd_edge,
        block_q_dkv=bwd_edge,
        block_k_major_dq=bwd_edge,
        block_k_dq=bwd_edge,
        block_q_dq=bwd_edge,
    )


def _flash_path(q, k, v, *, frame_mask):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    batch, seq_len, heads, head_dim = q.shape
    padded = _pad_len(seq_len)
    pad = padded - seq_len

    def to_bhts(t):
        t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else t
        return t.transpose(0, 2, 1, 3)  # (B, H, T, D)

    qf, kf, vf = to_bhts(q), to_bhts(k), to_bhts(v)

    if frame_mask is None and pad == 0:
        segment_ids = None
    else:
        valid = (
            frame_mask
            if frame_mask is not None
            else jnp.ones((batch, seq_len), dtype=bool)
        )
        ids = jnp.pad(
            valid.astype(jnp.int32), ((0, 0), (0, pad)), constant_values=0
        )
        # valid positions → segment 1, padding → segment 0: flash masks
        # cross-segment pairs, which is exactly the frame-mask semantics.
        segment_ids = SegmentIds(q=ids, kv=ids)

    out = flash_attention(
        qf,
        kf,
        vf,
        segment_ids=segment_ids,
        causal=False,
        sm_scale=1.0 / (head_dim**0.5),
        block_sizes=_block_sizes(padded),
    )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :seq_len].astype(q.dtype)


__all__ = ["multi_head_attention"]
