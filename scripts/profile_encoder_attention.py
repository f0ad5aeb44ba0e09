#!/usr/bin/env python
"""Encoder self-attention ablation at the accurate-profile shapes.

The accurate encode's residual perf gap is the HBM-bound attention stream:
at T=1500, d_model=1280, H=20 the (B, H, T, T) score matrix roundtrips HBM
between the two attention matmuls (~38% of encode wall time by roofline
arithmetic, CHANGELOG 0.3.0). This script measures, on the real chip:

- the production einsum path (XLA-fused softmax),
- the canonical Pallas flash kernel at several BlockSizes,
- splash attention (the newer kernel generation),

each as ms per full 32-layer attention stack at batch 8 (240 s of audio),
plus the end-to-end encoder throughput for the winner. Numbers land in
ATTN_ABLATION_r03.json; numerics are cross-checked against the einsum path.

Usage: python scripts/profile_encoder_attention.py [--repeats 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B, T, H, D = 8, 1500, 20, 64  # batch=240s/30s chunks, whisper large-v3 dims
LAYERS = 32
PAD_T = 1536  # 3*512: valid for both 128 and 512 block granularities


def _einsum_attention(q, k, v):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D).astype(np.float32)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _flash_attention(q, k, v, *, block_sizes=None):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    pad = PAD_T - T
    qf, kf, vf = (
        jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
        for t in (q, k, v)
    )
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    ids = jnp.pad(
        jnp.ones((B, T), dtype=jnp.int32), ((0, 0), (0, pad)), constant_values=0
    )
    out = flash_attention(
        qf,
        kf,
        vf,
        segment_ids=SegmentIds(q=ids, kv=ids),
        causal=False,
        sm_scale=1.0 / np.sqrt(D),
        block_sizes=block_sizes,
    )
    return out.transpose(0, 2, 1, 3)[:, :T]


def _splash_attention(q, k, v):
    from jax.experimental.pallas.ops.tpu import splash_attention

    mask = splash_attention.FullMask((PAD_T, PAD_T))
    multi = splash_attention.MultiHeadMask([mask for _ in range(H)])
    kernel = splash_attention.make_splash_mha(
        multi, head_shards=1, q_seq_shards=1
    )
    pad = PAD_T - T
    scale = 1.0 / np.sqrt(D)

    def one(qb, kb, vb):  # (T, H, D) per batch row -> (H, T, D) kernel layout
        qh = (qb.transpose(1, 0, 2) * scale).astype(qb.dtype)
        kh = kb.transpose(1, 0, 2)
        vh = vb.transpose(1, 0, 2)
        seg = splash_attention.SegmentIds(
            q=jnp.pad(jnp.ones((T,), jnp.int32), (0, pad)),
            kv=jnp.pad(jnp.ones((T,), jnp.int32), (0, pad)),
        )
        qp = jnp.pad(qh, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(kh, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vh, ((0, 0), (0, pad), (0, 0)))
        out = kernel(qp, kp, vp, segment_ids=seg)
        return out.transpose(1, 0, 2)[:T]

    return jax.vmap(one)(q, k, v)


def _time_stack(fn, repeats: int) -> tuple[float, np.ndarray]:
    """ms per 32-layer attention stack; returns (ms, probe output)."""

    @jax.jit
    def stack(q, k, v):
        def body(i, carry):
            acc, qq = carry
            out = fn(qq + i * 1e-6, k, v)
            return acc + jnp.sum(out.astype(jnp.float32)), qq
        acc, _ = jax.lax.fori_loop(0, LAYERS * repeats, body, (jnp.float32(0.0), q))
        return acc

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.1, jnp.bfloat16)
    probe = np.asarray(fn(q, k, v).astype(jnp.float32))  # numerics probe
    float(stack(q, k, v))  # compile + warm
    start = time.perf_counter()
    float(stack(q, k, v))
    elapsed = time.perf_counter() - start
    return elapsed * 1000.0 / repeats, probe


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=8)
    parser.add_argument("--out", default="ATTN_ABLATION_r03.json")
    args = parser.parse_args()

    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    results: dict[str, float] = {}
    base_ms, base_probe = _time_stack(_einsum_attention, args.repeats)
    results["einsum_xla"] = round(base_ms, 3)
    print(f"einsum_xla: {base_ms:.2f} ms/stack")

    def blocks(bq, bkM, bk, bb=1):
        return BlockSizes(
            block_q=bq, block_k_major=bkM, block_k=bk, block_b=bb,
            block_q_major_dkv=bq, block_k_major_dkv=bkM, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bkM, block_k_dq=bk, block_q_dq=bq,
        )

    candidates = {
        "flash_default": None,
        "flash_q512_k512": blocks(512, 512, 512),
        "flash_q1536_k512": blocks(1536, 512, 512),
        "flash_q512_k1536": blocks(512, 1536, 1536),
        "flash_q1536_k1536": blocks(1536, 1536, 1536),
        "flash_q768_k768": blocks(768, 768, 768),
    }
    for name, bs in candidates.items():
        try:
            ms, probe = _time_stack(
                functools.partial(_flash_attention, block_sizes=bs), args.repeats
            )
            err = float(np.max(np.abs(probe - base_probe)))
            results[name] = round(ms, 3)
            print(f"{name}: {ms:.2f} ms/stack (max|Δ| vs einsum {err:.4f})")
        except Exception as exc:  # noqa: BLE001 - ablation records failures
            results[name] = float("nan")
            print(f"{name}: FAILED {type(exc).__name__}: {exc}")

    try:
        ms, probe = _time_stack(_splash_attention, args.repeats)
        err = float(np.max(np.abs(probe - base_probe)))
        results["splash"] = round(ms, 3)
        print(f"splash: {ms:.2f} ms/stack (max|Δ| vs einsum {err:.4f})")
    except Exception as exc:  # noqa: BLE001
        results["splash"] = float("nan")
        print(f"splash: FAILED {type(exc).__name__}: {exc}")

    payload = {
        "what": "Encoder self-attention ablation (accurate profile shapes)",
        "shapes": {"batch": B, "seq": T, "heads": H, "head_dim": D, "layers": LAYERS},
        "units": "ms per 32-layer attention stack, batch 8, bf16",
        "results": results,
        "hbm_roofline_ms_stack": round(
            # score write + read around softmax (bf16) per layer, both matmul
            # operands streamed once: 2 * B*H*T*T*2 bytes @ 819 GB/s.
            2 * B * H * T * T * 2 * LAYERS / 819e9 * 1000, 1
        ),
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
