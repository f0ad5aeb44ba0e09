#!/usr/bin/env python
"""Int8 MXU throughput probe at accurate-encoder matmul shapes.

ENCODER_BUDGET_r03.json accounts the bf16 encode: the projection-matmul
stream runs ~143 TF/s (~73% of the 197 TF/s bf16 peak) and is the largest
single component (~105 of 187 ms). The v5e MXU doubles peak for int8
(394 TOPs), so quantized matmuls are the one remaining >10% encode lever.
Decode-side int8 was a measured negative (op-latency bound, see
COMPONENTS.md known-gaps #3) — but encode is MXU-bound, the regime where
int8 actually pays.

Measures, per encoder-layer matmul chain (QKV -> out -> MLP up -> MLP down)
at batch 8 x T=1500 tokens, d=1280, FFN=5120, looped 32 layers inside one
jit with the same scalar-readback harness as the other ablations:

- bf16 baseline (the production stream),
- int8 ceiling: pre-quantized int8 weights AND activations, int8xint8 ->
  int32 dot, no scaling ops — the hardware's best case,
- int8 practical: per-channel int8 weights, dynamic per-token activation
  quantization (abs-max), dequant epilogue — what a real int8 encode lane
  would execute.

Writes INT8_MATMUL_r03.json. Usage: python scripts/profile_int8_matmul.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B = 8
T = 1500
D = 1280
FFN = 4 * D
LAYERS = 32
TOKENS = B * T
# MACs per token per layer: QKV (D*3D) + out (D*D) + MLP (2*D*FFN)
LAYER_TFLOP = 2 * TOKENS * (D * 3 * D + D * D + 2 * D * FFN) / 1e12


def _timed_stack(stack_fn, *args, repeats: int) -> float:
    """ms per single-layer-chain iteration; loop lives inside the jit."""

    @jax.jit
    def run(first, *rest):
        def body(i, acc):
            return stack_fn(acc + i * jnp.asarray(0, acc.dtype), *rest)

        return jnp.sum(
            jax.lax.fori_loop(0, LAYERS * repeats, body, first).astype(jnp.float32)
        )

    float(run(*args))  # compile + warm
    start = time.perf_counter()
    float(run(*args))
    elapsed = time.perf_counter() - start
    return elapsed * 1000.0 / (LAYERS * repeats)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=4)
    parser.add_argument("--out", default="INT8_MATMUL_r03.json")
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((TOKENS, D)) * 0.02, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
    wup = jnp.asarray(rng.standard_normal((D, FFN)) * 0.02, jnp.bfloat16)
    wdown = jnp.asarray(rng.standard_normal((FFN, D)) * 0.02, jnp.bfloat16)

    def bf16_chain(acc, wqkv, wout, wup, wdown):
        qkv = acc @ wqkv
        s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        acc = acc + s @ wout
        h = acc @ wup
        return acc + h @ wdown

    results: dict[str, float] = {}
    results["bf16_ms"] = _timed_stack(
        bf16_chain, x, wqkv, wout, wup, wdown, repeats=args.repeats
    )

    # --- int8 ceiling: everything pre-quantized, no scale math ---------------
    def q8(w):
        scale = 127.0 / jnp.max(jnp.abs(w))
        return jnp.round(w.astype(jnp.float32) * scale).astype(jnp.int8)

    xq = q8(x)
    wqkv8, wout8, wup8, wdown8 = q8(wqkv), q8(wout), q8(wup), q8(wdown)

    def i8dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    def int8_ceiling_chain(acc, wqkv8, wout8, wup8, wdown8):
        qkv = i8dot(acc, wqkv8)
        s = (qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]) >> 8
        acc2 = i8dot(s.astype(jnp.int8), wout8)
        h = i8dot((acc2 >> 8).astype(jnp.int8), wup8)
        nxt = i8dot((h >> 8).astype(jnp.int8), wdown8)
        return (nxt >> 8).astype(jnp.int8)

    results["int8_ceiling_ms"] = _timed_stack(
        int8_ceiling_chain, xq, wqkv8, wout8, wup8, wdown8, repeats=args.repeats
    )

    # --- int8 practical: per-channel weight scales, dynamic per-token
    #     activation quant, bf16 residual stream --------------------------------
    def qw(w):
        scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
        return (
            jnp.round(w.astype(jnp.float32) / scale).astype(jnp.int8),
            scale.astype(jnp.float32),
        )

    wqkv8p, sqkv = qw(wqkv)
    wout8p, sout = qw(wout)
    wup8p, sup = qw(wup)
    wdown8p, sdown = qw(wdown)

    def qact(a):
        s = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        return jnp.round(a.astype(jnp.float32) / s).astype(jnp.int8), s

    def qmm(a, w8, ws):
        a8, as_ = qact(a)
        out = i8dot(a8, w8).astype(jnp.float32) * (as_ * ws)
        return out.astype(jnp.bfloat16)

    def int8_practical_chain(acc, packs):
        (wqkv8p, sqkv), (wout8p, sout), (wup8p, sup), (wdown8p, sdown) = packs
        qkv = qmm(acc, wqkv8p, sqkv)
        s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        acc = acc + qmm(s, wout8p, sout)
        h = qmm(acc, wup8p, sup)
        return acc + qmm(h, wdown8p, sdown)

    packs = ((wqkv8p, sqkv), (wout8p, sout), (wup8p, sup), (wdown8p, sdown))
    results["int8_practical_ms"] = _timed_stack(
        int8_practical_chain, x, packs, repeats=args.repeats
    )

    for key in list(results):
        results[key.replace("_ms", "_tflops")] = round(
            LAYER_TFLOP / (results[key] / 1000.0), 1
        )
    payload = {
        "what": "int8 vs bf16 matmul stream at accurate-encoder shapes",
        "shapes": {"tokens": TOKENS, "d_model": D, "ffn": FFN, "layers": LAYERS},
        "units": "ms per layer matmul chain (QKV+out+MLP), TF/s effective",
        "layer_tflop": round(LAYER_TFLOP, 3),
        "results": {k: round(v, 3) for k, v in results.items()},
        "peaks_assumed_tflops": {"bf16": 197.0, "int8": 394.0},
    }
    print(json.dumps(payload, indent=2))
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=2)


if __name__ == "__main__":
    main()
