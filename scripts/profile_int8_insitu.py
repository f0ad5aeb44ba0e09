#!/usr/bin/env python
"""Why the isolated 1.42x int8 matmul win (INT8_MATMUL_r03.json) vanishes
in the full encoder block (speedup 0.994 measured on-chip).

Ablation ladder from the winning probe chain to the real EncoderBlock, adding
one ingredient per rung, all at production shapes (8x1500x1280, 32 layers):

  r0  bf16 matmul chain            (baseline, = probe bf16)
  r1  int8 chain, pre-quantized weights (= probe practical, the 1.42x)
  r2  + in-graph weight quant from f32 params  (QuantDense does this)
  r3  + LN before QKV and before MLP           (block layout)
  r4  + GELU between mlp_in / mlp_out
  r5  + flash attention between QKV and out    (the full block, minus nothing)
  r5b r5 with bf16 matmuls                     (the real bf16 block baseline)

Writes INT8_INSITU_r03.json. Usage: python scripts/profile_int8_insitu.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B, T, D = 8, 1500, 1280
FFN = 4 * D
LAYERS = 32


def _timed(stack_fn, *args) -> float:
    @jax.jit
    def run(first, *rest):
        def body(i, acc):
            return stack_fn(acc + i * jnp.asarray(0, acc.dtype), *rest)

        return jnp.sum(jax.lax.fori_loop(0, LAYERS, body, first).astype(jnp.float32))

    float(run(*args))
    start = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - start) * 1000.0


def _i8dot(a8, w8):
    return jax.lax.dot_general(
        a8, w8, (((a8.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _qw(w):
    s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0), 1e-8) / 127.0
    return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s.astype(jnp.float32)


def _qmm(a, w8, ws):
    af = a.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(af), axis=-1, keepdims=True), 1e-8) / 127.0
    a8 = jnp.round(af / s).astype(jnp.int8)
    return (_i8dot(a8, w8).astype(jnp.float32) * (s * ws)).astype(jnp.bfloat16)


def _ln(v):
    vf = v.astype(jnp.float32)
    mu = vf.mean(axis=-1, keepdims=True)
    var = ((vf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((vf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(v.dtype)


def main() -> None:
    from ser_tpu.models.attention import multi_head_attention
    from ser_tpu.ops.activations import gelu_erf

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.05, jnp.bfloat16)
    wf = {
        "qkv": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.float32),
        "out": jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((D, FFN)) * 0.02, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((FFN, D)) * 0.02, jnp.float32),
    }
    wb = {k: v.astype(jnp.bfloat16) for k, v in wf.items()}
    wq = {k: _qw(v) for k, v in wf.items()}

    results: dict[str, float] = {}

    def bf16_chain(acc, w):
        qkv = acc @ w["qkv"]
        s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        acc = acc + s @ w["out"]
        return acc + (acc @ w["up"]) @ w["down"]

    results["r0_bf16_chain"] = _timed(bf16_chain, x, wb)

    def int8_preq_chain(acc, wq):
        qkv = _qmm(acc, *wq["qkv"])
        s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        acc = acc + _qmm(s, *wq["out"])
        return acc + _qmm(_qmm(acc, *wq["up"]), *wq["down"])

    results["r1_int8_preq"] = _timed(int8_preq_chain, x, wq)

    def int8_inline_wq_chain(acc, wf):
        wq = {k: _qw(v) for k, v in wf.items()}
        return int8_preq_chain(acc, wq)

    results["r2_int8_inline_wq"] = _timed(int8_inline_wq_chain, x, wf)

    def int8_ln_chain(acc, wq):
        h = _ln(acc)
        qkv = _qmm(h, *wq["qkv"])
        s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        acc = acc + _qmm(s, *wq["out"])
        h = _ln(acc)
        return acc + _qmm(_qmm(h, *wq["up"]), *wq["down"])

    results["r3_int8_preq_ln"] = _timed(int8_ln_chain, x, wq)

    def int8_ln_gelu_chain(acc, wq):
        h = _ln(acc)
        qkv = _qmm(h, *wq["qkv"])
        s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        acc = acc + _qmm(s, *wq["out"])
        h = _ln(acc)
        return acc + _qmm(gelu_erf(_qmm(h, *wq["up"])), *wq["down"])

    results["r4_int8_preq_ln_gelu"] = _timed(int8_ln_gelu_chain, x, wq)

    def full_block(acc, wq, quant):
        mm = (lambda a, k: _qmm(a, *wq[k])) if quant else (lambda a, k: a @ wb[k])
        h = _ln(acc)
        qkv = mm(h, "qkv")
        q, k, v = (
            qkv[..., :D].reshape(B, T, 20, 64),
            qkv[..., D : 2 * D].reshape(B, T, 20, 64),
            qkv[..., 2 * D :].reshape(B, T, 20, 64),
        )
        attn = multi_head_attention(q, k, v).reshape(B, T, D)
        acc = acc + mm(attn, "out")
        h = _ln(acc)
        return acc + mm(gelu_erf(mm(h, "up")), "down")

    results["r5_int8_full_block"] = _timed(lambda a, w: full_block(a, w, True), x, wq)
    results["r5b_bf16_full_block"] = _timed(lambda a, w: full_block(a, w, False), x, wq)

    # r6: full block, quant math kept in bf16 (halves the quant-pass traffic).
    def _qmm_bf16(a, w8, ws):
        s = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True).astype(jnp.float32), 1e-8) / 127.0
        a8 = jnp.round(a.astype(jnp.float32) / s).astype(jnp.int8)
        return (_i8dot(a8, w8).astype(jnp.float32) * (s * ws)).astype(jnp.bfloat16)

    def full_block_v(acc, wq, mm):
        h = _ln(acc)
        qkv = mm(h, "qkv")
        q, k, v = (
            qkv[..., :D].reshape(B, T, 20, 64),
            qkv[..., D : 2 * D].reshape(B, T, 20, 64),
            qkv[..., 2 * D :].reshape(B, T, 20, 64),
        )
        attn = multi_head_attention(q, k, v).reshape(B, T, D)
        acc = acc + mm(attn, "out")
        h = _ln(acc)
        return acc + mm(gelu_erf(mm(h, "up")), "down")

    results["r6_int8_block_bf16_quant"] = _timed(
        lambda a, w: full_block_v(a, w, lambda t, k: _qmm_bf16(t, *w[k])), x, wq
    )

    # r7: static per-tensor activation scale — quantization is then a pure
    # elementwise op XLA can fuse into the producing pass (no reduction).
    # Numerics would need calibration; this rung only measures the CEILING.
    def _qmm_static(a, w8, ws, s):
        a8 = jnp.round(a.astype(jnp.float32) * (1.0 / s)).astype(jnp.int8)
        return (_i8dot(a8, w8).astype(jnp.float32) * (s * ws)).astype(jnp.bfloat16)

    results["r7_int8_block_static_scale"] = _timed(
        lambda a, w: full_block_v(a, w, lambda t, k: _qmm_static(t, *w[k], 0.05)), x, wq
    )

    payload = {
        "what": "int8 in-situ ablation ladder (probe chain -> full encoder block)",
        "shapes": {"batch": B, "seq": T, "d_model": D, "layers": LAYERS},
        "units": "ms per 32-layer stack",
        "results": {k: round(v, 2) for k, v in results.items()},
    }
    print(json.dumps(payload, indent=2))
    with open("INT8_INSITU_r03.json", "w") as fh:
        json.dump(payload, fh, indent=2)


if __name__ == "__main__":
    main()
