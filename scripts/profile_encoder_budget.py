#!/usr/bin/env python
"""Whisper-encoder component budget on the real chip (accurate profile shapes).

Accounts the encode wall clock to its components so the next kernel lever is
chosen by measurement, not guess: after flash attention landed
(ATTN_ABLATION_r03.json: 65 ms per 32-layer attention stack vs a 56 ms HBM
roofline), the encoder sits at ~48% MFU — this script answers where the other
half lives. Measures, each as an isolated jitted loop at batch 8 / T=1500 /
d=1280 bf16 (whisper large-v3, 240 s of audio per batch):

- full encode (mel -> states) with the production model + real-init params,
- the mel frontend alone,
- the conv stem + positional embedding alone,
- the per-block projection matmuls alone (QKV/out/MLP chain, MXU-bound),
- the attention core alone (flash, same as the attention ablation),
- the LN/residual/GELU elementwise stream alone (HBM-bound),

then reports the additive budget vs the measured full encode. Numbers land in
ENCODER_BUDGET_r03.json.

Usage: python scripts/profile_encoder_budget.py [--repeats 6]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from ser_tpu.models.whisper import (
    WhisperConfig,
    WhisperEncoder,
    _gelu,
    _sinusoids,
    init_whisper_encoder_params,
    log_mel_spectrogram,
)

B = 8  # 240 s of audio in 30 s chunks
LAYERS = 32
D = 1280
T = 1500
FFN = 4 * D
CHUNK_SAMPLES = 480_000


def _timed(fn, *args, repeats: int) -> float:
    """ms per call: ``repeats`` calls inside ONE jitted fori_loop, reduced to a
    f32 scalar that is read back with ``float(...)``.

    ``jax.block_until_ready`` does not reliably block under the axon
    remote-execution plugin (a prior run recorded a 154 ms encode as 0.38 ms),
    so completion is forced the same way the attention ablation does it: the
    output feeds a scalar accumulator and the host reads the scalar. The loop
    lives inside the jit so the ~30 ms/dispatch tunnel overhead is amortized;
    the iteration index perturbs the first argument so XLA cannot hoist the
    body as loop-invariant.
    """

    @jax.jit
    def stack(first, *rest):
        def body(i, acc):
            out = fn(first + i * jnp.asarray(1e-6, first.dtype), *rest)
            return acc + jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, repeats, body, jnp.float32(0.0))

    float(stack(*args))  # compile + warm
    start = time.perf_counter()
    float(stack(*args))
    elapsed = time.perf_counter() - start
    return elapsed * 1000.0 / repeats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=6)
    args = parser.parse_args()

    config = WhisperConfig()
    params = init_whisper_encoder_params(config, seed=0)
    encoder = WhisperEncoder(config, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((B, CHUNK_SAMPLES)) * 0.1, dtype=jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.02, dtype=jnp.bfloat16)

    results: dict[str, float] = {}

    def full(audio, params):
        mel = log_mel_spectrogram(audio, config.n_mels)
        return encoder.apply({"params": params}, mel)

    results["full_ms"] = _timed(full, audio, params, repeats=args.repeats)

    def mel_only(audio):
        return log_mel_spectrogram(audio, config.n_mels)

    results["mel_ms"] = _timed(mel_only, audio, repeats=args.repeats)

    mel = jax.jit(mel_only)(audio)

    def stem_only(mel, params):
        # Same ops/names as WhisperEncoder.__call__ pre-block section.
        import flax.linen as nn

        class Stem(nn.Module):
            @nn.compact
            def __call__(self, mel):
                h = nn.Conv(D, kernel_size=(3,), padding=1, dtype=jnp.bfloat16, name="conv1")(mel)
                h = _gelu(h)
                h = nn.Conv(D, kernel_size=(3,), strides=(2,), padding=1, dtype=jnp.bfloat16, name="conv2")(h)
                h = _gelu(h)
                return h + jnp.asarray(_sinusoids(h.shape[1], D))[None].astype(h.dtype)

        stem_params = {"conv1": params["conv1"], "conv2": params["conv2"]}
        return Stem().apply({"params": stem_params}, mel)

    results["stem_ms"] = _timed(stem_only, mel, params, repeats=args.repeats)

    # Per-block projection matmuls (QKV fused as one (D, 3D), out, MLP pair),
    # looped LAYERS times through one weight set — isolates the MXU stream.
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, dtype=jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((D, D)) * 0.02, dtype=jnp.bfloat16)
    win_ = jnp.asarray(rng.standard_normal((D, FFN)) * 0.02, dtype=jnp.bfloat16)
    wout2 = jnp.asarray(rng.standard_normal((FFN, D)) * 0.02, dtype=jnp.bfloat16)

    def matmuls_only(x, wqkv, wout, win_, wout2):
        def body(i, acc):
            qkv = acc @ wqkv
            # Use ALL THREE slices so XLA cannot dead-code the K/V columns of
            # the QKV matmul (an earlier probe kept only Q and measured a
            # narrowed (D, D) matmul — 70 ms for what is really ~105 ms).
            s = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
            acc = acc + s @ wout
            h = acc @ win_
            return acc + h @ wout2

        return jax.lax.fori_loop(0, LAYERS, body, x)

    results["proj_matmuls_ms"] = _timed(
        matmuls_only, x, wqkv, wout, win_, wout2, repeats=args.repeats
    )

    # Attention core alone (flash at the production BlockSizes) — the
    # ATTN_ABLATION measurement, re-run here so the budget is one artifact.
    from ser_tpu.models.attention import multi_head_attention

    qkv_in = jnp.asarray(
        rng.standard_normal((B, T, 20, 64)) * 0.02, dtype=jnp.bfloat16
    )

    def attention_only(q, k, v):
        def body(i, acc):
            return multi_head_attention(acc, k, v)

        return jax.lax.fori_loop(0, LAYERS, body, q)

    results["attention_ms"] = _timed(
        attention_only, qkv_in, qkv_in, qkv_in, repeats=args.repeats
    )

    # Elementwise stream alone: 2 LN + 2 residual adds + GELU per block at
    # the residual-stream shape — the HBM-bound remainder.
    def elementwise_only(x):
        def ln(v):
            mu = v.mean(axis=-1, keepdims=True)
            var = ((v - mu) ** 2).mean(axis=-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5)

        def body(i, acc):
            acc = acc + ln(acc)
            h = ln(acc)
            big = jnp.concatenate([h, h, h, h], axis=-1)  # FFN-width stream
            return acc + _gelu(big)[..., :D]

        return jax.lax.fori_loop(0, LAYERS, body, x)

    results["elementwise_ms"] = _timed(elementwise_only, x, repeats=args.repeats)

    accounted = (
        results["mel_ms"]
        + results["stem_ms"]
        + results["proj_matmuls_ms"]
        + results["attention_ms"]
        + results["elementwise_ms"]
    )
    results["accounted_ms"] = round(accounted, 2)
    results["unaccounted_ms"] = round(results["full_ms"] - accounted, 2)
    payload = {
        "what": "Whisper-encoder component budget (accurate shapes, bf16, batch 8)",
        "shapes": {"batch": B, "seq": T, "d_model": D, "layers": LAYERS},
        "units": "ms per full-batch encode (median)",
        "results": {k: round(v, 2) for k, v in results.items()},
        "audio_seconds_per_batch": B * 30.0,
    }
    print(json.dumps(payload, indent=2))
    with open("ENCODER_BUDGET_r03.json", "w") as fh:
        json.dump(payload, fh, indent=2)


if __name__ == "__main__":
    main()
