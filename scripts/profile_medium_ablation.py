"""Medium-lane (wav2vec2/XLS-R) component ablation on the real chip.

Measures where the medium encode's time goes — conv feature frontend vs
grouped positional conv vs transformer stack — by benching config variants
that share one compiled fori_loop dispatch each (the bench.py measurement
protocol: scalar readback defeats the remote plugin's dispatch dedupe, and
the numpy-side ``init_wav2vec2_params`` avoids a second full jit compile).

Context: BENCH_r03 measured the medium lane at ~1526 audio-s/s/chip ≈ 46%
MFU where the accurate (whisper) lane reaches ~85% — the delta is the conv
frontend (kernel-10/stride-5 conv over raw 16 kHz audio) and the 128-wide
16-group positional conv, neither of which maps cleanly onto the MXU.

Run (real chip): python scripts/profile_medium_ablation.py
Expect multi-minute remote compiles per variant.
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

from ser_tpu._internal.utils.jax_runtime import honor_platform_env

honor_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ser_tpu.models.wav2vec2 import (  # noqa: E402
    Wav2Vec2Config,
    Wav2Vec2Encoder,
    init_wav2vec2_params,
)

B = 8
CHUNK = 16000 * 30
REPEATS = 3


def bench_config(config: Wav2Vec2Config, label: str, wave: jax.Array) -> float:
    encoder = Wav2Vec2Encoder(config, compute_dtype=jnp.bfloat16)
    params = init_wav2vec2_params(config, seed=0)

    @jax.jit
    def run(params, chunks):
        def body(i, acc):
            hidden = encoder.apply({"params": params}, chunks + i * 1e-6)
            return acc + jnp.sum(hidden.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPEATS, body, jnp.float32(0.0))

    float(run(params, wave))  # compile + first run
    best = float("inf")
    for _ in range(4):
        start = time.perf_counter()
        float(run(params, wave))
        best = min(best, time.perf_counter() - start)
    per_batch = best / REPEATS
    print(
        f"{label}: {per_batch * 1e3:.1f} ms/batch -> "
        f"{B * 30.0 / per_batch:.0f} audio-s/s",
        flush=True,
    )
    return per_batch


def main() -> None:
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((B, CHUNK)), dtype=jnp.float32)

    full_config = Wav2Vec2Config()
    full = bench_config(full_config, "full 24L", wave)
    frontend = bench_config(
        dataclasses.replace(full_config, num_hidden_layers=0),
        "frontend only (0L)",
        wave,
    )
    # A/B: the patch-matmul frontend lowering (same params, MXU matmuls).
    full_mm = bench_config(
        dataclasses.replace(full_config, frontend_impl="matmul"),
        "full 24L matmul-frontend",
        wave,
    )
    frontend_mm = bench_config(
        dataclasses.replace(full_config, num_hidden_layers=0, frontend_impl="matmul"),
        "frontend only matmul (0L)",
        wave,
    )
    # Subdivide the frontend: a 4-tap positional conv approximates "no pos
    # conv" (same layer count/normalizations), isolating the conv stack from
    # the 128-wide 16-group positional conv.
    frontend_no_pos = bench_config(
        dataclasses.replace(
            full_config, num_hidden_layers=0, num_conv_pos_embeddings=4
        ),
        "frontend only, pos-k4 (0L)",
        wave,
    )
    transformer = full - frontend
    frames = (CHUNK - full_config.frame_receptive_samples) // (
        full_config.frame_stride_samples
    ) + 1
    hidden, inter, heads = (
        full_config.hidden_size,
        full_config.intermediate_size,
        full_config.num_attention_heads,
    )
    flops = full_config.num_hidden_layers * (
        2 * B * frames * (4 * hidden**2 + 2 * hidden * inter)
        + 2 * 2 * B * heads * frames * frames * (hidden // heads)
    )
    result = {
        "full_ms": full * 1e3,
        "full_matmul_frontend_ms": full_mm * 1e3,
        "frontend_ms": frontend * 1e3,
        "frontend_matmul_ms": frontend_mm * 1e3,
        "frontend_no_pos_ms": frontend_no_pos * 1e3,
        "pos_conv_ms_estimate": (frontend - frontend_no_pos) * 1e3,
        "transformer_ms": transformer * 1e3,
        "frontend_share": frontend / full,
        "transformer_tf_per_s": flops / transformer / 1e12,
        "audio_s_per_s": B * 30.0 / full,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
