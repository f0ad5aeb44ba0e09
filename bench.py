#!/usr/bin/env python
"""Headline benchmark: accurate-profile encode throughput on one chip.

Measures audio-seconds processed per wall-second per chip through the accurate
profile's compute core (Whisper large-v3-sized encoder, bf16 on TPU), the
metric BASELINE.md targets (>50x real-time per v5e chip on the accurate
profile). Weights are deterministic random — throughput is weight-agnostic.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 50x real-time target.

Env knobs: SER_BENCH_SECONDS (default 60 s of audio per batch),
SER_BENCH_REPEATS (default 3), SER_BENCH_PROFILE (accurate|medium|fast).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REALTIME_TARGET = 50.0


def _bench_accurate() -> tuple[float, str]:
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper import (
        CHUNK_SAMPLES,
        WhisperConfig,
        WhisperEncoder,
        init_whisper_encoder_params,
        log_mel_spectrogram,
    )

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    config = WhisperConfig() if on_tpu else WhisperConfig.tiny()
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    encoder = WhisperEncoder(config, compute_dtype=compute_dtype)
    params = init_whisper_encoder_params(config, seed=0)

    seconds = float(os.environ.get("SER_BENCH_SECONDS", "240"))
    n_chunks = max(1, int(round(seconds / 30.0)))

    repeats = int(os.environ.get("SER_BENCH_REPEATS", "3"))

    @jax.jit
    def encode_repeated(params, chunks):
        # The repeat loop lives INSIDE the program: one dispatch + one input
        # transfer measures R× on-chip encodes. The per-iteration input nudge
        # defeats loop-invariant hoisting; the checksum forces completion via
        # a 4-byte host fetch (block_until_ready alone is unreliable over
        # remote-execution tunnels).
        def body(i, acc):
            mel = log_mel_spectrogram(chunks + i * 1e-6, config.n_mels)
            states = encoder.apply({"params": params}, mel)
            return acc + jnp.sum(states.astype(jnp.float32))

        return jax.lax.fori_loop(0, repeats, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.standard_normal((n_chunks, CHUNK_SAMPLES)) * 0.1, dtype=jnp.float32
    )
    float(encode_repeated(params, batch))  # compile + warm

    start = time.perf_counter()
    checksum = float(encode_repeated(params, batch))
    elapsed = time.perf_counter() - start
    assert np.isfinite(checksum)
    audio_seconds = repeats * n_chunks * 30.0
    return audio_seconds / elapsed, "accurate_encode_audio_seconds_per_second_per_chip"


def _bench_medium() -> tuple[float, str]:
    """XLS-R-300M-size encode throughput (medium profile compute core)."""
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.wav2vec2 import (
        Wav2Vec2Config,
        Wav2Vec2Encoder,
        init_wav2vec2_params,
    )

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    config = Wav2Vec2Config() if on_tpu else Wav2Vec2Config.tiny()
    encoder = Wav2Vec2Encoder(config, compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = init_wav2vec2_params(config, seed=0)

    chunk_seconds = 30.0
    chunk_samples = int(chunk_seconds * 16000)
    seconds = float(os.environ.get("SER_BENCH_SECONDS", "240"))
    n_chunks = max(1, int(round(seconds / chunk_seconds)))
    repeats = int(os.environ.get("SER_BENCH_REPEATS", "3"))

    @jax.jit
    def encode_repeated(params, chunks):
        def body(i, acc):
            hidden = encoder.apply({"params": params}, chunks + i * 1e-6)
            return acc + jnp.sum(hidden.astype(jnp.float32))

        return jax.lax.fori_loop(0, repeats, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.standard_normal((n_chunks, chunk_samples)) * 0.1, dtype=jnp.float32
    )
    float(encode_repeated(params, batch))
    start = time.perf_counter()
    checksum = float(encode_repeated(params, batch))
    elapsed = time.perf_counter() - start
    assert np.isfinite(checksum)
    return (
        repeats * n_chunks * chunk_seconds / elapsed,
        "medium_encode_audio_seconds_per_second_per_chip",
    )


def _bench_fast() -> tuple[float, str]:
    from ser_tpu.ops.features import extract_frame_features

    seconds = float(os.environ.get("SER_BENCH_SECONDS", "60"))
    sr = 16000
    rng = np.random.default_rng(0)
    audio = (0.3 * rng.standard_normal(int(seconds * sr))).astype(np.float32)
    extract_frame_features(audio, sr)  # compile + warm
    repeats = int(os.environ.get("SER_BENCH_REPEATS", "3"))
    start = time.perf_counter()
    for _ in range(repeats):
        extract_frame_features(audio, sr)
    elapsed = time.perf_counter() - start
    return repeats * seconds / elapsed, "fast_dsp_audio_seconds_per_second_per_chip"


def main() -> int:
    profile = os.environ.get("SER_BENCH_PROFILE", "accurate")
    bench = {
        "accurate": _bench_accurate,
        "medium": _bench_medium,
        "fast": _bench_fast,
    }.get(profile, _bench_accurate)
    trace_dir = os.environ.get("SER_BENCH_TRACE_DIR")
    if trace_dir:
        from ser_tpu._internal.utils.profiling import device_trace

        with device_trace(trace_dir):
            value, metric = bench()
    else:
        value, metric = bench()
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(value / REALTIME_TARGET, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
