#!/usr/bin/env python
"""Decode step-cost profiler for the KV-cache Whisper decoder.

Isolates the ``greedy_decode_kv_cache`` while_loop and reports ms per token
step across batch sizes / alignment-capture widths / rule toggles, so decode
optimizations are driven by measurement (CLAUDE.md: microbenchmarks under
~100 ms are meaningless here — one full-budget decode is ~3 s of compute).

Usage: python scripts/profile_decode.py [--tiny]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    parser.add_argument("--batches", type=str, default="1,2,4,8")
    parser.add_argument("--fused", action="store_true",
                        help="route attention groups through the Pallas step kernels")
    args = parser.parse_args()

    from ser_tpu._internal.utils.jax_runtime import honor_platform_env

    honor_platform_env()

    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper import CHUNK_FRAMES, WhisperConfig, WhisperDecoder
    from ser_tpu.models.whisper_decode import (
        default_alignment_spec,
        greedy_decode_kv_cache,
    )

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    config = WhisperConfig.tiny() if (args.tiny or not on_tpu) else WhisperConfig()
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    decoder = WhisperDecoder(config)
    enc_len = CHUNK_FRAMES // 2
    tokens0 = np.zeros((1, config.max_target_positions), dtype=np.int32)
    states0 = np.zeros((1, enc_len, config.d_model), dtype=np.float32)
    params = decoder.init(jax.random.PRNGKey(0), tokens0, states0)["params"]
    params = jax.tree.map(lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, params)

    prefix = jnp.asarray([1, 2, 3, 4], dtype=jnp.int32)
    eot = jnp.asarray(0, dtype=jnp.int32)  # random logits ~never argmax to 0
    max_steps = config.max_target_positions - 1

    full_align = default_alignment_spec(config.decoder_layers, config.n_heads)
    cases = []
    for b in [int(x) for x in args.batches.split(",")]:
        cases.append((b, (), False, "plain"))
    cases.append((2, full_align, False, f"align{len(full_align)}"))
    cases.append((2, full_align, True, f"align{len(full_align)}+rules"))

    rng = np.random.default_rng(0)
    for batch, align_spec, rules, label in cases:
        kwargs = dict(
            prefix_len=int(prefix.shape[0]),
            align_spec=align_spec,
            compute_dtype=cdt,
            fused=args.fused,
        )
        if rules:
            kwargs.update(suppress_tokens=(5, 6, 7), timestamp_begin=config.vocab_size - 1501)

        def fresh_states():
            return jnp.asarray(
                rng.standard_normal((batch, enc_len, config.d_model)), dtype=cdt
            )

        # The remote-attached TPU plugin dedupes repeated identical dispatches
        # (same executable + same buffers return near-instantly), so every
        # timed call gets FRESH inputs and the token output is materialized on
        # host — otherwise the numbers are fiction.
        out = greedy_decode_kv_cache(params, config, fresh_states(), prefix, eot, **kwargs)
        np.asarray(out[0])
        reps = 3 if on_tpu else 1
        elapsed = 0.0
        for _ in range(reps):
            states = fresh_states()
            start = time.perf_counter()
            out = greedy_decode_kv_cache(params, config, states, prefix, eot, **kwargs)
            np.asarray(out[0])
            elapsed += time.perf_counter() - start
        elapsed /= reps
        n_steps = int(out[1].max()) + int(prefix.shape[0])
        per_step = elapsed / max(n_steps, 1) * 1e3
        print(
            f"B={batch:2d} {label:>14s}{' fused' if args.fused else ''}: "
            f"total {elapsed*1e3:8.1f} ms, steps {n_steps}, {per_step:6.3f} ms/step"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
