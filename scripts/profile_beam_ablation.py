#!/usr/bin/env python
"""Apportions BEAM-5 decode step time: step compute vs bookkeeping vs reorder.

VERDICT r04 weak #6: the beam-5 transcript lane sits at ~51 audio-s/s against
the 50x-real-time target with zero margin, and the decode-exhaustion evidence
on file (DECODE_ABLATION_r03.json) is greedy-only. This harness builds beam
loop variants with individual beam-specific groups disabled and measures each
on device, writing DECODE_ABLATION_r05.json:

- ``beam_full``       — the production loop shape (step + top-k bookkeeping +
                        KV-cache reorder via per-layer ``jnp.take``).
- ``no_reorder``      — parents forced identity, cache gathers skipped: the
                        difference is the cost of physically reordering
                        2×n_layers caches every token.
- ``no_bookkeeping``  — top-k/score/finished-pool logic replaced by argmax
                        row-wise feed (reorder kept with rotating parents):
                        the difference is the hypothesis-bookkeeping cost.
- ``step_only``       — just ``_decoder_token_step`` on B*K rows: the roofline
                        the beam loop could approach if beam overheads were
                        free.

Usage: python scripts/profile_beam_ablation.py [--tiny] [--batch 2]
       [--token-budget 96] [--out DECODE_ABLATION_r05.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from functools import partial
from pathlib import Path

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--beams", type=int, default=5)
    parser.add_argument(
        "--token-budget",
        type=int,
        default=96,
        help="cap max_target_positions (the realistic transcript budget)",
    )
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from ser_tpu._internal.utils.jax_runtime import honor_platform_env

    honor_platform_env()

    import jax
    import jax.numpy as jnp

    from ser_tpu.models import whisper_decode as wd
    from ser_tpu.models.whisper import CHUNK_FRAMES, WhisperConfig, WhisperDecoder

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    config = WhisperConfig.tiny() if (args.tiny or not on_tpu) else WhisperConfig()
    config = dataclasses.replace(
        config,
        max_target_positions=min(args.token_budget, config.max_target_positions),
    )
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    decoder = WhisperDecoder(config)
    enc_len = CHUNK_FRAMES // 2 if on_tpu else 16
    params = decoder.init(
        jax.random.PRNGKey(0),
        np.zeros((1, config.max_target_positions), dtype=np.int32),
        np.zeros((1, enc_len, config.d_model), dtype=np.float32),
    )["params"]
    params = jax.tree.map(
        lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, params
    )

    cfg = config
    batch, k_beams = args.batch, args.beams
    rows = batch * k_beams
    max_len = cfg.max_target_positions
    n_heads = cfg.n_heads
    head_dim = cfg.d_model // n_heads
    vocab = cfg.vocab_size
    eot = vocab - 1  # never argmax-selected on random weights' typical logits

    @partial(jax.jit, static_argnames=("mode",))
    def beam_variant(params, encoder_states, mode):
        """One full decode pass with beam-machinery groups toggled by mode.

        ``stacked`` mode carries the caches as (L, rows, ...) arrays and
        reorders with TWO large gathers (the production layout since the
        r05 fix); the other modes keep per-layer tuples (the pre-fix
        layout, 2*L launch-bound gathers) so the A/B is same-process.
        """
        cross_k, cross_v = wd._precompute_cross_kv(
            params, encoder_states, cfg.decoder_layers, n_heads, cdt
        )
        qkv_fused = wd._fuse_qkv_params(params, cfg.decoder_layers, cfg.d_model)
        tokens = jnp.zeros((rows, max_len), dtype=jnp.int32)
        if mode == "stacked":
            self_k = jnp.zeros(
                (cfg.decoder_layers, rows, n_heads, head_dim, max_len), dtype=cdt
            )
            self_v = jnp.zeros(
                (cfg.decoder_layers, rows, n_heads, max_len, head_dim), dtype=cdt
            )
        else:
            self_k = tuple(
                jnp.zeros((rows, n_heads, head_dim, max_len), dtype=cdt)
                for _ in range(cfg.decoder_layers)
            )
            self_v = tuple(
                jnp.zeros((rows, n_heads, max_len, head_dim), dtype=cdt)
                for _ in range(cfg.decoder_layers)
            )
        scores = jnp.tile(
            jnp.asarray([0.0] + [-1e9] * (k_beams - 1), dtype=jnp.float32), batch
        )

        def cond(state):
            return state[0] < max_len - 1

        def body(state):
            position, tokens, scores, self_k, self_v = state
            token_ids = jax.lax.dynamic_index_in_dim(
                tokens, position, axis=1, keepdims=False
            )
            logits, new_k, new_v, _ = wd._decoder_token_step(
                params,
                qkv_fused,
                cross_k,
                cross_v,
                self_k if mode == "stacked" else list(self_k),
                self_v if mode == "stacked" else list(self_v),
                token_ids,
                position,
                config=cfg,
                compute_dtype=cdt,
                beams=k_beams,
            )
            if mode == "step_only":
                # Roofline: consume logits minimally, no beam machinery.
                next_token = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
                    jnp.int32
                )
                parent_rows = None
                new_scores = scores
            elif mode == "stacked":
                next_token = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
                    jnp.int32
                )
                parent_rows = (jnp.arange(rows, dtype=jnp.int32) + 1) % rows
                new_scores = scores
            elif mode == "no_bookkeeping":
                # Keep the cache reorder (rotating non-identity parents so the
                # gather is real) but skip log_softmax/top-k/finished pool.
                next_token = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(
                    jnp.int32
                )
                parent_rows = (jnp.arange(rows, dtype=jnp.int32) + 1) % rows
                new_scores = scores
            else:
                # Production bookkeeping: log-softmax, live top-k over K*V,
                # parent extraction (the finished-pool arithmetic is a few
                # (B, K) ops measured WITH this group).
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                scores3 = scores.reshape(batch, k_beams)
                lp3 = logprobs.reshape(batch, k_beams, vocab)
                token_is_eot = jnp.arange(vocab)[None, None, :] == eot
                live = jnp.where(
                    token_is_eot, -1e9, scores3[:, :, None] + lp3
                )
                top_scores, top_idx = jax.lax.top_k(
                    live.reshape(batch, k_beams * vocab), k_beams
                )
                parent = top_idx // vocab
                next_token = (top_idx % vocab).astype(jnp.int32).reshape(rows)
                parent_rows = (
                    parent
                    + jnp.arange(batch, dtype=parent.dtype)[:, None] * k_beams
                ).reshape(rows)
                new_scores = top_scores.reshape(rows)
                if mode == "no_reorder":
                    parent_rows = None

            if parent_rows is not None:
                tokens = jnp.take(tokens, parent_rows, axis=0)
                if mode == "stacked":
                    new_k = jnp.take(new_k, parent_rows, axis=1)
                    new_v = jnp.take(new_v, parent_rows, axis=1)
                else:
                    new_k = [jnp.take(k, parent_rows, axis=0) for k in new_k]
                    new_v = [jnp.take(v, parent_rows, axis=0) for v in new_v]
            tokens = jax.lax.dynamic_update_slice(
                tokens, next_token[:, None], (0, position + 1)
            )
            if mode == "stacked":
                return position + 1, tokens, new_scores, new_k, new_v
            return position + 1, tokens, new_scores, tuple(new_k), tuple(new_v)

        state = (jnp.asarray(0, jnp.int32), tokens, scores, self_k, self_v)
        _, tokens, _, _, _ = jax.lax.while_loop(cond, body, state)
        return tokens

    rng = np.random.default_rng(0)

    def measure(mode: str) -> float:
        def fresh():
            return jnp.asarray(
                rng.standard_normal((batch, enc_len, cfg.d_model)), dtype=cdt
            )

        np.asarray(beam_variant(params, fresh(), mode=mode))  # compile
        reps = 3 if on_tpu else 1
        elapsed = 0.0
        for _ in range(reps):
            states = fresh()
            start = time.perf_counter()
            np.asarray(beam_variant(params, states, mode=mode))
            elapsed += time.perf_counter() - start
        return elapsed / reps / (max_len - 1) * 1e3  # ms per token

    results: dict = {
        "config": "tiny" if (args.tiny or not on_tpu) else "large-v3",
        "on_tpu": on_tpu,
        "batch": batch,
        "beams": k_beams,
        "token_budget": max_len,
        "rows": rows,
        "per_token_ms": {},
    }
    for mode in ("beam_full", "no_reorder", "no_bookkeeping", "stacked", "step_only"):
        cost = measure(mode)
        results["per_token_ms"][mode] = round(cost, 3)
        print(f"{mode:>16s}: {cost:7.3f} ms/token")

    per = results["per_token_ms"]
    full = per["beam_full"]
    results["decomposition_ms"] = {
        "reorder": round(full - per["no_reorder"], 3),
        "bookkeeping": round(full - per["no_bookkeeping"], 3),
        "step_compute": per["step_only"],
        "unattributed": round(
            full
            - (full - per["no_reorder"])
            - (full - per["no_bookkeeping"])
            - per["step_only"],
            3,
        ),
    }
    if "stacked" in per and "no_bookkeeping" in per:
        # Same-process A/B of the reorder layouts (both use rotating
        # parents, no bookkeeping): tuple-of-layers vs stacked caches.
        results["reorder_layout_ab_ms"] = {
            "tuple_caches": per["no_bookkeeping"],
            "stacked_caches": per["stacked"],
            "stacked_win_ms_per_token": round(
                per["no_bookkeeping"] - per["stacked"], 3
            ),
        }
        print("reorder layout A/B:", results["reorder_layout_ab_ms"])
    print("decomposition:", results["decomposition_ms"])

    out = args.out
    if out:
        Path(out).write_text(json.dumps(results, indent=2), encoding="utf-8")
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
