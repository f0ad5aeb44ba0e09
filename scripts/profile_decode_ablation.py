#!/usr/bin/env python
"""Apportions KV-cache decode step time across op groups by ablation.

Builds while_loop decode variants with individual layer-body groups disabled
(self-attention, cross-attention, MLP, layer norms, vocab projection) and
measures each on the device. The difference full-vs-ablated estimates that
group's share of the step cost — the measurement that decides which group a
fused Pallas kernel should target first.

Usage: python scripts/profile_decode_ablation.py [--tiny]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--batch", type=int, default=2)
    args = parser.parse_args()

    from ser_tpu._internal.utils.jax_runtime import honor_platform_env

    honor_platform_env()

    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper import CHUNK_FRAMES, WhisperConfig, WhisperDecoder
    from ser_tpu.models import whisper_decode as wd

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    config = WhisperConfig.tiny() if (args.tiny or not on_tpu) else WhisperConfig()
    cdt = jnp.bfloat16 if on_tpu else jnp.float32

    decoder = WhisperDecoder(config)
    enc_len = CHUNK_FRAMES // 2
    params = decoder.init(
        jax.random.PRNGKey(0),
        np.zeros((1, config.max_target_positions), dtype=np.int32),
        np.zeros((1, enc_len, config.d_model), dtype=np.float32),
    )["params"]
    params = jax.tree.map(lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, params)

    cfg = config
    max_len = cfg.max_target_positions
    n_heads = cfg.n_heads
    head_dim = cfg.d_model // n_heads
    d_model = cfg.d_model
    eps = cfg.layer_norm_eps
    batch = args.batch

    @partial(jax.jit, static_argnames=("skip",))
    def ablated_decode(params, encoder_states, skip=()):
        cross_k, cross_v = wd._precompute_cross_kv(
            params, encoder_states, cfg.decoder_layers, n_heads, cdt
        )
        qkv_fused = wd._fuse_qkv_params(params, cfg.decoder_layers, d_model)

        tokens = jnp.zeros((batch, max_len), dtype=jnp.int32)
        # Shipped cache layouts: K (B, H, Dh, Smax) / V (B, H, Smax, Dh).
        self_k = tuple(
            jnp.zeros((batch, n_heads, head_dim, max_len), dtype=cdt)
            for _ in range(cfg.decoder_layers)
        )
        self_v = tuple(
            jnp.zeros((batch, n_heads, max_len, head_dim), dtype=cdt)
            for _ in range(cfg.decoder_layers)
        )

        def norm(p, x):
            return x if "ln" in skip else wd._layer_norm(p, x, eps)

        def body(state):
            position, tokens, self_k, self_v = state
            self_k, self_v = list(self_k), list(self_v)
            token_ids = jax.lax.dynamic_index_in_dim(tokens, position, axis=1, keepdims=False)
            x = params["tok_embed"][token_ids] + params["pos_embed"][position]
            x = x[:, None, :]
            key_visible = jnp.arange(max_len) <= position
            self_bias_row = jnp.where(key_visible, 0.0, wd._NEG_INF)

            for i in range(cfg.decoder_layers):
                lp = params[f"layer_{i}"]
                if "self" not in skip:
                    h = norm(lp["attn_ln"], x)
                    qkv = wd._dense(qkv_fused[i], h, cdt)
                    q = wd._split_heads(qkv[..., :d_model], n_heads)
                    k_new = wd._split_heads(qkv[..., d_model : 2 * d_model], n_heads)
                    v_new = wd._split_heads(qkv[..., 2 * d_model :], n_heads)
                    self_k[i] = jax.lax.dynamic_update_slice(
                        self_k[i], k_new[:, 0][..., None], (0, 0, 0, position)
                    )
                    self_v[i] = jax.lax.dynamic_update_slice(
                        self_v[i], jnp.swapaxes(v_new, 1, 2), (0, 0, position, 0)
                    )
                    out = wd._attend_self_step(
                        q, self_k[i], self_v[i], bias_row=self_bias_row, compute_dtype=cdt
                    )
                    x = x + wd._dense(lp["attn"]["out"], out.reshape(batch, 1, -1), cdt)
                if "cross" not in skip:
                    h = norm(lp["cross_ln"], x)
                    q = wd._split_heads(wd._dense(lp["cross"]["q"], h, cdt), n_heads)
                    out, _ = wd._attend_cross_step(
                        q, cross_k[i], cross_v[i], compute_dtype=cdt
                    )
                    x = x + wd._dense(lp["cross"]["out"], out.reshape(batch, 1, -1), cdt)
                if "mlp" not in skip:
                    h = norm(lp["mlp_ln"], x)
                    h = jax.nn.gelu(wd._dense(lp["mlp_in"], h, cdt))
                    x = x + wd._dense(lp["mlp_out"], h, cdt)

            x = norm(params["final_ln"], x)
            if "vocab" in skip:
                next_token = jnp.sum(x[:, 0], axis=-1).astype(jnp.int32) % cfg.vocab_size
            else:
                logits = jnp.einsum("bqd,vd->bqv", x, params["tok_embed"])[:, 0]
                next_token = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(
                tokens, next_token[:, None], (0, position + 1)
            )
            return position + 1, tokens, tuple(self_k), tuple(self_v)

        def cond(state):
            return state[0] < max_len - 1

        state = (jnp.asarray(0, jnp.int32), tokens, self_k, self_v)
        _, tokens, _, _ = jax.lax.while_loop(cond, body, state)
        return tokens

    rng = np.random.default_rng(0)

    def measure(skip):
        def fresh():
            return jnp.asarray(
                rng.standard_normal((batch, enc_len, d_model)), dtype=cdt
            )

        np.asarray(ablated_decode(params, fresh(), skip=skip))  # compile
        reps = 2 if on_tpu else 1
        elapsed = 0.0
        for _ in range(reps):
            states = fresh()
            start = time.perf_counter()
            np.asarray(ablated_decode(params, states, skip=skip))
            elapsed += time.perf_counter() - start
        return elapsed / reps / (max_len - 1) * 1e3

    full = measure(())
    print(f"{'full step':>16s}: {full:6.3f} ms/step")
    for skip in (("self",), ("cross",), ("mlp",), ("ln",), ("vocab",)):
        cost = measure(skip)
        print(
            f"{'no-' + '+'.join(skip):>16s}: {cost:6.3f} ms/step"
            f"  -> group ~{full - cost:6.3f} ms"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
