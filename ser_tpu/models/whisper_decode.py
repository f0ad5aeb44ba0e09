"""KV-cached greedy Whisper decode with cross-attention alignment capture.

TPU-native decode path replacing the full-prefix re-forward
(``whisper.greedy_decode_on_device``): per-layer self-attention keys/values
live in a fixed-size cache updated in place inside one ``lax.while_loop``,
cross-attention K/V are computed once per window, and per-step compute is
independent of the emitted position. Reference efficiency bar: the
ctranslate2-backed cached decoder behind ``faster_whisper``
(reference ``ser/_internal/transcript/backends/faster_whisper.py``).

During the same loop, cross-attention probabilities from designated
alignment heads are written into a fixed buffer, feeding host-side DTW word
timing (``word_timing.py``) — the stable-ts-class alignment the reference
gets from ``stable_whisper.py:272-478``. Capturing during decode avoids the
second teacher-forced alignment forward the torch stacks need.

Operates directly on the flax param tree of ``whisper.WhisperDecoder`` with
matching numerics (same op order, dtype casts, and masking), so cached and
full-prefix decodes agree token-for-token; ``tests/suites/integration/
transcript`` pins the equivalence.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ser_tpu.ops.activations import gelu_erf

_NEG_INF = -1e30


def _dense(p: dict, x: jax.Array, dtype) -> jax.Array:
    """flax ``nn.Dense(dtype=...)`` numerics: cast inputs+params, then matmul."""
    y = x.astype(dtype) @ p["kernel"].astype(dtype)
    bias = p.get("bias")
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


# --------------------------------------------------------------------------- #
# Int8 decode weight stream (SER_DECODE_INT8=1 opt-in)
#
# The decode step is WEIGHT-BANDWIDTH-bound: ~1.5 GB of layer weights stream
# from HBM per token at large-v3/batch 2 (DECODE_ABLATION_r03), and every
# structural XLA/Pallas lever is measured-exhausted at bf16. Pre-quantized
# int8 weights halve that stream. Unlike the encoder's QuantDense (which
# re-quantizes inside the program — fine when compute-bound), decode
# quantizes ONCE per dispatch outside the while_loop, so the loop reads only
# int8 tensors. Symmetric per-output-channel scales; activations quantize
# per token (A8) so the matmuls ride the int8 MXU path.
# --------------------------------------------------------------------------- #


def _quantize_kernel(kernel) -> tuple[jax.Array, jax.Array]:
    """(K, N) weights → (int8 (K, N), f32 per-output-channel scale (N,))."""
    wf = jnp.asarray(kernel, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    return jnp.round(wf / scale).astype(jnp.int8), scale


def _quant_entry(p: dict) -> dict:
    w8, scale = _quantize_kernel(p["kernel"])
    return {"w8": w8, "scale": scale, "bias": p.get("bias")}


def quantize_decode_weights(params: dict, qkv_fused: list[dict], n_layers: int) -> dict:
    """Pre-quantizes the decode step's matmul stream (per dispatch, once).

    Covers the bandwidth-dominant weights: fused QKV, attention/cross output
    projections, cross Q, both MLP matmuls, and the vocab projection
    (``tok_embed`` transposed — at large-v3 that single matrix is 133 MB of
    the per-token stream). Layer norms, embeddings lookups, and attention
    cores stay in the bf16/f32 path.
    """
    quant: dict = {"layers": []}
    for i in range(n_layers):
        lp = params[f"layer_{i}"]
        quant["layers"].append(
            {
                "qkv": _quant_entry(qkv_fused[i]),
                "attn_out": _quant_entry(lp["attn"]["out"]),
                "cross_q": _quant_entry(lp["cross"]["q"]),
                "cross_out": _quant_entry(lp["cross"]["out"]),
                "mlp_in": _quant_entry(lp["mlp_in"]),
                "mlp_out": _quant_entry(lp["mlp_out"]),
            }
        )
    emb = jnp.asarray(params["tok_embed"], jnp.float32)
    w8, scale = _quantize_kernel(emb.T)
    quant["vocab"] = {"w8": w8, "scale": scale, "bias": None}
    return quant


def _dense_int8(q: dict, x: jax.Array, dtype) -> jax.Array:
    """W8A8 matmul with per-token activation scales (QuantDense numerics)."""
    xf = x.astype(jnp.float32)
    ascale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    a8 = jnp.round(xf / ascale).astype(jnp.int8)
    out = jax.lax.dot_general(
        a8,
        q["w8"],
        (((a8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (ascale * q["scale"])
    if q["bias"] is not None:
        out = out + q["bias"].astype(jnp.float32)
    return out.astype(dtype)


def _layer_norm(p: dict, x: jax.Array, eps: float) -> jax.Array:
    """flax ``nn.LayerNorm`` numerics (fast-variance form) in float32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean_sq - jnp.square(mean))
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return normed * p["scale"] + p["bias"]


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    return x.reshape(*x.shape[:-1], n_heads, x.shape[-1] // n_heads)


def _attend(q, k, v, *, bias, compute_dtype):
    """Single-query attention matching ``whisper.MultiHeadAttention``."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(head_dim, dtype=compute_dtype)
    )
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(compute_dtype), v)
    return out, weights


def apply_timestamp_rules(
    logits: jax.Array,
    *,
    last_token: jax.Array,
    penultimate_token: jax.Array,
    max_timestamp: jax.Array,
    generated_count: jax.Array,
    eot: jax.Array,
    timestamp_begin: int,
    max_initial_timestamp_index: int = 50,
) -> jax.Array:
    """Whisper's timestamp decoding constraints over one step's logits.

    Vectorized port of the published logits processor (openai
    ``decoding.ApplyTimestampRules`` / HF ``WhisperTimeStampLogitsProcessor``
    — the stack behind the reference's whisper backends):
      1. timestamps come in pairs: after a LONE timestamp only a timestamp
         or EOT may follow; after a CLOSED pair a timestamp cannot follow.
         A missing penultimate token counts as a timestamp (``len(seq) < 2
         or ...`` in the published code), so the token right after the
         forced initial timestamp is TEXT, not a second stamp;
      2. timestamps never decrease — and must strictly INCREASE except when
         closing a pair (the published ``timestamps[-1] + 1`` case, which
         exists to forbid zero-length segments / infinite loops);
      3. the FIRST generated token must be a timestamp no later than
         ``max_initial_timestamp_index``, and ``<|notimestamps|>``
         (``timestamp_begin - 1``) is always masked;
      4. when the total timestamp probability outweighs the best
         non-timestamp token, the step must emit a timestamp.

    All inputs are per-row arrays of a (B, V) logits batch; returns masked
    logits. Pure and jit-safe: used inside the decode loop and unit-tested
    on synthetic logits against the published per-sequence semantics.
    """
    vocab = logits.shape[-1]
    neg = jnp.asarray(_NEG_INF, dtype=logits.dtype)
    token_ids = jnp.arange(vocab)
    is_ts_col = (token_ids >= timestamp_begin)[None, :]
    is_text_col = (token_ids < eot)[None, :]

    has_last = (generated_count >= 1)[:, None]
    has_penult = (generated_count >= 2)[:, None]
    last_is_ts = has_last & (last_token >= timestamp_begin)[:, None]
    # Published semantics: a missing penultimate counts as a timestamp.
    penult_is_ts = ~has_penult | (penultimate_token >= timestamp_begin)[:, None]

    # <|notimestamps|> never decodes on the timestamped path.
    logits = jnp.where((token_ids == timestamp_begin - 1)[None, :], neg, logits)
    # Pair rules.
    closing = last_is_ts & ~penult_is_ts  # lone stamp: must close the pair
    closed = last_is_ts & penult_is_ts  # pair closed: next is non-timestamp
    logits = jnp.where(closed & is_ts_col, neg, logits)
    logits = jnp.where(closing & is_text_col, neg, logits)
    # Monotonicity: mask stamps below the last one; strictly below-or-equal
    # unless the step is closing a pair (rule 4 forces the first generated
    # token to be a timestamp, so once anything was generated a last stamp
    # exists and ``max_timestamp`` is live).
    cut = max_timestamp[:, None] + jnp.where(closing, 0, 1)
    below = is_ts_col & (token_ids[None, :] < cut)
    logits = jnp.where(has_last & below, neg, logits)
    # Initial token: an early timestamp.
    first = (generated_count == 0)[:, None]
    too_late = token_ids[None, :] > timestamp_begin + max_initial_timestamp_index
    logits = jnp.where(first & (~is_ts_col | too_late), neg, logits)
    # Aggregated timestamp probability wins → force a timestamp. The
    # comparison runs on the ALREADY-masked logits against the best single
    # token below timestamp_begin (incl. EOT/specials), per the published
    # rule.
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts_col, logprobs, -jnp.inf), axis=-1
    )
    max_below_logprob = jnp.max(
        jnp.where(~is_ts_col, logprobs, -jnp.inf), axis=-1
    )
    force_ts = (ts_logprob > max_below_logprob)[:, None]
    return jnp.where(force_ts & ~is_ts_col, neg, logits)


def _precompute_cross_kv(
    params: dict, encoder_states: jax.Array, n_layers: int, n_heads: int, cdt
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Per-layer cross-attention K/V in decode-friendly layouts, once per call.

    K stores as ``(B, H, Dh, S)`` and V as ``(B, H, S, Dh)`` so each decode
    step contracts them directly — with the natural ``(B, S, H, Dh)`` layout
    XLA re-transposed K and V inside the loop EVERY step (~0.5 GB of shuffle
    traffic per token at large-v3 dims; the one-time transpose here is 15 MB
    per layer). Measured via scripts/profile_decode_ablation.py.
    """
    cross_k, cross_v = [], []
    for i in range(n_layers):
        lp = params[f"layer_{i}"]["cross"]
        k = _split_heads(_dense(lp["k"], encoder_states, cdt), n_heads)
        v = _split_heads(_dense(lp["v"], encoder_states, cdt), n_heads)
        cross_k.append(jnp.transpose(k, (0, 2, 3, 1)))  # (B, H, Dh, S)
        cross_v.append(jnp.transpose(v, (0, 2, 1, 3)))  # (B, H, S, Dh)
    return cross_k, cross_v


def _attend_self_step(q, k_t, v_hs, *, bias_row, compute_dtype):
    """Single-query causal self-attention over the pre-transposed cache.

    ``q``: (rows, 1, H, Dh); ``k_t``: (rows, H, Dh, Smax); ``v_hs``:
    (rows, H, Smax, Dh); ``bias_row``: (Smax,) additive mask. Same
    contractions/precision as :func:`_attend`, cache layouts chosen so the
    step contracts without per-step transposition.
    """
    head_dim = q.shape[-1]
    qh = q[:, 0]
    scores = jnp.einsum("bhd,bhds->bhs", qh, k_t) / jnp.sqrt(
        jnp.asarray(head_dim, dtype=compute_dtype)
    )
    scores = scores + bias_row[None, None, :].astype(scores.dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhs,bhsd->bhd", weights.astype(compute_dtype), v_hs)
    return out


def _attend_cross_step(q, k_t, v_hs, *, compute_dtype):
    """Single-query cross-attention over pre-transposed K/V.

    ``q``: (rows, 1, H, Dh); ``k_t``: (rows, H, Dh, S); ``v_hs``:
    (rows, H, S, Dh). Same contractions as :func:`_attend` (scores over Dh,
    value-sum over S, f32 softmax) on layouts that need no per-step
    transposition. Returns out (rows, 1, H·Dh-reshapable) and f32 weights
    (rows, H, S).
    """
    head_dim = q.shape[-1]
    qh = q[:, 0]  # (rows, H, Dh)
    scores = jnp.einsum("bhd,bhds->bhs", qh, k_t) / jnp.sqrt(
        jnp.asarray(head_dim, dtype=compute_dtype)
    )
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhs,bhsd->bhd", weights.astype(compute_dtype), v_hs)
    return out, weights


def _attend_cross_step_beamed(q, k_t, v_hs, *, beams, compute_dtype):
    """Cross-attention where K/V are shared by ``beams`` query rows each.

    All beams of a batch element attend the SAME encoder states, so K/V carry
    only ``B`` rows while q carries ``B·beams`` — materializing per-beam
    copies would cost ``beams×`` the dominant HBM buffer of the decode
    (~245 MB/row at large-v3) and the projection FLOPs.
    """
    head_dim = q.shape[-1]
    b = k_t.shape[0]
    qh = q[:, 0].reshape(b, beams, *q.shape[2:])  # (B, K, H, Dh)
    scores = jnp.einsum("bkhd,bhds->bkhs", qh, k_t) / jnp.sqrt(
        jnp.asarray(head_dim, dtype=compute_dtype)
    )
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bkhs,bhsd->bkhd", weights.astype(compute_dtype), v_hs)
    rows = b * beams
    return out.reshape(rows, *out.shape[2:]), weights.reshape(rows, *weights.shape[2:])


def _fuse_qkv_params(params: dict, n_layers: int, d_model: int) -> list[dict]:
    """Concatenated self-attention Q/K/V projections, one (d, 3d) per layer.

    Output columns of a matmul are independent dot products, so the fused
    product is bitwise identical to three separate projections while
    dropping two matmul+cast ops from the step body (the decode loop is
    op-overhead-bound at small batch; measured in scripts/profile_decode.py).
    """
    fused = []
    for i in range(n_layers):
        ap = params[f"layer_{i}"]["attn"]
        kernel = jnp.concatenate(
            [ap["q"]["kernel"], ap["k"]["kernel"], ap["v"]["kernel"]], axis=1
        )
        zero = jnp.zeros((d_model,), dtype=kernel.dtype)
        bias = jnp.concatenate(
            [ap["q"].get("bias", zero), ap["k"].get("bias", zero), ap["v"].get("bias", zero)]
        )
        fused.append({"kernel": kernel, "bias": bias})
    return fused


def _decoder_token_step(
    params: dict,
    qkv_fused: list[dict],
    cross_k: list[jax.Array],
    cross_v: list[jax.Array],
    self_k: list[jax.Array],
    self_v: list[jax.Array],
    token_ids: jax.Array,
    position: jax.Array,
    *,
    config,
    compute_dtype,
    align_spec: tuple[tuple[int, int], ...] = (),
    beams: int = 1,
    fused: bool = False,
    quant: dict | None = None,
):
    """One decoder forward for the token at ``position`` over cached state.

    Shared verbatim by the greedy and beam loops so both decode strategies
    carry identical numerics (``beams > 1`` only reshapes the cross-attention
    query grouping; contractions are unchanged). Returns float32 logits
    ``(rows, V)``, the updated per-layer cache lists, and per-slot alignment
    rows ``(rows, 1, S)``.

    ``fused=True`` routes the self/cross attention groups through the Pallas
    step kernels (``ops/decode_step_kernels``) — same op order and rounding
    points, 3 kernel launches per layer instead of ~10 XLA ops (the decode
    loop is dispatch-overhead-bound; see the kernel module docstring).
    Greedy-only: beam decoding keeps the XLA path (its cross K/V are shared
    per batch element, a grouping the kernels don't model).
    """
    cfg = config
    cdt = compute_dtype
    n_heads = cfg.n_heads
    eps = cfg.layer_norm_eps
    d_model = cfg.d_model
    max_len = cfg.max_target_positions
    rows = token_ids.shape[0]
    for layer_index, head_index in align_spec:
        if not (0 <= layer_index < cfg.decoder_layers and 0 <= head_index < n_heads):
            raise ValueError(
                f"align_spec pair ({layer_index}, {head_index}) is out of range "
                f"for a {cfg.decoder_layers}-layer, {n_heads}-head decoder."
            )

    if fused and beams != 1:
        raise ValueError("fused decode kernels support greedy (beams == 1) only.")
    if fused and quant is not None:
        raise ValueError("int8 decode weights are XLA-path only (fused=False).")
    # Stacked-cache support — (L, rows, H, Dh, Smax) / (L, rows, H, Smax,
    # Dh) — exists for the beam ablation harness ONLY: collapsing the beam
    # reorder to two large gathers MEASURED 1.8 ms/token SLOWER than the
    # per-layer tuple layout on v5e (10.53 vs 8.70, DECODE_ABLATION_r05 —
    # the per-layer update into the stacked buffer costs more than the 2*L
    # small gathers it saves), so production loops keep tuples. Numerics
    # are identical either way (same update/read ops).
    stacked = not isinstance(self_k, (list, tuple))
    if not stacked:
        self_k = list(self_k)
        self_v = list(self_v)
    align_rows: list[jax.Array | None] = [None] * len(align_spec)
    x = params["tok_embed"][token_ids] + params["pos_embed"][position]
    x = x[:, None, :]  # (rows, 1, d)
    key_visible = jnp.arange(max_len) <= position
    self_bias_row = jnp.where(key_visible, 0.0, _NEG_INF)

    if fused:
        from ser_tpu.ops import decode_step_kernels as dsk

        head_dim = d_model // n_heads
        x2 = x[:, 0, :]  # kernels take (rows, d)
        zero_bias = jnp.zeros((1, d_model), x2.dtype)
        for i in range(cfg.decoder_layers):
            lp = params[f"layer_{i}"]
            qkv = dsk.ln_qkv_project(
                x2,
                lp["attn_ln"]["scale"][None, :],
                lp["attn_ln"]["bias"][None, :],
                qkv_fused[i]["kernel"],
                qkv_fused[i]["bias"][None, :],
                eps=eps,
            )
            q_heads = qkv[:, :d_model].reshape(rows, n_heads, head_dim)
            k_new = _split_heads(qkv[:, None, d_model : 2 * d_model], n_heads)
            v_new = _split_heads(qkv[:, None, 2 * d_model :], n_heads)
            self_k[i] = jax.lax.dynamic_update_slice(
                self_k[i], k_new[:, 0][..., None], (0, 0, 0, position)
            )
            self_v[i] = jax.lax.dynamic_update_slice(
                self_v[i], jnp.swapaxes(v_new, 1, 2), (0, 0, position, 0)
            )
            attn_bias = lp["attn"]["out"].get("bias")
            x2 = dsk.self_attend_and_out(
                q_heads,
                self_k[i],
                self_v[i],
                dsk.per_head_out_proj(lp["attn"]["out"]["kernel"], n_heads),
                attn_bias[None, :] if attn_bias is not None else zero_bias,
                x2,
                position,
            )
            wq_heads, bq_heads = dsk.per_head_q_proj(
                lp["cross"]["q"]["kernel"],
                lp["cross"]["q"].get("bias", jnp.zeros((d_model,), x2.dtype)),
                n_heads,
            )
            cross_bias = lp["cross"]["out"].get("bias")
            x2, weights = dsk.cross_attention_step(
                x2,
                lp["cross_ln"]["scale"][None, :],
                lp["cross_ln"]["bias"][None, :],
                wq_heads,
                bq_heads,
                cross_k[i],
                cross_v[i],
                dsk.per_head_out_proj(lp["cross"]["out"]["kernel"], n_heads),
                cross_bias[None, :] if cross_bias is not None else zero_bias,
                eps=eps,
            )
            for slot, (layer_index, head_index) in enumerate(align_spec):
                if layer_index == i:
                    # Kernel weights are head-major (H, R, S).
                    align_rows[slot] = weights[head_index][:, None, :]
            h = _layer_norm(lp["mlp_ln"], x2[:, None, :], eps)
            h = gelu_erf(_dense(lp["mlp_in"], h, cdt))
            x2 = x2 + _dense(lp["mlp_out"], h, cdt)[:, 0, :]
        x = x2[:, None, :]
        x = _layer_norm(params["final_ln"], x, eps)
        logits = jnp.einsum("bqd,vd->bqv", x, params["tok_embed"])[:, 0]
        return logits.astype(jnp.float32), self_k, self_v, align_rows

    for i in range(cfg.decoder_layers):
        lp = params[f"layer_{i}"]
        ql = quant["layers"][i] if quant is not None else None
        h = _layer_norm(lp["attn_ln"], x, eps)
        qkv = (
            _dense_int8(ql["qkv"], h, cdt)
            if ql is not None
            else _dense(qkv_fused[i], h, cdt)
        )
        q = _split_heads(qkv[..., :d_model], n_heads)
        k_new = _split_heads(qkv[..., d_model : 2 * d_model], n_heads)
        v_new = _split_heads(qkv[..., 2 * d_model :], n_heads)
        # Caches hold K as (rows, H, Dh, Smax) and V as (rows, H, Smax, Dh);
        # the new column/row insertions move only size-1 axes (free), and the
        # attend contracts with no per-step cache transposition.
        if stacked:
            self_k = jax.lax.dynamic_update_slice(
                self_k, k_new[:, 0][..., None][None], (i, 0, 0, 0, position)
            )
            self_v = jax.lax.dynamic_update_slice(
                self_v, jnp.swapaxes(v_new, 1, 2)[None], (i, 0, 0, position, 0)
            )
            k_cache, v_cache = self_k[i], self_v[i]
        else:
            self_k[i] = jax.lax.dynamic_update_slice(
                self_k[i], k_new[:, 0][..., None], (0, 0, 0, position)
            )
            self_v[i] = jax.lax.dynamic_update_slice(
                self_v[i], jnp.swapaxes(v_new, 1, 2), (0, 0, position, 0)
            )
            k_cache, v_cache = self_k[i], self_v[i]
        out = _attend_self_step(
            q, k_cache, v_cache, bias_row=self_bias_row, compute_dtype=cdt
        )
        out_flat = out.reshape(rows, 1, -1)
        x = x + (
            _dense_int8(ql["attn_out"], out_flat, cdt)
            if ql is not None
            else _dense(lp["attn"]["out"], out_flat, cdt)
        )

        h = _layer_norm(lp["cross_ln"], x, eps)
        q_proj = (
            _dense_int8(ql["cross_q"], h, cdt)
            if ql is not None
            else _dense(lp["cross"]["q"], h, cdt)
        )
        q = _split_heads(q_proj, n_heads)
        if beams > 1:
            out, weights = _attend_cross_step_beamed(
                q, cross_k[i], cross_v[i], beams=beams, compute_dtype=cdt
            )
        else:
            out, weights = _attend_cross_step(q, cross_k[i], cross_v[i], compute_dtype=cdt)
        for slot, (layer_index, head_index) in enumerate(align_spec):
            if layer_index == i:
                align_rows[slot] = weights[:, head_index][:, None, :]  # (rows,1,S)
        out_flat = out.reshape(rows, 1, -1)
        x = x + (
            _dense_int8(ql["cross_out"], out_flat, cdt)
            if ql is not None
            else _dense(lp["cross"]["out"], out_flat, cdt)
        )

        h = _layer_norm(lp["mlp_ln"], x, eps)
        if ql is not None:
            h = gelu_erf(_dense_int8(ql["mlp_in"], h, cdt))
            x = x + _dense_int8(ql["mlp_out"], h, cdt)
        else:
            h = gelu_erf(_dense(lp["mlp_in"], h, cdt))
            x = x + _dense(lp["mlp_out"], h, cdt)

    x = _layer_norm(params["final_ln"], x, eps)
    if quant is not None:
        logits = _dense_int8(quant["vocab"], x, jnp.float32)[:, 0]
    else:
        logits = jnp.einsum("bqd,vd->bqv", x, params["tok_embed"])[:, 0]
    return logits.astype(jnp.float32), self_k, self_v, align_rows


@partial(
    jax.jit,
    static_argnames=(
        "config",
        "prefix_len",
        "align_spec",
        "compute_dtype",
        "temperature",
        "suppress_tokens",
        "timestamp_begin",
        "fused",
        "quant_int8",
    ),
)
def greedy_decode_kv_cache(
    params: dict,
    config,
    encoder_states: jax.Array,
    prefix: jax.Array,
    eot: jax.Array,
    *,
    prefix_len: int,
    align_spec: tuple[tuple[int, int], ...] = (),
    compute_dtype=jnp.float32,
    temperature: float = 0.0,
    rng_seed: int = 0,
    suppress_tokens: tuple[int, ...] = (),
    timestamp_begin: int | None = None,
    fused: bool = False,
    quant_int8: bool = False,
    qkv_fused: list[dict] | None = None,
):
    """Batched greedy decode over cached attention state, one dispatch total.

    Args:
      params: flax param tree of ``whisper.WhisperDecoder``.
      config: ``WhisperConfig`` (static).
      encoder_states: ``(B, S, d)`` encoder outputs; each row decodes
        independently with its own done flag.
      prefix: ``(prefix_len,)`` task prefix, shared across the batch.
      eot: end-of-text id (traced scalar).
      align_spec: static ``((layer, head), ...)`` pairs whose cross-attention
        probabilities are recorded per decoded position.
      temperature: 0.0 decodes greedily (argmax); > 0 samples from
        ``softmax(logits / temperature)`` — the retry lane for degenerate
        outputs (reference stable-ts escalates temperature on repetitive
        transcripts). Static, so each temperature is its own executable.
      rng_seed: sampling seed (ignored at temperature 0).
      suppress_tokens: static non-speech/special ids masked every step
        (a checkpoint's published ``suppress_tokens`` list).
      timestamp_begin: first timestamp id; when given, the published
        timestamp decoding rules apply (:func:`apply_timestamp_rules`).

    Returns:
      tokens ``(B, max_len)`` with the prefix at the front and generated ids
      after it (eot-padded), lengths ``(B,)`` of emitted non-eot tokens, and
      align ``(B, n_align, max_len, S)`` float32 attention probabilities.
      Align rows past a row's own length hold the attention of repeated EOT
      inputs while the rest of the batch drains — NOT zeros; consumers must
      mask by token counts (``reduce_alignment_matrix`` does).
    """
    cfg = config
    batch = encoder_states.shape[0]
    enc_len = encoder_states.shape[1]
    max_len = cfg.max_target_positions
    n_heads = cfg.n_heads
    head_dim = cfg.d_model // n_heads
    d_model = cfg.d_model
    eps = cfg.layer_norm_eps
    cdt = compute_dtype
    n_layers = cfg.decoder_layers

    # Cross-attention K/V depend only on encoder states: compute once, in
    # decode-friendly layouts. Self-attention Q/K/V projections fuse per
    # layer (bitwise-identical, fewer loop-body ops — the step is
    # op-overhead-bound at small batch; measured in scripts/profile_decode.py).
    cross_k, cross_v = _precompute_cross_kv(params, encoder_states, n_layers, n_heads, cdt)
    if qkv_fused is None:
        qkv_fused = _fuse_qkv_params(params, n_layers, d_model)
    # SER_DECODE_INT8 lane: quantize the weight stream ONCE per dispatch,
    # outside the loop — the step is weight-bandwidth-bound and int8 halves
    # the ~1.5 GB/token it reads (see quantize_decode_weights).
    quant = quantize_decode_weights(params, qkv_fused, n_layers) if quant_int8 else None

    tokens = jnp.full((batch, max_len), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :prefix_len].set(prefix[None, :prefix_len])
    # Caches live as PER-LAYER arrays in the carry (not one stacked tensor):
    # each step's dynamic_update_slice then rewrites only its own buffer,
    # which XLA aliases in place; a stacked (layers, ...) tensor measured as
    # a full copy per layer-write on TPU (~GBs of HBM traffic per token).
    # Layouts: K (rows, H, Dh, Smax) / V (rows, H, Smax, Dh) — see
    # _attend_self_step.
    self_k = tuple(
        jnp.zeros((batch, n_heads, head_dim, max_len), dtype=cdt)
        for _ in range(n_layers)
    )
    self_v = tuple(
        jnp.zeros((batch, n_heads, max_len, head_dim), dtype=cdt)
        for _ in range(n_layers)
    )
    align = tuple(
        jnp.zeros((batch, max_len, enc_len), dtype=jnp.float32)
        for _ in range(len(align_spec))
    )
    done = jnp.zeros((batch,), dtype=bool)
    max_ts = jnp.full(
        (batch,), timestamp_begin if timestamp_begin is not None else 0, dtype=jnp.int32
    )

    def cond(state):
        position, _, done, _, _, _, _ = state
        return jnp.logical_and(position < max_len - 1, ~jnp.all(done))

    def body(state):
        position, tokens, done, self_k, self_v, align, max_ts = state
        align = list(align)
        token_ids = jax.lax.dynamic_index_in_dim(tokens, position, axis=1, keepdims=False)
        logits, self_k, self_v, align_rows = _decoder_token_step(
            params,
            qkv_fused,
            cross_k,
            cross_v,
            list(self_k),
            list(self_v),
            token_ids,
            position,
            config=cfg,
            compute_dtype=cdt,
            align_spec=align_spec,
            fused=fused,
            quant=quant,
        )
        for slot, row in enumerate(align_rows):
            align[slot] = jax.lax.dynamic_update_slice(
                align[slot], row, (0, position, 0)
            )
        if suppress_tokens:
            logits = logits.at[:, jnp.asarray(suppress_tokens)].set(_NEG_INF)
        if timestamp_begin is not None:
            penultimate = jax.lax.dynamic_index_in_dim(
                tokens, jnp.maximum(position - 1, 0), axis=1, keepdims=False
            )
            logits = apply_timestamp_rules(
                logits,
                last_token=token_ids,
                penultimate_token=penultimate,
                max_timestamp=max_ts,
                generated_count=jnp.maximum(position + 1 - prefix_len, 0)
                * jnp.ones((batch,), dtype=jnp.int32),
                eot=eot,
                timestamp_begin=timestamp_begin,
            )
        if temperature > 0.0:
            step_key = jax.random.fold_in(jax.random.PRNGKey(rng_seed), position)
            next_token = jax.random.categorical(
                step_key, logits / temperature, axis=-1
            ).astype(jnp.int32)
        else:
            next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        generating = position + 1 >= prefix_len
        keep = jax.lax.dynamic_index_in_dim(tokens, position + 1, axis=1, keepdims=False)
        write = jnp.where(jnp.logical_and(generating, ~done), next_token, keep)
        tokens = jax.lax.dynamic_update_slice(tokens, write[:, None], (0, position + 1))
        if timestamp_begin is not None:
            wrote_ts = jnp.logical_and(
                jnp.logical_and(generating, ~done), write >= timestamp_begin
            )
            max_ts = jnp.where(wrote_ts, jnp.maximum(max_ts, write), max_ts)
        done = jnp.logical_or(done, jnp.logical_and(generating, write == eot))
        return position + 1, tokens, done, tuple(self_k), tuple(self_v), tuple(align), max_ts

    state = (jnp.asarray(0, dtype=jnp.int32), tokens, done, self_k, self_v, align, max_ts)
    _, tokens, _, _, _, align, _ = jax.lax.while_loop(cond, body, state)

    generated = tokens[:, prefix_len:]
    is_eot = generated == eot
    lengths = jnp.where(
        is_eot.any(axis=1), jnp.argmax(is_eot, axis=1), generated.shape[1]
    )
    align_stacked = (
        jnp.stack(align, axis=1)
        if align
        else jnp.zeros((batch, 0, max_len, enc_len), dtype=jnp.float32)
    )
    return tokens, lengths, align_stacked


@partial(
    jax.jit,
    static_argnames=(
        "config",
        "prefix_len",
        "beam_size",
        "length_penalty",
        "compute_dtype",
        "suppress_tokens",
        "timestamp_begin",
        "quant_int8",
    ),
)
def beam_decode_kv_cache(
    params: dict,
    config,
    encoder_states: jax.Array,
    prefix: jax.Array,
    eot: jax.Array,
    *,
    prefix_len: int,
    beam_size: int = 5,
    length_penalty: float = 1.0,
    compute_dtype=jnp.float32,
    suppress_tokens: tuple[int, ...] = (),
    timestamp_begin: int | None = None,
    quant_int8: bool = False,
    qkv_fused: list[dict] | None = None,
):
    """Batched beam-search decode over cached attention state, one dispatch.

    Capability parity with the reference's quality lane: its faster-whisper
    adapter transcribes with ``beam_size=5`` (reference
    ``transcript/backends/faster_whisper.py:263``). Beams flatten into the
    batch row axis (``rows = B*K``) and share the greedy path's
    ``_decoder_token_step`` verbatim, so per-token numerics match greedy
    exactly. Cross-attention K/V carry only ``B`` rows — every beam of a
    window attends the same encoder states, and per-beam copies would
    multiply the decode's dominant HBM buffer by ``K``.

    Finished hypotheses follow the published Whisper beam semantics (the
    openai BeamSearchDecoder / ctranslate2 behavior behind the reference
    backends): an EOT candidate whose score (INCLUDING the EOT log-prob)
    would have made the live top-k is diverted into a per-batch
    finished-hypothesis POOL — it is never kept in, nor evicted from, the
    live beam, which always holds K unfinished rows. The loop stops once a
    batch row has collected ``K`` finished hypotheses (patience 1.0) or the
    token budget ends. Final selection takes the pool's best by
    ``score / length ** length_penalty`` (GNMT-style), falling back to the
    best live beam for rows that never finished.

    Returns tokens ``(B, max_len)`` and lengths ``(B,)`` of the winning
    hypothesis (same contract as ``greedy_decode_kv_cache`` minus alignment
    capture — beam word timing runs a teacher-forced
    :func:`alignment_forward` on the winners afterwards).
    """
    cfg = config
    batch = encoder_states.shape[0]
    k_beams = beam_size
    rows = batch * k_beams
    max_len = cfg.max_target_positions
    n_heads = cfg.n_heads
    head_dim = cfg.d_model // n_heads
    cdt = compute_dtype
    n_layers = cfg.decoder_layers
    vocab = cfg.vocab_size

    cross_k, cross_v = _precompute_cross_kv(params, encoder_states, n_layers, n_heads, cdt)
    if qkv_fused is None:
        qkv_fused = _fuse_qkv_params(params, n_layers, cfg.d_model)
    quant = quantize_decode_weights(params, qkv_fused, n_layers) if quant_int8 else None

    tokens = jnp.full((rows, max_len), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :prefix_len].set(prefix[None, :prefix_len])
    self_k = tuple(
        jnp.zeros((rows, n_heads, head_dim, max_len), dtype=cdt)
        for _ in range(n_layers)
    )
    self_v = tuple(
        jnp.zeros((rows, n_heads, max_len, head_dim), dtype=cdt)
        for _ in range(n_layers)
    )
    # Identical beams must not fill top-k with the same candidate: only beam 0
    # starts live, the rest at -inf (the standard first-expansion trick).
    scores = jnp.tile(
        jnp.asarray([0.0] + [_NEG_INF] * (k_beams - 1), dtype=jnp.float32), batch
    )
    lengths = jnp.zeros((rows,), dtype=jnp.int32)  # emitted tokens per live beam
    max_ts = jnp.full(
        (rows,), timestamp_begin if timestamp_begin is not None else 0, dtype=jnp.int32
    )
    # Finished-hypothesis pool: the best-so-far per batch element plus a
    # count for the patience-style stop.
    best_tokens = jnp.full((batch, max_len), eot, dtype=jnp.int32)
    best_score = jnp.full((batch,), _NEG_INF, dtype=jnp.float32)  # normalized
    best_length = jnp.zeros((batch,), dtype=jnp.int32)
    n_finished = jnp.zeros((batch,), dtype=jnp.int32)

    def length_norm(length):
        return jnp.maximum(length.astype(jnp.float32), 1.0) ** length_penalty

    def cond(state):
        position = state[0]
        n_finished = state[10]
        return jnp.logical_and(
            position < max_len - 1, ~jnp.all(n_finished >= k_beams)
        )

    def body(state):
        (
            position,
            tokens,
            scores,
            lengths,
            self_k,
            self_v,
            max_ts,
            best_tokens,
            best_score,
            best_length,
            n_finished,
        ) = state
        token_ids = jax.lax.dynamic_index_in_dim(tokens, position, axis=1, keepdims=False)
        logits, self_k, self_v, _ = _decoder_token_step(
            params,
            qkv_fused,
            cross_k,
            cross_v,
            list(self_k),
            list(self_v),
            token_ids,
            position,
            config=cfg,
            compute_dtype=cdt,
            beams=k_beams,
            quant=quant,
        )
        if suppress_tokens:
            logits = logits.at[:, jnp.asarray(suppress_tokens)].set(_NEG_INF)
        if timestamp_begin is not None:
            penultimate = jax.lax.dynamic_index_in_dim(
                tokens, jnp.maximum(position - 1, 0), axis=1, keepdims=False
            )
            logits = apply_timestamp_rules(
                logits,
                last_token=token_ids,
                penultimate_token=penultimate,
                max_timestamp=max_ts,
                generated_count=jnp.maximum(position + 1 - prefix_len, 0)
                * jnp.ones((rows,), dtype=jnp.int32),
                eot=eot,
                timestamp_begin=timestamp_begin,
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        generating = position + 1 >= prefix_len

        def beam_update():
            scores3 = scores.reshape(batch, k_beams)
            lp3 = logprobs.reshape(batch, k_beams, vocab)
            # Finished candidates: each live beam proposing EOT, scored WITH
            # the EOT log-prob (published Whisper beam semantics).
            eot_scores = scores3 + jnp.take(lp3, eot, axis=2)  # (B, K)
            token_is_eot = jnp.arange(vocab)[None, None, :] == eot
            live = jnp.where(token_is_eot, _NEG_INF, scores3[:, :, None] + lp3)
            top_scores, top_idx = jax.lax.top_k(
                live.reshape(batch, k_beams * vocab), k_beams
            )  # (B, K)
            threshold = top_scores[:, k_beams - 1]
            # An EOT candidate counts as a finished hypothesis iff it would
            # have made the live top-k.
            would_select = eot_scores > threshold[:, None]  # (B, K)
            lengths3 = lengths.reshape(batch, k_beams)
            cand_norm = jnp.where(
                would_select, eot_scores / length_norm(lengths3), _NEG_INF
            )
            best_cand = jnp.argmax(cand_norm, axis=1)  # (B,)
            best_cand_score = jnp.take_along_axis(
                cand_norm, best_cand[:, None], axis=1
            )[:, 0]
            # A row stops ACCEPTING once it holds beam_size finished
            # hypotheses (published BeamSearchDecoder max_candidates cap):
            # without the gate, a row that finished early keeps improving its
            # pool while unrelated batch rows drain, making transcripts
            # depend on batch composition.
            accepting = n_finished < k_beams
            improved = (best_cand_score > best_score) & accepting
            parent_row = jnp.arange(batch) * k_beams + best_cand
            cand_tokens = jnp.take(tokens, parent_row, axis=0)  # (B, L)
            cand_tokens = jax.lax.dynamic_update_slice(
                cand_tokens,
                jnp.broadcast_to(eot, (batch, 1)).astype(jnp.int32),
                (0, position + 1),
            )
            new_best_tokens = jnp.where(improved[:, None], cand_tokens, best_tokens)
            new_best_score = jnp.where(improved, best_cand_score, best_score)
            new_best_length = jnp.where(
                improved,
                jnp.take_along_axis(lengths3, best_cand[:, None], axis=1)[:, 0],
                best_length,
            )
            new_n_finished = n_finished + jnp.where(
                accepting, jnp.sum(would_select.astype(jnp.int32), axis=1), 0
            )

            parent = top_idx // vocab
            token = (top_idx % vocab).astype(jnp.int32)
            parent_rows = (
                parent + jnp.arange(batch, dtype=parent.dtype)[:, None] * k_beams
            ).reshape(rows)
            return (
                top_scores.reshape(rows),
                parent_rows,
                token.reshape(rows),
                new_best_tokens,
                new_best_score,
                new_best_length,
                new_n_finished,
            )

        def prefix_update():
            forced = prefix[jnp.minimum(position + 1, prefix_len - 1)]
            return (
                scores,
                jnp.arange(rows, dtype=jnp.int32),
                jnp.full((rows,), forced, jnp.int32),
                best_tokens,
                best_score,
                best_length,
                n_finished,
            )

        (
            new_scores,
            parent_rows,
            next_token,
            best_tokens,
            best_score,
            best_length,
            n_finished,
        ) = jax.lax.cond(generating, beam_update, prefix_update)

        # Reorder every per-beam carry to follow the surviving parents. The
        # cache reorder is ~2.1-2.3 of the ~9.2-9.7 ms beam token on v5e;
        # the obvious layout fix (stacked caches, two large gathers) was
        # built and MEASURED 1.8 ms/token slower — negative result recorded
        # in DECODE_ABLATION_r05.json, so the per-layer tuple gathers stay.
        tokens = jnp.take(tokens, parent_rows, axis=0)
        lengths = jnp.take(lengths, parent_rows, axis=0)
        max_ts = jnp.take(max_ts, parent_rows, axis=0)
        self_k = tuple(jnp.take(k, parent_rows, axis=0) for k in self_k)
        self_v = tuple(jnp.take(v, parent_rows, axis=0) for v in self_v)

        tokens = jax.lax.dynamic_update_slice(
            tokens, next_token[:, None], (0, position + 1)
        )
        # Live beams never carry EOT, so every generated write lengthens.
        lengths = jnp.where(generating, lengths + 1, lengths)
        if timestamp_begin is not None:
            wrote_ts = jnp.logical_and(generating, next_token >= timestamp_begin)
            max_ts = jnp.where(wrote_ts, jnp.maximum(max_ts, next_token), max_ts)
        return (
            position + 1,
            tokens,
            new_scores,
            lengths,
            self_k,
            self_v,
            max_ts,
            best_tokens,
            best_score,
            best_length,
            n_finished,
        )

    state = (
        jnp.asarray(0, dtype=jnp.int32),
        tokens,
        scores,
        lengths,
        self_k,
        self_v,
        max_ts,
        best_tokens,
        best_score,
        best_length,
        n_finished,
    )
    (
        _,
        tokens,
        scores,
        lengths,
        _,
        _,
        _,
        best_tokens,
        best_score,
        best_length,
        n_finished,
    ) = jax.lax.while_loop(cond, body, state)

    # Rows that never finished fall back to the best live beam.
    live_final = (scores / length_norm(lengths)).reshape(batch, k_beams)
    live_best = jnp.argmax(live_final, axis=1)
    live_rows = jnp.arange(batch) * k_beams + live_best
    live_tokens = jnp.take(tokens, live_rows, axis=0)
    live_lengths = jnp.take(lengths, live_rows, axis=0)
    has_finished = n_finished > 0
    out_tokens = jnp.where(has_finished[:, None], best_tokens, live_tokens)
    out_lengths = jnp.where(has_finished, best_length, live_lengths)
    return out_tokens, out_lengths


@partial(
    jax.jit,
    static_argnames=("config", "align_spec", "compute_dtype"),
)
def alignment_forward(
    params: dict,
    config,
    encoder_states: jax.Array,
    tokens: jax.Array,
    *,
    align_spec: tuple[tuple[int, int], ...],
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Teacher-forced cross-attention capture over decoded tokens, one pass.

    The beam loop cannot afford per-beam alignment buffers, so beam word
    timing re-runs the decoder ONCE over the winning token rows with full
    causal attention and records the alignment heads' cross-attention — the
    same second teacher-forced pass the reference's torch stacks use for
    word timestamps (stable-ts semantics). Greedy keeps its free in-loop
    capture.

    Returns ``(B, n_align, L, S)`` float32 probabilities over the full
    padded token axis (rows past a sequence's length attend to padding and
    are masked later by ``reduce_alignment_matrix``).
    """
    cfg = config
    cdt = compute_dtype
    n_heads = cfg.n_heads
    eps = cfg.layer_norm_eps
    batch, seq_len = tokens.shape
    for layer_index, head_index in align_spec:
        if not (0 <= layer_index < cfg.decoder_layers and 0 <= head_index < n_heads):
            raise ValueError(
                f"align_spec pair ({layer_index}, {head_index}) is out of range "
                f"for a {cfg.decoder_layers}-layer, {n_heads}-head decoder."
            )

    x = params["tok_embed"][tokens] + params["pos_embed"][None, :seq_len]
    causal = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
    self_bias = jnp.where(causal, 0.0, _NEG_INF)[None, None, :, :]

    captured: list[jax.Array | None] = [None] * len(align_spec)
    for i in range(cfg.decoder_layers):
        lp = params[f"layer_{i}"]
        h = _layer_norm(lp["attn_ln"], x, eps)
        q = _split_heads(_dense(lp["attn"]["q"], h, cdt), n_heads)
        k = _split_heads(_dense(lp["attn"]["k"], h, cdt), n_heads)
        v = _split_heads(_dense(lp["attn"]["v"], h, cdt), n_heads)
        out, _ = _attend(q, k, v, bias=self_bias, compute_dtype=cdt)
        x = x + _dense(lp["attn"]["out"], out.reshape(batch, seq_len, -1), cdt)

        h = _layer_norm(lp["cross_ln"], x, eps)
        q = _split_heads(_dense(lp["cross"]["q"], h, cdt), n_heads)
        ck = _split_heads(_dense(lp["cross"]["k"], encoder_states, cdt), n_heads)
        cv = _split_heads(_dense(lp["cross"]["v"], encoder_states, cdt), n_heads)
        out, weights = _attend(q, ck, cv, bias=None, compute_dtype=cdt)
        for slot, (layer_index, head_index) in enumerate(align_spec):
            if layer_index == i:
                captured[slot] = weights[:, head_index].astype(jnp.float32)
        x = x + _dense(lp["cross"]["out"], out.reshape(batch, seq_len, -1), cdt)

        h = _layer_norm(lp["mlp_ln"], x, eps)
        h = gelu_erf(_dense(lp["mlp_in"], h, cdt))
        x = x + _dense(lp["mlp_out"], h, cdt)

    return jnp.stack(captured, axis=1)


@partial(jax.jit, static_argnames=("prefix_len", "medfilt_width"))
def reduce_alignment_matrix(
    align: jax.Array,
    token_counts: jax.Array,
    num_frames: jax.Array,
    *,
    prefix_len: int,
    medfilt_width: int = 7,
) -> jax.Array:
    """Per-head attention → one DTW cost matrix, ON DEVICE.

    Mirrors the host pipeline in ``word_timing.word_timings_from_alignment``
    (mask+renormalize → standardize across valid token rows → median filter
    along frames → mean over heads) so only a ``(B, L, S)`` matrix crosses
    the host link instead of the full ``(B, heads, L, S)`` capture buffer —
    on a remote-attached TPU that transfer, not the decode, dominated
    transcription latency.

    Args:
      align: ``(B, n_heads, max_len, S)`` captured probabilities.
      token_counts: ``(B,)`` prefix_len + emitted tokens per row.
      num_frames: ``(B,)`` encoder frames actually covered by audio.
    """
    batch, _, max_len, enc_len = align.shape
    frame_ok = jnp.arange(enc_len)[None, None, None, :] < num_frames[:, None, None, None]
    weights = jnp.where(frame_ok, align, 0.0)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-12)
    rows = jnp.arange(max_len)[None, :]
    # Cap at max_len - 1: a sequence that exhausts the token budget without
    # EOT appends a final token whose attention row was never captured (the
    # loop stops before it becomes an input step) — counting that all-zero
    # row valid would skew the standardization statistics and feed garbage
    # into DTW for the final word.
    row_ok = (rows >= prefix_len) & (
        rows < jnp.minimum(token_counts, max_len - 1)[:, None]
    )
    mask = row_ok[:, None, :, None].astype(weights.dtype)
    count = jnp.maximum(jnp.sum(mask, axis=2, keepdims=True), 1.0)
    mean = jnp.sum(weights * mask, axis=2, keepdims=True) / count
    var = jnp.sum(jnp.square(weights - mean) * mask, axis=2, keepdims=True) / count
    weights = (weights - mean) / (jnp.sqrt(var) + 1e-9)
    half = medfilt_width // 2
    # Reflect at each row's VALID frame boundary before filtering: the host
    # pipeline (word_timings_from_alignment, openai timing.py) crops to
    # :num_frames and reflect-pads real data, so the filter window at the
    # audio tail must see mirrored valid columns — not the standardized
    # padding columns ((0-mean)/std), which would shift the last words'
    # timings on every chunk shorter than 30 s.
    col = jnp.arange(enc_len)[None, :]
    boundary = num_frames[:, None]
    reflected = jnp.where(
        col >= boundary, jnp.clip(2 * boundary - 2 - col, 0, enc_len - 1), col
    )
    weights = jnp.take_along_axis(
        weights, jnp.broadcast_to(reflected[:, None, None, :], weights.shape), axis=-1
    )
    padded = jnp.pad(weights, ((0, 0), (0, 0), (0, 0), (half, half)), mode="reflect")
    stacked = jnp.stack(
        [padded[..., k : k + enc_len] for k in range(medfilt_width)], axis=-1
    )
    weights = jnp.sort(stacked, axis=-1)[..., half]
    return jnp.mean(weights, axis=1)


def default_alignment_spec(
    decoder_layers: int, n_heads: int, *, max_pairs: int = 32
) -> tuple[tuple[int, int], ...]:
    """Fallback alignment heads when a checkpoint publishes none.

    Cross-attention in the upper half of the decoder tracks the audio
    position most sharply (the published per-model head dumps all live
    there), so take every head from layers ``n//2..`` and subsample evenly
    to bound the capture buffer.
    """
    pairs = [
        (layer, head)
        for layer in range(decoder_layers // 2, decoder_layers)
        for head in range(n_heads)
    ]
    if len(pairs) > max_pairs:
        stride = len(pairs) / max_pairs
        pairs = [pairs[int(i * stride)] for i in range(max_pairs)]
    return tuple(pairs)


__all__ = [
    "alignment_forward",
    "apply_timestamp_rules",
    "beam_decode_kv_cache",
    "default_alignment_spec",
    "greedy_decode_kv_cache",
    "reduce_alignment_matrix",
]
