"""Int8 decode weight stream (``SER_DECODE_INT8=1`` opt-in lane).

The KV-cache decode step is weight-bandwidth-bound (~1.5 GB of layer
weights per token at large-v3 — ``DECODE_ABLATION_r03.json``); pre-quantized
int8 weights halve that stream. These tests pin the numerics contract on
CPU: bounded dequantization error, high logit fidelity versus the f32 path,
and that both decode loops run the lane end to end. Never a default
(ADR 0005 policy: opt-in quantized lanes with measured artifacts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.models import whisper_decode as wd
from ser_tpu.models.whisper import CHUNK_FRAMES, WhisperConfig, WhisperDecoder

CFG = WhisperConfig.tiny()


@pytest.fixture(scope="module")
def decoder_params():
    decoder = WhisperDecoder(CFG)
    enc_len = 16
    params = decoder.init(
        jax.random.PRNGKey(0),
        np.zeros((1, CFG.max_target_positions), dtype=np.int32),
        np.zeros((1, enc_len, CFG.d_model), dtype=np.float32),
    )["params"]
    return params, enc_len


def test_quantized_weights_reconstruct_within_half_step(decoder_params):
    params, _ = decoder_params
    qkv = wd._fuse_qkv_params(params, CFG.decoder_layers, CFG.d_model)
    quant = wd.quantize_decode_weights(params, qkv, CFG.decoder_layers)
    entry = quant["layers"][0]["mlp_in"]
    recon = entry["w8"].astype(jnp.float32) * entry["scale"]
    err = np.abs(np.asarray(recon) - np.asarray(params["layer_0"]["mlp_in"]["kernel"]))
    # Symmetric rounding: every element within half a quantization step.
    assert float(err.max()) <= float(np.asarray(entry["scale"]).max()) * 0.5 + 1e-7
    # Vocab projection covers tok_embed transposed.
    assert quant["vocab"]["w8"].shape == (CFG.d_model, CFG.vocab_size)


def test_int8_step_logits_track_f32(decoder_params):
    """Per-step logits through the W8A8 stream stay highly correlated with
    the f32 path — the contract that makes the lane usable for decode."""
    params, enc_len = decoder_params
    qkv = wd._fuse_qkv_params(params, CFG.decoder_layers, CFG.d_model)
    quant = wd.quantize_decode_weights(params, qkv, CFG.decoder_layers)
    rng = np.random.default_rng(0)
    states = jnp.asarray(rng.standard_normal((2, enc_len, CFG.d_model)), jnp.float32)
    cross_k, cross_v = wd._precompute_cross_kv(
        params, states, CFG.decoder_layers, CFG.n_heads, jnp.float32
    )
    head_dim = CFG.d_model // CFG.n_heads
    self_k = [
        jnp.zeros((2, CFG.n_heads, head_dim, CFG.max_target_positions), jnp.float32)
        for _ in range(CFG.decoder_layers)
    ]
    self_v = [
        jnp.zeros((2, CFG.n_heads, CFG.max_target_positions, head_dim), jnp.float32)
        for _ in range(CFG.decoder_layers)
    ]
    token_ids = jnp.asarray([1, 2], jnp.int32)
    position = jnp.asarray(0, jnp.int32)

    logits_f32, _, _, _ = wd._decoder_token_step(
        params, qkv, cross_k, cross_v, list(self_k), list(self_v),
        token_ids, position, config=CFG, compute_dtype=jnp.float32,
    )
    logits_q, _, _, _ = wd._decoder_token_step(
        params, qkv, cross_k, cross_v, list(self_k), list(self_v),
        token_ids, position, config=CFG, compute_dtype=jnp.float32, quant=quant,
    )
    a = np.asarray(logits_f32, np.float64)
    b = np.asarray(logits_q, np.float64)
    for row in range(a.shape[0]):
        ar, br = a[row] - a[row].mean(), b[row] - b[row].mean()
        corr = float(ar @ br / (np.linalg.norm(ar) * np.linalg.norm(br) + 1e-12))
        assert corr > 0.99, f"int8 logits diverged (corr={corr})"


def test_greedy_and_beam_loops_run_int8(decoder_params):
    params, enc_len = decoder_params
    rng = np.random.default_rng(1)
    states = jnp.asarray(rng.standard_normal((2, enc_len, CFG.d_model)), jnp.float32)
    prefix = jnp.asarray([1, 2, 3], jnp.int32)
    eot = jnp.asarray(CFG.vocab_size - 1, jnp.int32)

    tokens, lengths, _ = wd.greedy_decode_kv_cache(
        params, CFG, states, prefix, eot, prefix_len=3, quant_int8=True
    )
    assert tokens.shape == (2, CFG.max_target_positions)
    assert np.asarray(lengths).min() >= 0

    btokens, blengths = wd.beam_decode_kv_cache(
        params, CFG, states, prefix, eot, prefix_len=3, beam_size=3, quant_int8=True
    )
    assert btokens.shape == (2, CFG.max_target_positions)
    assert np.isfinite(np.asarray(blengths)).all()


def test_fused_kernels_reject_quant(decoder_params):
    params, enc_len = decoder_params
    qkv = wd._fuse_qkv_params(params, CFG.decoder_layers, CFG.d_model)
    quant = wd.quantize_decode_weights(params, qkv, CFG.decoder_layers)
    with pytest.raises(ValueError, match="int8 decode"):
        wd._decoder_token_step(
            params, qkv, [], [], [], [],
            jnp.asarray([0], jnp.int32), jnp.asarray(0, jnp.int32),
            config=CFG, compute_dtype=jnp.float32, fused=True, quant=quant,
        )
