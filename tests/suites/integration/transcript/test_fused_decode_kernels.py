"""Fused Pallas decode-step kernels vs the XLA path: token + numeric parity.

Runs in interpreter mode on the CPU suite (the kernels auto-interpret off
TPU), so every contraction, mask, rounding point, and the in-place cache
aliasing are exercised with the exact kernel code that compiles on TPU.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ser_tpu.models.whisper import WhisperConfig, WhisperDecoder  # noqa: E402
from ser_tpu.models.whisper_decode import (  # noqa: E402
    _decoder_token_step,
    _fuse_qkv_params,
    _precompute_cross_kv,
    greedy_decode_kv_cache,
)


@pytest.fixture(scope="module")
def tiny_setup():
    config = WhisperConfig.tiny()
    decoder = WhisperDecoder(config)
    enc_len = 48
    batch = 2
    rng = np.random.default_rng(0)
    encoder_states = jnp.asarray(
        rng.standard_normal((batch, enc_len, config.d_model)), dtype=jnp.float32
    )
    tokens0 = np.zeros((1, config.max_target_positions), dtype=np.int32)
    states0 = np.zeros((1, enc_len, config.d_model), dtype=np.float32)
    params = decoder.init(jax.random.PRNGKey(0), tokens0, states0)["params"]
    return config, params, encoder_states


def _fresh_caches(config, batch):
    head_dim = config.d_model // config.n_heads
    max_len = config.max_target_positions
    self_k = [
        jnp.zeros((batch, config.n_heads, head_dim, max_len), dtype=jnp.float32)
        for _ in range(config.decoder_layers)
    ]
    self_v = [
        jnp.zeros((batch, config.n_heads, max_len, head_dim), dtype=jnp.float32)
        for _ in range(config.decoder_layers)
    ]
    return self_k, self_v


def _run_steps(config, params, encoder_states, *, fused, steps=3):
    batch = encoder_states.shape[0]
    cross_k, cross_v = _precompute_cross_kv(
        params, encoder_states, config.decoder_layers, config.n_heads, jnp.float32
    )
    qkv_fused = _fuse_qkv_params(params, config.decoder_layers, config.d_model)
    self_k, self_v = _fresh_caches(config, batch)
    token_ids = jnp.asarray([1, 2], dtype=jnp.int32)
    outs = []
    for position in range(steps):
        logits, self_k, self_v, align_rows = _decoder_token_step(
            params,
            qkv_fused,
            cross_k,
            cross_v,
            self_k,
            self_v,
            token_ids,
            jnp.asarray(position, dtype=jnp.int32),
            config=config,
            compute_dtype=jnp.float32,
            align_spec=((0, 1), (1, 2)),
            fused=fused,
        )
        outs.append((logits, align_rows))
        token_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return outs, self_k, self_v


def test_stepwise_logits_align_and_caches_match(tiny_setup):
    config, params, encoder_states = tiny_setup
    ref, ref_k, ref_v = _run_steps(config, params, encoder_states, fused=False)
    got, got_k, got_v = _run_steps(config, params, encoder_states, fused=True)
    for (ref_logits, ref_align), (got_logits, got_align) in zip(ref, got):
        np.testing.assert_allclose(got_logits, ref_logits, rtol=1e-5, atol=1e-5)
        for ref_row, got_row in zip(ref_align, got_align):
            np.testing.assert_allclose(got_row, ref_row, rtol=1e-5, atol=1e-6)
    for layer in range(config.decoder_layers):
        np.testing.assert_allclose(got_k[layer], ref_k[layer], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_v[layer], ref_v[layer], rtol=1e-5, atol=1e-6)


def test_full_greedy_decode_token_parity(tiny_setup):
    config, params, encoder_states = tiny_setup
    prefix = jnp.asarray([1, 2, 3], dtype=jnp.int32)
    kwargs = dict(
        prefix_len=3,
        align_spec=((0, 1),),
        compute_dtype=jnp.float32,
        suppress_tokens=(7, 9),
    )
    eot = jnp.asarray(5, dtype=jnp.int32)
    ref_tokens, ref_lengths, ref_align = greedy_decode_kv_cache(
        params, config, encoder_states, prefix, eot, fused=False, **kwargs
    )
    got_tokens, got_lengths, got_align = greedy_decode_kv_cache(
        params, config, encoder_states, prefix, eot, fused=True, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(got_tokens), np.asarray(ref_tokens))
    np.testing.assert_array_equal(np.asarray(got_lengths), np.asarray(ref_lengths))
    np.testing.assert_allclose(got_align, ref_align, rtol=1e-5, atol=1e-6)


def test_fused_rejects_beam_grouping(tiny_setup):
    config, params, encoder_states = tiny_setup
    cross_k, cross_v = _precompute_cross_kv(
        params, encoder_states, config.decoder_layers, config.n_heads, jnp.float32
    )
    qkv_fused = _fuse_qkv_params(params, config.decoder_layers, config.d_model)
    self_k, self_v = _fresh_caches(config, encoder_states.shape[0])
    with pytest.raises(ValueError, match="greedy"):
        _decoder_token_step(
            params,
            qkv_fused,
            cross_k,
            cross_v,
            self_k,
            self_v,
            jnp.asarray([1, 2], dtype=jnp.int32),
            jnp.asarray(0, dtype=jnp.int32),
            config=config,
            compute_dtype=jnp.float32,
            beams=2,
            fused=True,
        )
