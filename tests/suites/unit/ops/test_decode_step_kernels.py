"""Fused decode-step Pallas kernels vs plain-JAX math (interpret mode on CPU).

These kernels are the recorded-negative-result fused decode path
(``greedy_decode_kv_cache(fused=True)``, COMPONENTS known-gaps #3) — they are
kept behind a flag with token-for-token parity, so their numerics must stay
pinned to the plain implementation's op order and rounding.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ser_tpu.ops import decode_step_kernels as dsk  # noqa: E402

R, H, DH, SMAX, S = 2, 2, 4, 8, 6
D = H * DH
EPS = 1e-5


def _rng(seed):
    return np.random.default_rng(seed)


def _ln(x32, scale, bias):
    mean = x32.mean(axis=-1, keepdims=True)
    var = np.maximum(0.0, (x32**2).mean(axis=-1, keepdims=True) - mean**2)
    return (x32 - mean) / np.sqrt(var + EPS) * scale + bias


def test_ln_qkv_project_matches_plain_math():
    rng = _rng(0)
    x = rng.standard_normal((R, D)).astype(np.float32)
    scale = rng.standard_normal((1, D)).astype(np.float32)
    bias = rng.standard_normal((1, D)).astype(np.float32)
    w = rng.standard_normal((D, 3 * D)).astype(np.float32)
    b = rng.standard_normal((1, 3 * D)).astype(np.float32)

    got = np.asarray(
        dsk.ln_qkv_project(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
            jnp.asarray(w), jnp.asarray(b), eps=EPS,
        )
    )
    want = _ln(x, scale, bias) @ w + b
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_self_attend_and_out_masks_future_positions():
    rng = _rng(1)
    q = rng.standard_normal((R, H, DH)).astype(np.float32)
    k = rng.standard_normal((R, H, DH, SMAX)).astype(np.float32)
    v = rng.standard_normal((R, H, SMAX, DH)).astype(np.float32)
    w_out = rng.standard_normal((H, DH, D)).astype(np.float32)
    b_out = rng.standard_normal((1, D)).astype(np.float32)
    x_res = rng.standard_normal((R, D)).astype(np.float32)
    position = 3  # cache slots 0..3 visible, 4..SMAX-1 masked

    got = np.asarray(
        dsk.self_attend_and_out(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(w_out), jnp.asarray(b_out), jnp.asarray(x_res),
            jnp.asarray(position, dtype=jnp.int32),
        )
    )

    want = np.empty_like(x_res)
    for row in range(R):
        acc = np.zeros((D,), dtype=np.float32)
        for head in range(H):
            scores = (q[row, head] @ k[row, head]) / np.sqrt(DH)
            scores[position + 1 :] = -np.inf
            weights = np.exp(scores - scores.max())
            weights /= weights.sum()
            acc += (weights @ v[row, head]) @ w_out[head]
        want[row] = x_res[row] + acc + b_out[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # Poisoning masked cache slots must not change the output.
    k_poison = k.copy()
    v_poison = v.copy()
    k_poison[..., position + 1 :] = 1e4
    v_poison[:, :, position + 1 :, :] = -1e4
    got_poisoned = np.asarray(
        dsk.self_attend_and_out(
            jnp.asarray(q), jnp.asarray(k_poison), jnp.asarray(v_poison),
            jnp.asarray(w_out), jnp.asarray(b_out), jnp.asarray(x_res),
            jnp.asarray(position, dtype=jnp.int32),
        )
    )
    np.testing.assert_allclose(got_poisoned, got, rtol=1e-6, atol=1e-6)


def test_cross_attention_step_matches_plain_math_and_captures_weights():
    rng = _rng(2)
    x = rng.standard_normal((R, D)).astype(np.float32)
    scale = rng.standard_normal((1, D)).astype(np.float32)
    bias = rng.standard_normal((1, D)).astype(np.float32)
    w_q = rng.standard_normal((H, D, DH)).astype(np.float32)
    b_q = rng.standard_normal((H, 1, DH)).astype(np.float32)
    ck = rng.standard_normal((R, H, DH, S)).astype(np.float32)
    cv = rng.standard_normal((R, H, S, DH)).astype(np.float32)
    w_out = rng.standard_normal((H, DH, D)).astype(np.float32)
    b_out = rng.standard_normal((1, D)).astype(np.float32)

    got_x, got_w = dsk.cross_attention_step(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
        jnp.asarray(w_q), jnp.asarray(b_q), jnp.asarray(ck), jnp.asarray(cv),
        jnp.asarray(w_out), jnp.asarray(b_out), eps=EPS,
    )
    got_x, got_w = np.asarray(got_x), np.asarray(got_w)
    assert got_w.shape == (H, R, S)

    normed = _ln(x, scale, bias)
    want_x = np.empty_like(x)
    want_w = np.empty((H, R, S), dtype=np.float32)
    for row in range(R):
        acc = np.zeros((D,), dtype=np.float32)
        for head in range(H):
            q = normed[row] @ w_q[head] + b_q[head, 0]
            scores = (q @ ck[row, head]) / np.sqrt(DH)
            weights = np.exp(scores - scores.max())
            weights /= weights.sum()
            want_w[head, row] = weights
            acc += (weights @ cv[row, head]) @ w_out[head]
        want_x[row] = x[row] + acc + b_out[0]
    np.testing.assert_allclose(got_x, want_x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_w, want_w, rtol=2e-4, atol=2e-4)
    # Alignment capture is a probability simplex per (head, row).
    np.testing.assert_allclose(got_w.sum(axis=-1), 1.0, rtol=1e-5)
