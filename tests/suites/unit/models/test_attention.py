"""Per-owner tests for the attention dispatch module.

The einsum path is the numerical ground truth every encoder rides on CPU (and
the verification baseline for the Pallas flash path, which is TPU-gated).
These tests pin its math against a plain numpy softmax-attention oracle, the
frame-mask semantics, and the dispatch/padding policy.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ser_tpu.models import attention  # noqa: E402


def _numpy_attention(q, k, v, mask=None):
    """(B, T, H, D) softmax attention oracle in float64."""
    q64, k64, v64 = (np.asarray(t, dtype=np.float64) for t in (q, k, v))
    head_dim = q64.shape[-1]
    scores = np.einsum("bqhd,bkhd->bhqk", q64, k64) / np.sqrt(head_dim)
    if mask is not None:
        scores = np.where(mask[:, None, None, :], scores, -1e30)
    weights = np.exp(scores - scores.max(axis=-1, keepdims=True))
    weights = weights / weights.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", weights, v64)


@pytest.fixture()
def qkv():
    rng = np.random.default_rng(7)
    shape = (2, 9, 3, 8)  # (B, T, H, D)
    return tuple(rng.standard_normal(shape).astype(np.float32) for _ in range(3))


def test_einsum_path_matches_numpy_oracle(qkv):
    q, k, v = qkv
    out = attention.multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), _numpy_attention(q, k, v), atol=2e-5)


def test_frame_mask_excludes_padded_keys(qkv):
    q, k, v = qkv
    mask = np.ones((2, 9), dtype=bool)
    mask[:, 6:] = False  # last three frames are padding
    out = attention.multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), frame_mask=jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(out), _numpy_attention(q, k, v, mask=mask), atol=2e-5
    )


def test_masked_keys_cannot_influence_valid_queries(qkv):
    """Perturbing padded K/V rows must not change valid-query outputs."""
    q, k, v = qkv
    mask = np.ones((2, 9), dtype=bool)
    mask[:, 7:] = False
    base = np.asarray(
        attention.multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), frame_mask=jnp.asarray(mask)
        )
    )
    k2, v2 = k.copy(), v.copy()
    k2[:, 7:] += 100.0
    v2[:, 7:] -= 100.0
    perturbed = np.asarray(
        attention.multi_head_attention(
            jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), frame_mask=jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(perturbed[:, :7], base[:, :7], atol=1e-6)


def test_output_preserves_input_dtype_layout(qkv):
    q, k, v = qkv
    out = attention.multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    assert out.shape == q.shape
    assert out.dtype == jnp.float32


def test_pad_len_block_policy():
    """Short sequences pad to 128 granularity, long ones to the 512 block."""
    assert attention._pad_len(1) == 128
    assert attention._pad_len(128) == 128
    assert attention._pad_len(129) == 256
    assert attention._pad_len(512) == 512
    assert attention._pad_len(513) == 1024
    assert attention._pad_len(1500) == 1536


def test_flash_dispatch_policy(monkeypatch):
    # Flash defaults ON for accelerators but NEVER runs on the CPU backend —
    # the kernel is TPU-only; einsum is the CPU/ground-truth path.
    monkeypatch.delenv("SER_FLASH_ATTENTION", raising=False)
    if jax.default_backend() == "cpu":
        assert attention._flash_enabled() is False
    # An explicit opt-out always wins, any backend.
    monkeypatch.setenv("SER_FLASH_ATTENTION", "0")
    assert attention._flash_enabled() is False


def test_block_sizes_full_sequence_and_capped():
    # Full-sequence blocks up to the VMEM cap; above it, the largest
    # candidate edge that divides the padded length.
    assert attention._block_sizes(128).block_q == 128
    assert attention._block_sizes(1536).block_q == 1536
    assert attention._block_sizes(2048).block_q == 2048
    bs = attention._block_sizes(2560)  # 5*512: 2048/1536/1024 don't divide
    assert bs.block_q == bs.block_k == 512
    bs = attention._block_sizes(3072)  # 2*1536
    assert bs.block_q == 1536
    for padded in (128, 256, 384, 512, 1024, 1536, 2048, 2560, 3072, 4096):
        assert padded % attention._block_sizes(padded).block_q == 0
