"""Per-owner tests for ``ser_tpu/models/quant.py`` — the W8A8 int8 lane.

The int8 path is a TPU-native addition with no reference counterpart
(jsugg/ser runs torch fp16/fp32): it exists because the accurate encoder's
projection-matmul stream is MXU-bound at ~91% of the bf16 peak
(ENCODER_BUDGET_r03.json) and the int8 MXU path runs it 1.42x faster
(INT8_MATMUL_r03.json). Contracts pinned here:

- ``QuantDense`` shares ``nn.Dense``'s exact parameter layout, so bf16 and
  int8 encoders load the SAME checkpoints/converters,
- the quantization math matches a plain-numpy W8A8 reference bit-for-bit,
- whole-encoder int8 embeddings stay close to the f32 path (cosine) on a
  tiny config, and the opt-in threads through the backend + runtime policy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ser_tpu.models.quant import QuantDense


def _toy_inputs(in_dim=24, out_dim=16, rows=10, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((rows, in_dim)) * 0.7, jnp.float32)
    return x, in_dim, out_dim


class TestParamCompatibility:
    def test_param_tree_matches_nn_dense(self):
        x, _, out_dim = _toy_inputs()
        q = QuantDense(out_dim).init(jax.random.PRNGKey(0), x)["params"]
        d = nn.Dense(out_dim).init(jax.random.PRNGKey(0), x)["params"]
        assert set(q) == set(d) == {"kernel", "bias"}
        for name in ("kernel", "bias"):
            assert q[name].shape == d[name].shape
            assert q[name].dtype == d[name].dtype
            # Same initializers AND same rng stream => identical init values.
            np.testing.assert_array_equal(np.asarray(q[name]), np.asarray(d[name]))

    def test_dense_params_load_into_quant_dense(self):
        x, _, out_dim = _toy_inputs(seed=3)
        params = nn.Dense(out_dim).init(jax.random.PRNGKey(7), x)
        out = QuantDense(out_dim, dtype=jnp.float32).apply(params, x)
        ref = nn.Dense(out_dim).apply(params, x)
        # Same weights, quantized arithmetic: close but not equal.
        cos = np.dot(np.ravel(out), np.ravel(ref)) / (
            np.linalg.norm(out) * np.linalg.norm(ref)
        )
        assert cos > 0.999

    def test_no_bias_variant(self):
        x, _, out_dim = _toy_inputs()
        params = QuantDense(out_dim, use_bias=False).init(jax.random.PRNGKey(0), x)
        assert set(params["params"]) == {"kernel"}
        out = QuantDense(out_dim, use_bias=False, dtype=jnp.float32).apply(params, x)
        assert np.all(np.isfinite(np.asarray(out)))


class TestQuantizationMath:
    def test_matches_numpy_w8a8_reference(self):
        """Bit-exact against an independent numpy W8A8 implementation."""
        x, in_dim, out_dim = _toy_inputs(seed=11)
        params = QuantDense(out_dim).init(jax.random.PRNGKey(2), x)
        out = np.asarray(QuantDense(out_dim, dtype=jnp.float32).apply(params, x))

        kernel = np.asarray(params["params"]["kernel"], np.float32)
        bias = np.asarray(params["params"]["bias"], np.float32)
        xf = np.asarray(x, np.float32)
        wscale = np.maximum(np.abs(kernel).max(axis=0), 1e-8) / 127.0
        # np.round and jnp.round both round half to even.
        w8 = np.round(kernel / wscale).astype(np.int8)
        ascale = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-8) / 127.0
        a8 = np.round(xf / ascale).astype(np.int8)
        acc = a8.astype(np.int32) @ w8.astype(np.int32)
        ref = acc.astype(np.float32) * (ascale * wscale) + bias
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_quantization_error_bounded(self):
        x, _, out_dim = _toy_inputs(seed=5, rows=64, in_dim=96, out_dim=64)
        params = nn.Dense(out_dim).init(jax.random.PRNGKey(9), x)
        ref = np.asarray(nn.Dense(out_dim).apply(params, x))
        out = np.asarray(QuantDense(out_dim, dtype=jnp.float32).apply(params, x))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-12)
        # Two int8 roundings over a K=96 reduction: ~1-2% worst case.
        assert rel < 0.05

    def test_zero_input_is_exact_zero_plus_bias(self):
        out_dim = 8
        x = jnp.zeros((4, 12), jnp.float32)
        params = QuantDense(out_dim).init(jax.random.PRNGKey(0), x)
        out = np.asarray(QuantDense(out_dim, dtype=jnp.float32).apply(params, x))
        np.testing.assert_array_equal(
            out, np.broadcast_to(np.asarray(params["params"]["bias"]), out.shape)
        )


class TestEncoderIntegration:
    def test_tiny_encoder_int8_close_to_f32(self):
        from ser_tpu.models import whisper as whisper_model

        cfg = whisper_model.WhisperConfig.tiny()
        params = whisper_model.init_whisper_encoder_params(cfg, seed=0)
        mel = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (1, whisper_model.CHUNK_FRAMES, cfg.n_mels)
            )
            * 0.3,
            jnp.float32,
        )
        f32 = whisper_model.WhisperEncoder(cfg).apply({"params": params}, mel)
        q = whisper_model.WhisperEncoder(cfg, quant_int8=True).apply(
            {"params": params}, mel
        )
        a, b = np.ravel(np.asarray(f32)), np.ravel(np.asarray(q))
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.995, cos

    def test_backend_int8_dtype_end_to_end(self, tmp_path, monkeypatch):
        from ser_tpu._internal.repr.whisper_backend import WhisperEncoderBackend

        monkeypatch.setenv("SER_ALLOW_RANDOM_INIT", "1")
        backend = WhisperEncoderBackend(
            model_id="openai/whisper-tiny", cache_root=tmp_path, dtype="int8"
        )
        audio = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
        encoded = backend.encode_sequence(audio, 16000)
        assert np.all(np.isfinite(encoded.embeddings))
        assert encoded.embeddings.shape[1] == backend.feature_dim


class TestRuntimePolicy:
    def test_int8_accepted_for_whisper_backend(self):
        from ser_tpu._internal.config.schema import TorchRuntimeConfig
        from ser_tpu._internal.repr.runtime_policy import resolve_feature_runtime

        resolved = resolve_feature_runtime(
            "jax_whisper_encoder",
            torch_runtime=TorchRuntimeConfig(device="cpu", dtype="int8"),
        )
        assert resolved.dtype == "int8"

    @pytest.mark.parametrize("backend_id", ["handcrafted", "jax_xlsr", "emotion2vec"])
    def test_int8_degrades_on_backends_without_quant_path(self, backend_id):
        from ser_tpu._internal.config.schema import TorchRuntimeConfig
        from ser_tpu._internal.repr.runtime_policy import resolve_feature_runtime

        resolved = resolve_feature_runtime(
            backend_id, torch_runtime=TorchRuntimeConfig(device="cpu", dtype="int8")
        )
        # On CPU everything degrades to the backend's first supported dtype.
        assert resolved.dtype == "float32"
