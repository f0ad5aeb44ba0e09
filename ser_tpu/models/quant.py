"""W8A8 quantized projection for MXU-bound encoder matmuls.

The v5e MXU doubles its peak for int8 (394 vs 197 TF/s), and the accurate
encoder's projection-matmul stream is its largest cost component
(~105 of 187 ms per 240 s batch, ENCODER_BUDGET_r03.json) already running at
~90% of the bf16 peak — so int8 is the one remaining large encode lever.
Measured at encoder shapes (INT8_MATMUL_r03.json): the full W8A8 chain —
per-channel weight scales, dynamic per-token activation quantization, f32
dequant epilogue — runs 1.42x faster than bf16 (252 vs 177 TF/s effective).

Numerics contract: symmetric int8 with per-output-channel weight scales and
per-token activation scales keeps encoder embeddings cosine ~0.999 to the
bf16 path on random-init models (pinned in
``tests/suites/unit/models/test_quant_dense.py``); it is an OPT-IN runtime
dtype (``dtype: int8`` on the whisper lane), never a default.

No reference counterpart: the reference (jsugg/ser) runs torch fp16/fp32 on
MPS/CUDA; int8 inference is a TPU-native addition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["QuantDense"]


def _int8_dot(a8: jax.Array, w8: jax.Array) -> jax.Array:
    """(…, K) int8 × (K, N) int8 → (…, N) int32 on the MXU's int8 path."""
    return jax.lax.dot_general(
        a8, w8, (((a8.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with W8A8 int8 matmul.

    Parameter layout (names, shapes, initializers) is IDENTICAL to
    ``nn.Dense`` — checkpoints, converters, and init trees are shared with
    the bf16 path; quantization happens on the fly inside the jitted program
    (per call: one extra read of the weight stream — ~2 ms per 240 s batch
    at large-v3 dims, against ~30 ms saved on the matmuls).

    Scheme: symmetric int8. Weights get one scale per output channel
    (column abs-max / 127); activations get one scale per token (row
    abs-max / 127, computed dynamically). The int32 accumulator is
    dequantized in f32 and the bias is added in f32 before casting to
    ``dtype``.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        wf = kernel.astype(jnp.float32)
        wscale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
        w8 = jnp.round(wf / wscale).astype(jnp.int8)

        xf = x.astype(jnp.float32)
        ascale = (
            jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        )
        a8 = jnp.round(xf / ascale).astype(jnp.int8)

        out = _int8_dot(a8, w8).astype(jnp.float32) * (ascale * wscale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            out = out + bias.astype(jnp.float32)
        return out.astype(self.dtype)
