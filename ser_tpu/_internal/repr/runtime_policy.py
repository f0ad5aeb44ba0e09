"""Backend-capability-aware JAX device/dtype resolution.

Parity surface: reference ``ser/_internal/repr/runtime_policy.py:31-60`` — the
handcrafted backend stays on CPU-compatible float32 while transformer backends
resolve "auto" to the accelerator and clamp dtype to what the backend supports.
TPU semantics: "auto" device prefers TPU when present; "auto" dtype resolves to
bfloat16 for transformer encoders on TPU and float32 elsewhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from ser_tpu._internal.config.schema import (
    FeatureRuntimePolicyConfig,
    TorchRuntimeConfig,
)

_SUPPORTED_DTYPES: dict[str, tuple[str, ...]] = {
    "handcrafted": ("float32",),
    "jax_xlsr": ("float32", "bfloat16"),
    # "int8" = W8A8 projection matmuls on the int8 MXU path (opt-in; the
    # residual stream and attention stay bf16 — models/quant.py).
    "jax_whisper_encoder": ("float32", "bfloat16", "int8"),
    "emotion2vec": ("float32", "bfloat16"),
}
_DEFAULT_AUTO_DTYPE: dict[str, str] = {
    "handcrafted": "float32",
    # bf16 on the MXU like the other encoder lanes: XLS-R embeddings at bf16
    # are cosine >= 0.99997 to f32 (LN/softmax stay f32 inside the model);
    # the reference likewise passes reduced precision through on accelerators
    # (repr/runtime_policy.py:84-107 — its f32 clamp is an MPS-only guard).
    "jax_xlsr": "bfloat16",
    "jax_whisper_encoder": "bfloat16",
    "emotion2vec": "bfloat16",
}


@dataclass(frozen=True)
class ResolvedFeatureRuntime:
    """Final device/dtype selection for one backend."""

    backend_id: str
    device_kind: str  # "tpu" | "cpu"
    dtype: str  # "float32" | "bfloat16"

    @property
    def jax_device(self) -> jax.Device:
        """First device of the resolved kind (mesh-level placement is separate).

        ``jax.devices()`` lists only the DEFAULT backend's devices, so a
        "cpu" resolution on a TPU host must query the cpu backend explicitly
        — the old filter-then-fallback silently returned the accelerator,
        contradicting the resolution (and its float32 clamp).
        """
        if self.device_kind == "cpu":
            return jax.devices("cpu")[0]
        devices = [d for d in jax.devices() if _kind(d) == self.device_kind]
        return devices[0] if devices else jax.devices()[0]


def _kind(device: jax.Device) -> str:
    return "cpu" if device.platform == "cpu" else "tpu"


def _available_kinds() -> tuple[str, ...]:
    kinds = {_kind(d) for d in jax.devices()}
    return tuple(sorted(kinds))


def resolve_feature_runtime(
    backend_id: str,
    *,
    torch_runtime: TorchRuntimeConfig | None = None,
    policy: FeatureRuntimePolicyConfig | None = None,
) -> ResolvedFeatureRuntime:
    """Resolves device/dtype for one backend from config + override policy."""
    backend_id = backend_id.strip().lower()
    runtime = torch_runtime if torch_runtime is not None else TorchRuntimeConfig()
    override = policy.for_backend(backend_id) if policy is not None else None

    device_request = (override.device if override and override.device else runtime.device).lower()
    dtype_request = (override.dtype if override and override.dtype else runtime.dtype).lower()

    # "auto" on the handcrafted backend deliberately stays "auto": the DSP
    # program is small and latency-bound, but batches of frames still run on
    # the accelerator when one exists.
    kinds = _available_kinds()
    if device_request in ("auto", ""):
        device_kind = "tpu" if "tpu" in kinds else "cpu"
    elif device_request in ("tpu", "cuda", "gpu", "accelerator"):
        device_kind = "tpu" if "tpu" in kinds else "cpu"
    else:
        device_kind = "cpu"

    supported = _SUPPORTED_DTYPES.get(backend_id, ("float32", "bfloat16"))
    if dtype_request in ("auto", ""):
        dtype = _DEFAULT_AUTO_DTYPE.get(backend_id, "float32")
        if device_kind == "cpu" and dtype == "bfloat16":
            dtype = "float32"
    elif dtype_request in ("bfloat16", "bf16"):
        dtype = "bfloat16"
    elif dtype_request in ("float16", "fp16", "half"):
        # TPU has no fast fp16 path; clamp to bfloat16 (documented deviation).
        dtype = "bfloat16"
    elif dtype_request in ("int8", "w8a8"):
        # Opt-in quantized inference; clamped below for backends without a
        # quantized path.
        dtype = "int8"
    else:
        dtype = "float32"
    if dtype not in supported:
        # int8 requested on a backend without a quantized path degrades to the
        # fastest supported full-precision dtype, not all the way to f32.
        if dtype == "int8" and "bfloat16" in supported and device_kind != "cpu":
            dtype = "bfloat16"
        else:
            dtype = supported[0]

    return ResolvedFeatureRuntime(backend_id=backend_id, device_kind=device_kind, dtype=dtype)


__all__ = ["ResolvedFeatureRuntime", "resolve_feature_runtime"]
