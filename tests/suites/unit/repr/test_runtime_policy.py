"""Per-owner tests for ``_internal/repr/runtime_policy.py`` device/dtype resolution.

Parity surface: reference ``ser/_internal/repr/runtime_policy.py:31-60`` —
"auto" resolves to the accelerator when present, dtype clamps to what each
backend supports. The CPU-forced test env makes "tpu absent" the live branch;
the tpu-present branch is covered by feeding explicit requests.
"""

from ser_tpu._internal.config.schema import (
    FeatureRuntimeBackendOverride,
    FeatureRuntimePolicyConfig,
    TorchRuntimeConfig,
)
from ser_tpu._internal.repr.runtime_policy import resolve_feature_runtime


def test_auto_resolves_to_cpu_when_no_accelerator():
    resolved = resolve_feature_runtime("jax_whisper_encoder")
    assert resolved.device_kind == "cpu"
    # bf16 auto-default downgrades to f32 on CPU.
    assert resolved.dtype == "float32"
    assert resolved.jax_device.platform == "cpu"


def test_handcrafted_clamps_to_float32_whatever_is_requested():
    resolved = resolve_feature_runtime(
        "handcrafted", torch_runtime=TorchRuntimeConfig(device="auto", dtype="bfloat16")
    )
    assert resolved.dtype == "float32"


def test_fp16_requests_clamp_to_bfloat16_class_dtypes():
    # TPU has no fast fp16 path; fp16 requests map onto the bf16 lane, which
    # the supported-dtype table then clamps per backend.
    resolved = resolve_feature_runtime(
        "jax_xlsr", torch_runtime=TorchRuntimeConfig(device="cpu", dtype="float16")
    )
    assert resolved.dtype == "bfloat16"
    clamped = resolve_feature_runtime(
        "handcrafted", torch_runtime=TorchRuntimeConfig(device="cpu", dtype="float16")
    )
    assert clamped.dtype == "float32"


def test_cuda_style_device_names_map_to_accelerator_lane():
    # Reference configs say device="cuda"; on this host no TPU exists so the
    # accelerator lane degrades to CPU, but the request is not an error.
    resolved = resolve_feature_runtime(
        "jax_whisper_encoder",
        torch_runtime=TorchRuntimeConfig(device="cuda", dtype="bfloat16"),
    )
    assert resolved.device_kind == "cpu"
    assert resolved.dtype == "bfloat16"


def test_policy_override_beats_global_runtime():
    policy = FeatureRuntimePolicyConfig(
        backend_overrides=(
            ("jax_xlsr", FeatureRuntimeBackendOverride(device="cpu", dtype="float32")),
        )
    )
    resolved = resolve_feature_runtime(
        "jax_xlsr",
        torch_runtime=TorchRuntimeConfig(device="auto", dtype="bfloat16"),
        policy=policy,
    )
    assert resolved.device_kind == "cpu"
    assert resolved.dtype == "float32"
    # Backends without an override keep the global request.
    other = resolve_feature_runtime(
        "emotion2vec",
        torch_runtime=TorchRuntimeConfig(device="cpu", dtype="bfloat16"),
        policy=policy,
    )
    assert other.dtype == "bfloat16"


def test_unknown_backend_gets_permissive_dtype_set():
    resolved = resolve_feature_runtime(
        "mystery", torch_runtime=TorchRuntimeConfig(device="cpu", dtype="bfloat16")
    )
    assert resolved.dtype == "bfloat16"
    assert resolved.backend_id == "mystery"


def test_xlsr_auto_dtype_is_bf16_class():
    """Medium lane rides the MXU bf16 path by default (whisper-lane parity);
    on this CPU-forced host the bf16 auto-default visibly downgrades to f32,
    proving the request was bf16-class."""
    resolved = resolve_feature_runtime("jax_xlsr")
    assert resolved.device_kind == "cpu"
    assert resolved.dtype == "float32"  # bf16 request clamped by CPU
    from ser_tpu._internal.repr.runtime_policy import _DEFAULT_AUTO_DTYPE

    assert _DEFAULT_AUTO_DTYPE["jax_xlsr"] == "bfloat16"
