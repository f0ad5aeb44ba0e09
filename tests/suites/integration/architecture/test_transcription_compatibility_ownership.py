"""Architecture contract: transcription compatibility boundary ownership.

Parity surface: reference ``tests/suites/integration/architecture/
test_transcription_compatibility_ownership.py`` — the reference pins its
MPS/torio compatibility shims to named owner modules so refactors cannot
silently move device-compat behavior. The TPU rebuild's equivalent
compatibility surface is HBM admission, runtime calibration, process
isolation, and the feature-runtime device/dtype policy; each symbol below is
the single owner of one compatibility decision.
"""

from __future__ import annotations

import importlib

_COMPATIBILITY_BOUNDARY_SYMBOLS: tuple[tuple[str, tuple[str, ...]], ...] = (
    (
        "ser_tpu._internal.transcript.hbm_admission",
        (
            "AdmissionDecision",
            "estimate_model_footprint_mb",
            "device_free_memory_mb",
            "calibration_admission_override",
            "admit_transcription_model",
        ),
    ),
    (
        "ser_tpu._internal.transcript.calibration",
        (
            "profile_candidate_matrix",
            "derive_accuracy_gate",
            "recommend_default_candidate",
            "run_runtime_calibration_probes",
            "derive_runtime_recommendation",
            "is_hard_tpu_oom",
            "build_calibration_report",
        ),
    ),
    (
        "ser_tpu._internal.transcript.process_isolation",
        (
            "should_use_process_isolated_path",
            "run_isolated_transcription",
        ),
    ),
    (
        "ser_tpu._internal.repr.runtime_policy",
        (
            "ResolvedFeatureRuntime",
            "resolve_feature_runtime",
        ),
    ),
    (
        "ser_tpu._internal.runtime.oom",
        (
            "DeviceOomInfo",
            "is_device_oom",
            "parse_device_oom",
        ),
    ),
)


def test_compatibility_boundary_symbols_are_unique_and_non_empty() -> None:
    """The ownership inventory stays non-overlapping and non-trivial."""
    assert _COMPATIBILITY_BOUNDARY_SYMBOLS
    owned = [
        (module, symbol)
        for module, symbols in _COMPATIBILITY_BOUNDARY_SYMBOLS
        for symbol in symbols
    ]
    assert len(owned) == len(set(owned))


def test_compatibility_boundary_symbols_exist() -> None:
    """Every owned symbol resolves in its declared owner module."""
    for module_name, symbols in _COMPATIBILITY_BOUNDARY_SYMBOLS:
        module = importlib.import_module(module_name)
        for symbol in symbols:
            target = module
            for part in symbol.split("."):
                assert hasattr(target, part), (
                    f"Missing compatibility boundary symbol {module_name}.{symbol}"
                )
                target = getattr(target, part)
