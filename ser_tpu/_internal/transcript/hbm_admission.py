"""HBM memory admission control for transcription model loads.

Parity surface: reference ``ser/_internal/transcript/mps_admission.py:50-441``
— before loading a transcription model, estimate its device-memory footprint,
compare against free memory with headroom + safety margins, and honor
calibration-report overrides. The reference targets Apple MPS; here the
accounted device is the TPU's HBM (via ``jax.local_devices()[0].memory_stats``)
with the same decision shape.
"""

from __future__ import annotations

from dataclasses import dataclass

from ser_tpu._internal.config.schema import TranscriptionConfig
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

#: Rough parameter counts (millions) per Whisper model name for footprint
#: estimation (weights + activations + decode buffers, bf16).
_MODEL_PARAMS_M: dict[str, float] = {
    "tiny": 39,
    "base": 74,
    "small": 244,
    "medium": 769,
    "large": 1550,
    "large-v2": 1550,
    "large-v3": 1550,
    "turbo": 809,
    "distil-large-v3": 756,
}


@dataclass(frozen=True)
class AdmissionDecision:
    """Outcome of one admission check."""

    admitted: bool
    reason: str
    estimated_footprint_mb: float
    free_memory_mb: float | None


def estimate_model_footprint_mb(model_name: str) -> float:
    """Estimated HBM footprint in MB for one transcription model.

    English-only variants ("small.en") and org-prefixed ids
    ("openai/whisper-small") normalize to their base size; a truly unknown
    name falls back to the large estimate (conservative: deny before OOM).
    """
    name = model_name.lower().strip()
    name = name.rsplit("/", 1)[-1].removeprefix("whisper-")
    name = name.removesuffix(".en")
    params_m = _MODEL_PARAMS_M.get(name, 1550.0)
    # bf16 weights + ~1.5x activations/workspace during decode.
    return params_m * 2.0 * 2.5


def device_free_memory_mb() -> float | None:
    """Free HBM on the first accelerator device; None when unavailable."""
    try:
        import jax

        device = jax.local_devices()[0]
        stats = device.memory_stats()
        if not stats:
            return None
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit is None:
            return None
        return (limit - in_use) / (1024 * 1024)
    except Exception:  # pragma: no cover - CPU-only or stats unsupported
        return None


def calibration_admission_override(
    model_name: str,
    config: TranscriptionConfig,
    *,
    default_report_path=None,
) -> str | None:
    """Admit reason from a fresh calibration report proving the model runs.

    Reference ``mps_admission.py`` honors calibration-report overrides
    (overrides owner at reference ``transcript/mps_admission.py:329``): a
    recent, sufficiently confident recommendation for this exact model is
    direct evidence it loads and runs on this device, relaxing the
    footprint-estimate margins. When no explicit report path is configured,
    the calibration CLI's default output location
    (``default_calibration_report_path``) is consulted — otherwise the
    report the CLI just wrote would never be read.
    """
    if not config.calibration_overrides_enabled:
        return None
    report_path = config.calibration_report_path or default_report_path
    if report_path is None:
        return None
    import time

    from ser_tpu._internal.transcript.profiling import load_calibration_report

    report = load_calibration_report(report_path)
    if report is None or report.model_name != model_name:
        return None
    age_hours = (time.time() - report.generated_at_unix) / 3600.0
    if age_hours > config.calibration_report_max_age_hours:
        return None
    rank = {"low": 0, "medium": 1, "high": 2}
    if rank[report.confidence] < rank.get(config.calibration_min_confidence, 2):
        return None
    return (
        f"calibration report confirms {model_name!r} runs here "
        f"(confidence={report.confidence}, wer={report.mean_wer:.3f})"
    )


def admit_transcription_model(
    model_name: str,
    *,
    config: TranscriptionConfig,
    default_report_path=None,
) -> AdmissionDecision:
    """Decides whether loading ``model_name`` fits in device memory.

    A valid calibration override is evidence the model runs on THIS device,
    so it waives the headroom + safety MARGINS — but never the live
    free-memory check: calibration ran without the emotion encoder
    resident, and admitting into HBM that is already occupied would cause
    exactly the OOM this gate exists to prevent.
    """
    footprint = estimate_model_footprint_mb(model_name)
    if not config.hbm_admission_control_enabled:
        return AdmissionDecision(True, "admission control disabled", footprint, None)
    override = calibration_admission_override(
        model_name, config, default_report_path=default_report_path
    )
    free = device_free_memory_mb()
    if free is None:
        reason = override or "device memory stats unavailable; admitting"
        return AdmissionDecision(True, reason, footprint, None)
    margins = 0.0 if override else (
        config.hbm_admission_min_headroom_mb + config.hbm_admission_safety_margin_mb
    )
    required = footprint + margins
    if free >= required:
        reason = (
            f"{override}; {free:.0f} MB free >= {required:.0f} MB footprint"
            if override
            else f"{free:.0f} MB free >= {required:.0f} MB required"
        )
        return AdmissionDecision(True, reason, footprint, free)
    return AdmissionDecision(
        False,
        f"{free:.0f} MB free < {required:.0f} MB required for {model_name!r}; "
        "choose a smaller transcription model or free device memory.",
        footprint,
        free,
    )


__all__ = [
    "AdmissionDecision",
    "admit_transcription_model",
    "calibration_admission_override",
    "device_free_memory_mb",
    "estimate_model_footprint_mb",
]
