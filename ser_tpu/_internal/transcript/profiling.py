"""Transcription profiling: WER, latency percentiles, runtime calibration.

Parity surface: reference ``ser/_internal/transcript/profiling.py:82-301`` +
``transcription/runtime_calibration_workflow.py`` — WER against canonical
RAVDESS sentences, latency percentiles per candidate (backend, model), and a
persisted recommendation with confidence consumed by admission control and the
``--calibrate-transcription-runtime`` CLI flag.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.domain import TranscriptWord

logger = get_logger(__name__)

#: The two canonical RAVDESS statements (every clip speaks one of these).
RAVDESS_CANONICAL_SENTENCES: tuple[str, ...] = (
    "kids are talking by the door",
    "dogs are sitting by the door",
)


def _normalize_words(text: str) -> list[str]:
    """Lowercase tokens with punctuation as SEPARATORS, not deletions.

    Reference ``transcription/text_metrics.py:12-17``: any non-[a-z0-9 ] run
    becomes a space, so "door's" tokenizes as ("door", "s") — in-place
    stripping ("doors") would count different edit operations and shift WER.
    """
    import re

    normalized = re.sub(r"[^a-z0-9 ]+", " ", text.strip().lower())
    return [token for token in normalized.split() if token]


def nearest_rank_percentile(values: list[float], fraction: float) -> float:
    """Nearest-rank percentile (reference ``text_metrics.py:57-62``).

    Empty samples report 1.0 (pessimistic), matching the reference.
    """
    if not values:
        return 1.0
    import math

    rank = max(0, math.ceil(fraction * len(values)) - 1)
    return sorted(values)[rank]


def word_error_rate(reference: str, hypothesis: str) -> float:
    """Levenshtein WER over normalized lowercase alphanumeric words."""
    ref = _normalize_words(reference)
    hyp = _normalize_words(hypothesis)
    if not ref:
        return 0.0 if not hyp else 1.0
    # Dynamic program over (len(ref)+1) x (len(hyp)+1).
    previous = list(range(len(hyp) + 1))
    for i, ref_word in enumerate(ref, start=1):
        current = [i] + [0] * len(hyp)
        for j, hyp_word in enumerate(hyp, start=1):
            substitution = previous[j - 1] + (ref_word != hyp_word)
            current[j] = min(previous[j] + 1, current[j - 1] + 1, substitution)
        previous = current
    return previous[-1] / len(ref)


@dataclass(frozen=True)
class TranscriptionCandidateReport:
    """Accuracy + latency profile for one (backend, model) candidate."""

    backend_id: str
    model_name: str
    mean_wer: float
    p50_latency_seconds: float
    p95_latency_seconds: float
    samples: int


@dataclass(frozen=True)
class CalibrationRecommendation:
    """Persisted default-model recommendation with confidence."""

    backend_id: str
    model_name: str
    confidence: str  # "high" | "medium" | "low"
    mean_wer: float
    p50_latency_seconds: float
    generated_at_unix: float

    def to_dict(self) -> dict:
        import dataclasses

        return dataclasses.asdict(self)


def profile_transcription_candidate(
    transcribe: Callable[[str], list[TranscriptWord]],
    samples: list[tuple[str, str]],  # (audio_path, reference_text)
    *,
    backend_id: str,
    model_name: str,
) -> TranscriptionCandidateReport:
    """Measures WER + latency for one candidate over labeled samples.

    The first transcribe on a fresh backend lazily loads weights and pays
    XLA compilation (minutes over a remote-compile tunnel) — an UNTIMED
    warmup call runs first so p50/p95 measure steady-state latency, not the
    one-time setup the persisted recommendation would otherwise mistake for
    model speed.
    """
    if not samples:
        raise ValueError("Need at least one labeled sample to profile.")
    transcribe(samples[0][0])  # warmup: load + compile outside the timers
    wers, latencies = [], []
    for audio_path, reference in samples:
        start = time.perf_counter()
        words = transcribe(audio_path)
        latencies.append(time.perf_counter() - start)
        hypothesis = " ".join(word.word for word in words)
        wers.append(word_error_rate(reference, hypothesis))
    return TranscriptionCandidateReport(
        backend_id=backend_id,
        model_name=model_name,
        mean_wer=float(np.mean(wers)),
        # Nearest-rank, not interpolated (reference text_metrics.py:57-62).
        p50_latency_seconds=nearest_rank_percentile(latencies, 0.50),
        p95_latency_seconds=nearest_rank_percentile(latencies, 0.95),
        samples=len(samples),
    )


def recommend_default(
    reports: list[TranscriptionCandidateReport],
    *,
    max_acceptable_wer: float = 0.30,
) -> CalibrationRecommendation:
    """Picks the fastest candidate whose WER clears the accuracy gate.

    Confidence: high when the winner clears the gate with >=3 samples, medium
    when samples are scarce, low when no candidate clears the gate (fallback
    to lowest-WER candidate).
    """
    if not reports:
        raise ValueError("No candidate reports to recommend from.")
    acceptable = [r for r in reports if r.mean_wer <= max_acceptable_wer]
    if acceptable:
        winner = min(acceptable, key=lambda r: r.p50_latency_seconds)
        confidence = "high" if winner.samples >= 3 else "medium"
    else:
        winner = min(reports, key=lambda r: r.mean_wer)
        confidence = "low"
    return CalibrationRecommendation(
        backend_id=winner.backend_id,
        model_name=winner.model_name,
        confidence=confidence,
        mean_wer=winner.mean_wer,
        p50_latency_seconds=winner.p50_latency_seconds,
        generated_at_unix=time.time(),
    )


def save_calibration_report(
    recommendation: CalibrationRecommendation,
    reports: list[TranscriptionCandidateReport],
    path: str | Path,
) -> str:
    """Persists the calibration outcome (consumed by admission control)."""
    target = Path(path)
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(
        json.dumps(
            {
                "recommendation": recommendation.to_dict(),
                "candidates": [vars(r) for r in reports],
            },
            indent=2,
        ),
        encoding="utf-8",
    )
    return str(target)


def load_calibration_report(path: str | Path) -> CalibrationRecommendation | None:
    """Loads a persisted recommendation; None when missing/corrupt."""
    target = Path(path)
    if not target.exists():
        return None
    try:
        raw = json.loads(target.read_text(encoding="utf-8"))["recommendation"]
        report = CalibrationRecommendation(**raw)
        # Value validation: a hand-edited or version-skewed report must read
        # as no-report, not crash the admission gate downstream.
        if report.confidence not in ("high", "medium", "low"):
            raise TypeError(f"invalid confidence {report.confidence!r}")
        float(report.generated_at_unix)
        float(report.mean_wer)
        return report
    except (OSError, KeyError, TypeError, ValueError, json.JSONDecodeError) as err:
        logger.warning("Unreadable calibration report %s: %s", path, err)
        return None


def default_calibration_report_path(tmp_folder) -> "Path":
    """The writer's default report location (shared with admission)."""
    return Path(tmp_folder) / "transcription_calibration.json"


__all__ = [
    "CalibrationRecommendation",
    "RAVDESS_CANONICAL_SENTENCES",
    "TranscriptionCandidateReport",
    "load_calibration_report",
    "profile_transcription_candidate",
    "recommend_default",
    "save_calibration_report",
    "word_error_rate",
]
