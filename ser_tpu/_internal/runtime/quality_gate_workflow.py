"""Quality-gate workflow: evaluate, decide, persist, enforce.

Parity surface: reference ``quality_gate_cli.py`` + ``profile_quality_gate.py``
orchestration — one entry the CLI (``ser gate``) and
``scripts/run_quality_gate.py`` share: evaluate the fast baseline and a
candidate profile on the labeled corpus with speaker-grouped folds, measure
the candidate's temporal stability when an artifact exists, persist the
versioned report, and enforce the promote/hold verdict.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.runtime.quality_gate import (
    QualityGateDecision,
    decide_quality_gate,
    evaluate_head_cross_folds,
    temporal_stability_of,
)
from ser_tpu._internal.runtime.quality_gate_report import (
    QualityGateFailedError,
    build_report_payload,
    enforce_quality_gate,
    resolve_report_output_path,
    write_gate_report,
)
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)


def evaluate_candidate_gate(
    *, settings: AppConfig, candidate: str, folds: int = 4, stability_clips: int = 6
) -> QualityGateDecision:
    """Runs both profile evaluations and returns the gate decision."""
    from ser_tpu._internal.data import loader
    from ser_tpu._internal.pool import mean_std_pool, temporal_pooling_windows
    from ser_tpu._internal.repr.encoders import build_encoder_backend
    from ser_tpu._internal.utils.audio_io import read_audio_file

    clips = loader.load_labeled_clips(settings=settings)
    if len(clips) < 8:
        raise RuntimeError(
            "Quality gate needs a labeled corpus of at least 8 clips "
            "(SER_DATASET_FOLDER)."
        )
    labels = [clip.label for clip in clips]
    speakers = [clip.speaker_id or clip.file_path for clip in clips]

    fast_features = np.asarray([clip.features for clip in clips], dtype=np.float64)
    baseline = evaluate_head_cross_folds(
        fast_features, labels, speakers, profile="fast", settings=settings, n_folds=folds
    )

    backend = build_encoder_backend(candidate, settings=settings)
    runtime = settings.profile_runtime(candidate)  # type: ignore[arg-type]
    decoded = [
        read_audio_file(clip.file_path, audio_read_config=settings.audio_read)
        for clip in clips
    ]
    from ser_tpu._internal.repr.encode_util import encode_clips

    encoded = encode_clips(backend, decoded)
    candidate_rows = []
    for sequence in encoded:
        windows = temporal_pooling_windows(
            sequence,
            window_size_seconds=runtime.pool_window_size_seconds,
            window_stride_seconds=runtime.pool_window_stride_seconds,
        )
        candidate_rows.append(mean_std_pool(sequence, windows).mean(axis=0))
    candidate_eval = evaluate_head_cross_folds(
        np.asarray(candidate_rows, dtype=np.float64),
        labels,
        speakers,
        profile=candidate,
        settings=settings,
        n_folds=folds,
    )

    stability = None
    try:
        from ser_tpu._internal.runtime.backend_hooks import build_backend_hooks
        from ser_tpu.profiles import get_profile_catalog
        from ser_tpu.runtime.contracts import InferenceRequest

        hooks = build_backend_hooks(settings)
        backend_id = get_profile_catalog()[candidate].backend_id
        if backend_id in hooks:
            segment_lists = [
                hooks[backend_id](
                    InferenceRequest(file_path=clip.file_path, language="en")
                ).segments
                for clip in clips[:stability_clips]
            ]
            stability = temporal_stability_of(segment_lists)
    except Exception as err:  # noqa: BLE001 - stability is optional evidence
        logger.info("Temporal stability unavailable: %s", err)

    return decide_quality_gate(
        baseline=baseline,
        candidate=candidate_eval,
        candidate_stability=stability,
        config=settings.quality_gate,
    )


def run_quality_gate_workflow(
    *,
    settings: AppConfig,
    candidate: str,
    folds: int = 4,
    output_path: str | Path | None = None,
    require_pass: bool = False,
) -> int:
    """Full gate run with persisted report. Exit codes: 0 promote, 1 hold,
    2 unusable corpus/config."""
    try:
        decision = evaluate_candidate_gate(
            settings=settings, candidate=candidate, folds=folds
        )
    except RuntimeError as err:
        print(str(err), file=sys.stderr)
        return 2
    payload = build_report_payload(
        decision,
        corpus=str(settings.dataset.folder),
        candidate_profile=candidate,
    )
    target = resolve_report_output_path(
        output_path=output_path, default_directory=settings.models.folder
    )
    written = write_gate_report(payload, target)
    print(f"quality-gate report: {written}")
    for reason in decision.reasons:
        print(f"  - {reason}")
    print(f"verdict: {'PROMOTE' if decision.promote else 'HOLD'} {candidate}")
    try:
        enforce_quality_gate(decision, require_pass=require_pass)
    except QualityGateFailedError as err:
        print(str(err), file=sys.stderr)
        return 1
    return 0 if decision.promote else 1


__all__ = ["evaluate_candidate_gate", "run_quality_gate_workflow"]
