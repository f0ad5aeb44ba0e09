#!/usr/bin/env python
"""Full-dataset quality gate: fast vs candidate profile rollout decision.

Parity surface: reference ``scripts/run_full_dataset_quality_gate.sh`` +
``ser/_internal/runtime/quality_gate_cli.py`` — trains/evaluates the fast head
and a candidate profile's head on the configured corpus with speaker-grouped
folds, measures the candidate's temporal stability, and emits a promote/hold
decision JSON.

Usage: python scripts/run_quality_gate.py --candidate medium [--output gate.json]
Env: SER_DATASET_FOLDER (labeled corpus), SER_ALLOW_RANDOM_INIT=1 for
weightless environments.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--candidate", choices=("medium", "accurate", "accurate-research"),
                        default="medium")
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--folds", type=int, default=4)
    args = parser.parse_args()

    from ser_tpu._internal.config.bootstrap import reload_settings
    from ser_tpu._internal.data import loader
    from ser_tpu._internal.pool import mean_std_pool, temporal_pooling_windows
    from ser_tpu._internal.repr.encoders import build_encoder_backend
    from ser_tpu._internal.runtime.quality_gate import (
        decide_quality_gate,
        evaluate_head_cross_folds,
        temporal_stability_of,
    )
    from ser_tpu._internal.utils.audio_io import read_audio_file

    settings = reload_settings()
    clips = loader.load_labeled_clips(settings=settings)
    if len(clips) < 8:
        print("Quality gate needs a labeled corpus (SER_DATASET_FOLDER).", file=sys.stderr)
        return 2
    labels = [clip.label for clip in clips]
    speakers = [clip.speaker_id or clip.file_path for clip in clips]

    fast_features = np.asarray([clip.features for clip in clips], dtype=np.float64)
    baseline = evaluate_head_cross_folds(
        fast_features, labels, speakers, profile="fast", settings=settings, n_folds=args.folds
    )

    backend = build_encoder_backend(args.candidate, settings=settings)
    runtime = settings.profile_runtime(args.candidate)
    decoded = [
        read_audio_file(clip.file_path, audio_read_config=settings.audio_read)
        for clip in clips
    ]
    encode_many = getattr(backend, "encode_sequences", None)
    encoded = (
        encode_many(decoded)
        if callable(encode_many)
        else [backend.encode_sequence(a, sr) for a, sr in decoded]
    )
    candidate_rows = []
    for sequence in encoded:
        windows = temporal_pooling_windows(
            sequence,
            window_size_seconds=runtime.pool_window_size_seconds,
            window_stride_seconds=runtime.pool_window_stride_seconds,
        )
        candidate_rows.append(mean_std_pool(sequence, windows).mean(axis=0))
    candidate_features = np.asarray(candidate_rows, dtype=np.float64)
    candidate = evaluate_head_cross_folds(
        candidate_features, labels, speakers,
        profile=args.candidate, settings=settings, n_folds=args.folds,
    )

    # Temporal stability from the candidate's actual segment output on a
    # sample of clips (requires a trained artifact; skipped when absent).
    stability = None
    try:
        from ser_tpu._internal.models.emotion_model import predict_emotions_detailed  # noqa: F401
        from ser_tpu._internal.runtime.backend_hooks import build_backend_hooks
        from ser_tpu.runtime.contracts import InferenceRequest

        hooks = build_backend_hooks(settings)
        from ser_tpu.profiles import get_profile_catalog

        backend_id = get_profile_catalog()[args.candidate].backend_id
        if backend_id in hooks:
            segment_lists = []
            for clip in clips[:6]:
                result = hooks[backend_id](
                    InferenceRequest(file_path=clip.file_path, language="en")
                )
                segment_lists.append(result.segments)
            stability = temporal_stability_of(segment_lists)
    except Exception as err:  # noqa: BLE001 - stability is optional evidence
        print(f"note: temporal stability unavailable ({err})", file=sys.stderr)

    decision = decide_quality_gate(
        baseline=baseline,
        candidate=candidate,
        candidate_stability=stability,
        config=settings.quality_gate,
    )
    payload = decision.to_json()
    if args.output:
        args.output.write_text(payload, encoding="utf-8")
    print(payload)
    return 0 if decision.promote else 1


if __name__ == "__main__":
    sys.exit(main())
