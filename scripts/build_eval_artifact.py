#!/usr/bin/env python
"""Builds the committed accuracy artifact (EVAL_r{N}.json).

Driver-visible accuracy evidence: generates a deterministic synthetic RAVDESS
corpus, evaluates the fast profile's clip-level UAR/macro-F1 through the real
feature path, runs the quality gate's fast-vs-candidate comparison through a
REAL encoder (tiny config, deterministic random init — zero-egress runtime),
and records everything with the active ``QualityGateConfig`` thresholds
(reference ``config/schema.py:577-584``).

Usage: python scripts/build_eval_artifact.py [--round N] [--candidate medium]
       [--actors 4] [--repetitions 3] [--output EVAL_rN.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time
from pathlib import Path


def _fast_profile_eval(settings, emotion_map) -> dict:
    """Clip-level fast-profile eval: infer → dominant label vs filename label."""
    from ser_tpu import api
    from ser_tpu._internal.data import loader
    from ser_tpu._internal.train.metrics import compute_ser_metrics

    y_true, y_pred = [], []
    started = time.perf_counter()
    for path in loader.discover_dataset_files(settings):
        code = loader.extract_ravdess_emotion_code(Path(path).name)
        label = emotion_map.get(code or "")
        if not label:
            continue
        execution = api.infer(path, profile="fast", include_transcript=False, settings=settings)
        segments = execution.emotions
        if not segments:
            continue
        dominant = max(segments, key=lambda s: s.end_seconds - s.start_seconds).emotion
        y_true.append(label)
        y_pred.append(dominant.lower())
    elapsed = time.perf_counter() - started
    metrics = compute_ser_metrics(y_true=y_true, y_pred=y_pred)
    return {
        "profile": "fast",
        "clips": len(y_true),
        "uar": round(metrics["uar"], 4),
        "macro_f1": round(metrics["macro_f1"], 4),
        "wall_seconds": round(elapsed, 1),
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--round", type=int, default=3)
    parser.add_argument("--candidate", default="medium")
    parser.add_argument("--actors", type=int, default=4)
    parser.add_argument("--repetitions", type=int, default=3)
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    repo_root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo_root / "scripts"))
    from build_synthetic_ravdess_dataset import build_dataset

    from ser_tpu._internal.config.bootstrap import reload_settings
    from ser_tpu._internal.runtime.quality_gate_workflow import evaluate_candidate_gate

    workdir = Path(tempfile.mkdtemp(prefix="ser_eval_"))
    dataset_root = workdir / "ravdess"
    files = build_dataset(dataset_root, actors=args.actors, repetitions=args.repetitions)

    # Tiny deterministic-random encoders: accuracy through the REAL encode
    # path without staged checkpoints. The fast profile needs no weights.
    os.environ["SER_ALLOW_RANDOM_INIT"] = "1"
    os.environ["SER_DATASET_FOLDER"] = str(dataset_root)
    os.environ["SER_MODELS_FOLDER"] = str(workdir / "models")
    os.environ["SER_TMP_FOLDER"] = str(workdir / "tmp")
    settings = reload_settings()

    # Fit + stage a fast-profile artifact so api.infer works end to end.
    from ser_tpu._internal.api.runtime import train as run_training

    run_training(profile="fast", settings=settings)
    fast_eval = _fast_profile_eval(settings, dict(settings.emotions))

    gate_decision = evaluate_candidate_gate(
        settings=settings, candidate=args.candidate, folds=3
    )

    payload = {
        "round": args.round,
        "generated_at_unix": time.time(),
        "corpus": {
            "kind": "synthetic-ravdess",
            "actors": args.actors,
            "repetitions": args.repetitions,
            "clips": len(files),
            "note": (
                "Deterministic sine-harmonic clips with per-emotion fundamentals; "
                "encoder profiles use tiny deterministic-random weights "
                "(zero-egress runtime), so encoder-profile numbers measure the "
                "PIPELINE (real encode -> window -> pool -> head -> fold eval), "
                "not pretrained-representation quality."
            ),
        },
        "fast_profile": fast_eval,
        "quality_gate": {
            "baseline": dataclasses.asdict(gate_decision.baseline),
            "candidate": dataclasses.asdict(gate_decision.candidate),
            "candidate_stability": (
                dataclasses.asdict(gate_decision.candidate_stability)
                if gate_decision.candidate_stability
                else None
            ),
            "promote": gate_decision.promote,
            "reasons": list(gate_decision.reasons),
            "thresholds": dataclasses.asdict(settings.quality_gate),
        },
    }
    output = Path(args.output) if args.output else repo_root / f"EVAL_r{args.round:02d}.json"
    output.write_text(json.dumps(payload, indent=2), encoding="utf-8")
    print(f"wrote {output}")
    print(
        f"fast: UAR {fast_eval['uar']:.3f} macro-F1 {fast_eval['macro_f1']:.3f} "
        f"over {fast_eval['clips']} clips; gate[{args.candidate}]: "
        f"{'PROMOTE' if gate_decision.promote else 'HOLD'} "
        f"(baseline UAR {gate_decision.baseline.uar:.3f}, "
        f"candidate UAR {gate_decision.candidate.uar:.3f})"
    )
    return 0


if __name__ == "__main__":
    from ser_tpu._internal.utils.jax_runtime import honor_platform_env

    honor_platform_env()
    raise SystemExit(main())
