"""Training readiness: findings, quarantine budgets + ledger, prepared plans."""

import json
from pathlib import Path

import numpy as np
import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.models import training_readiness as tr
from ser_tpu._internal.utils.audio_io import write_wav


def _settings(tmp_path, **extra):
    env = {
        "SER_DATASET_FOLDER": str(tmp_path / "ds"),
        "SER_TMP_FOLDER": str(tmp_path / "tmp"),
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
    }
    env.update(extra)
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def _make_corpus(tmp_path, *, corrupt=0):
    ds = tmp_path / "ds"
    sr = 16000
    t = np.arange(int(1.2 * sr)) / sr
    for actor in (1, 2):
        actor_dir = ds / f"Actor_{actor:02d}"
        actor_dir.mkdir(parents=True, exist_ok=True)
        for code in ("01", "03", "05"):
            clip = (0.5 * np.sin(2 * np.pi * (100 + 50 * int(code)) * t)).astype(np.float32)
            write_wav(actor_dir / f"03-01-{code}-01-01-01-{actor:02d}.wav", clip, sr)
    for i in range(corrupt):
        (ds / "Actor_01" / f"03-01-08-01-01-0{i + 2}-01.wav").write_bytes(b"not audio")
    return ds


def test_clean_corpus_passes(tmp_path):
    _make_corpus(tmp_path)
    report = tr.run_training_readiness(settings=_settings(tmp_path), profile="fast")
    assert not report.blocking
    assert len(report.usable_files) == 6
    assert report.quarantined_files == ()


def test_corrupt_files_quarantined_with_ledger(tmp_path):
    _make_corpus(tmp_path, corrupt=2)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    assert len(report.quarantined_files) == 2
    ledger = tr.write_quarantine_ledger(report, settings=settings)
    assert ledger is not None and ledger.exists()
    records = [json.loads(line) for line in ledger.read_text().splitlines()]
    assert len(records) == 2
    assert all(record["scope"] == "media" for record in records)
    assert tr.quarantine_ledger_digest(settings, "fast") is not None


def test_quarantine_budget_blocks(tmp_path):
    _make_corpus(tmp_path, corrupt=2)
    settings = _settings(tmp_path, SER_DATA_LOADER_MAX_FAILED_FILES="1")
    report = tr.run_training_readiness(settings=settings, profile="fast")
    assert report.blocking
    assert any(f.reason == "quarantine_budget_absolute" for f in report.findings)


def test_prepared_plan_rejects_ledger_change(tmp_path):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    plan_dir = settings.tmp_folder / "prepared" / "fast"
    plan_path = tr.write_prepared_plan(
        settings=settings, profile="fast", report=report, plan_dir=plan_dir
    )
    # Loads cleanly with matching (absent) ledger.
    features, labels = tr.load_prepared_plan(plan_path, settings=settings, profile="fast")
    assert features.shape[0] == len(labels) == 6
    # A new quarantine ledger invalidates the plan.
    ledger_dir = settings.tmp_folder / "quarantine"
    ledger_dir.mkdir(parents=True, exist_ok=True)
    (ledger_dir / "fast.jsonl").write_text('{"file": "x"}\n', encoding="utf-8")
    with pytest.raises(tr.PreparedPlanError, match="quarantine-ledger"):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")


def test_missing_dataset_blocks(tmp_path):
    report = tr.run_training_readiness(settings=_settings(tmp_path), profile="fast")
    assert report.blocking
    assert any(f.reason == "dataset_folder_missing" for f in report.findings)
