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
    features, labels, groups = tr.load_prepared_plan(
        plan_path, settings=settings, profile="fast"
    )
    assert features.shape[0] == len(labels) == 6
    # Fast plans carry per-clip groups (speaker or stem) for resume splits.
    assert groups is not None and len(groups) == 6
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


# --------------------------------------------------------------------------- #
# Quarantine budget taxonomy (reference :207-292 semantics)
# --------------------------------------------------------------------------- #

from collections import Counter


def _policy(**over):
    base = dict(
        max_absolute=100,
        max_global_ratio=1.0,
        max_corpus_ratio=1.0,
        max_class_ratio=1.0,
        max_per_reason=100,
        min_remaining_per_class_split=0,
        strict=False,
    )
    base.update(over)
    return tr.QuarantinePolicy(**base)


def _records(spec):
    """spec: list of (corpus, label, quarantined?) -> (records, quarantined)."""
    records, quarantined = [], []
    for i, (corpus, label, bad) in enumerate(spec):
        record = tr.FileRecord(path=f"/d/{corpus}/{i}.wav", corpus=corpus, label=label)
        records.append(record)
        if bad:
            quarantined.append(record)
    return records, quarantined


def test_policy_validates_boundaries():
    with pytest.raises(ValueError, match="max_absolute"):
        _policy(max_absolute=-1)
    with pytest.raises(ValueError, match="max_corpus_ratio"):
        _policy(max_corpus_ratio=1.5)


def test_per_corpus_budget_blocks_biased_exclusion():
    spec = [("a", "happy", True)] * 3 + [("a", "happy", False)] * 2 + [
        ("b", "sad", False)
    ] * 20
    records, quarantined = _records(spec)
    reasons = Counter({"ValueError": 3})
    findings = tr._quarantine_budget_findings(
        records, quarantined, reasons, _policy(max_corpus_ratio=0.5)
    )
    assert any(f.reason == "quarantine_budget_per_corpus" for f in findings)
    # Corpus 'b' lost nothing; only 'a' trips.
    assert sum(f.reason == "quarantine_budget_per_corpus" for f in findings) == 1


def test_per_class_budget_blocks_biased_exclusion():
    spec = [("a", "angry", True)] * 4 + [("a", "angry", False)] + [
        ("a", "calm", False)
    ] * 10
    records, quarantined = _records(spec)
    findings = tr._quarantine_budget_findings(
        records, quarantined, Counter({"OSError": 4}), _policy(max_class_ratio=0.5)
    )
    assert any(f.reason == "quarantine_budget_per_class" for f in findings)


def test_min_remaining_per_class_blocks():
    spec = [("a", "angry", True), ("a", "angry", True), ("a", "angry", False)] + [
        ("a", "calm", False)
    ] * 5
    records, quarantined = _records(spec)
    findings = tr._quarantine_budget_findings(
        records,
        quarantined,
        Counter({"OSError": 2}),
        _policy(min_remaining_per_class_split=2),
    )
    assert any(f.reason == "quarantine_min_remaining" for f in findings)


def test_strict_mode_blocks_any_quarantine():
    records, quarantined = _records([("a", "happy", True), ("a", "sad", False)])
    findings = tr._quarantine_budget_findings(
        records, quarantined, Counter({"OSError": 1}), _policy(strict=True)
    )
    assert any(f.reason == "quarantine_strict" for f in findings)


def test_no_quarantine_yields_no_budget_findings():
    records, quarantined = _records([("a", "happy", False)] * 4)
    assert (
        tr._quarantine_budget_findings(records, quarantined, Counter(), _policy(strict=True))
        == []
    )


# --------------------------------------------------------------------------- #
# Backend smoke with hard deadline
# --------------------------------------------------------------------------- #


def test_backend_smoke_passes_on_fast_profile(tmp_path):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    findings = tr.run_backend_smoke(
        settings=settings, profile="fast", usable_files=report.usable_files
    )
    assert [f.reason for f in findings] == ["backend_smoke_ok"]


def test_backend_smoke_timeout_is_blocking(tmp_path, monkeypatch):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    monkeypatch.setenv("SER_TRAINING_SMOKE_TIMEOUT_SECONDS", "0.05")

    import time as _time

    def slow_read(*args, **kwargs):
        _time.sleep(1.0)
        raise AssertionError("deadline should fire first")

    monkeypatch.setattr(tr, "read_audio_file", slow_read)
    findings = tr.run_backend_smoke(
        settings=settings, profile="fast", usable_files=report.usable_files
    )
    assert findings and findings[0].reason == "backend_smoke_timeout"
    assert findings[0].severity is tr.FindingSeverity.BLOCKING


def test_backend_smoke_invalid_timeout_env(tmp_path, monkeypatch):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    monkeypatch.setenv("SER_TRAINING_SMOKE_TIMEOUT_SECONDS", "soon")
    findings = tr.run_backend_smoke(
        settings=settings, profile="fast", usable_files=("x.wav",)
    )
    assert findings[0].reason == "smoke_timeout_invalid"


def test_smoke_timeout_default_is_platform_aware(monkeypatch):
    """CPU keeps the reference-style 120 s; accelerators absorb first-compile."""
    monkeypatch.delenv("SER_TRAINING_SMOKE_TIMEOUT_SECONDS", raising=False)
    assert tr._smoke_timeout_seconds() == 120.0  # tests force the CPU platform

    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert tr._smoke_timeout_seconds() == 420.0
    # An explicit override beats the platform default either way.
    monkeypatch.setenv("SER_TRAINING_SMOKE_TIMEOUT_SECONDS", "60")
    assert tr._smoke_timeout_seconds() == 60.0


def test_backend_smoke_failure_is_blocking(tmp_path, monkeypatch):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)

    def broken_read(*args, **kwargs):
        raise OSError("decoder exploded")

    monkeypatch.setattr(tr, "read_audio_file", broken_read)
    findings = tr.run_backend_smoke(
        settings=settings, profile="fast", usable_files=("x.wav",)
    )
    assert findings[0].reason == "backend_smoke_failed"
    assert "decoder exploded" in findings[0].message


# --------------------------------------------------------------------------- #
# Profile-aware prepared plans
# --------------------------------------------------------------------------- #


def test_prepared_plan_rejects_backend_fingerprint_change(tmp_path, monkeypatch):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    plan_dir = settings.tmp_folder / "prepared" / "fast"
    plan_path = tr.write_prepared_plan(
        settings=settings, profile="fast", report=report, plan_dir=plan_dir
    )
    plan = json.loads(plan_path.read_text())
    plan["backend"]["model_id"] = "someone/else"
    plan_path.write_text(json.dumps(plan))
    with pytest.raises(tr.PreparedPlanError):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")


def test_quarantine_ledger_digest_stable_across_reruns(tmp_path):
    """Re-running readiness on an unchanged corpus must not churn the ledger
    digest (the prepared-plan 'stable across prepare/train reruns' contract)
    nor spam duplicate audit rows."""
    _make_corpus(tmp_path, corrupt=1)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    ledger = tr.write_quarantine_ledger(report, settings=settings)
    assert ledger is not None
    digest_1 = tr.quarantine_ledger_digest(settings, "fast")
    rows_1 = ledger.read_text().strip().splitlines()

    report2 = tr.run_training_readiness(settings=settings, profile="fast")
    tr.write_quarantine_ledger(report2, settings=settings)
    assert tr.quarantine_ledger_digest(settings, "fast") == digest_1
    assert ledger.read_text().strip().splitlines() == rows_1


def test_manifest_labels_drive_split_findings(tmp_path):
    """Manifest corpora with non-RAVDESS filenames must not be blocked for
    'insufficient classes' the manifest plainly attributes."""
    import json as _json

    ds = tmp_path / "ds"
    ds.mkdir(parents=True)
    sr = 16000
    t = np.arange(int(1.0 * sr)) / sr
    rows = []
    for i, label in enumerate(["angry", "happy", "angry", "happy"]):
        name = f"clip_{i}.wav"
        write_wav(ds / name, (0.4 * np.sin(2 * np.pi * (120 + 40 * i) * t)).astype(np.float32), sr)
        rows.append(
            {
                "sample_id": f"clip_{i}",
                "corpus": "crema-d",
                "audio_path": str(ds / name),
                "label": label,
                "raw_label": label,
                "speaker_id": f"crema-d:spk{i % 2}",
                "language": "en",
            }
        )
    manifest = tmp_path / "manifest.jsonl"
    with manifest.open("w") as handle:
        handle.write(_json.dumps({"manifest_schema_version": 2}) + "\n")
        for row in rows:
            handle.write(_json.dumps(row) + "\n")
    settings = _settings(tmp_path, SER_DATASET_MANIFESTS=str(manifest))
    report = tr.run_training_readiness(settings=settings, profile="fast")
    reasons = {f.reason for f in report.findings}
    assert "insufficient_classes" not in reasons
    assert not report.blocking
    labels = {record.label for record in report.usable_records}
    assert labels == {"angry", "happy"}
    corpora = {record.corpus for record in report.usable_records}
    assert corpora == {"crema-d"}


def test_prepared_plan_missing_payload_is_validation_error(tmp_path):
    import json as _json

    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    plan_path = tr.write_prepared_plan(
        settings=settings, profile="fast", report=report, plan_dir=tmp_path / "plan"
    )
    (tmp_path / "plan" / "prepared_features.npz").unlink()
    with pytest.raises(tr.PreparedPlanError, match="payload"):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")
    # Truncated JSON is also a validation error, not a traceback.
    plan_path.write_text("{not json")
    with pytest.raises(tr.PreparedPlanError, match="Cannot read"):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")


def test_prepared_plan_rejects_split_salt_change(tmp_path, monkeypatch):
    # SER_SPLIT_SALT reshuffles hash-split membership but lives outside the
    # settings digest — the plan pins it (reference recomputes the whole
    # split digest, training_orchestration.py:212-231).
    monkeypatch.delenv("SER_SPLIT_SALT", raising=False)
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    plan_dir = settings.tmp_folder / "prepared" / "fast"
    plan_path = tr.write_prepared_plan(
        settings=settings, profile="fast", report=report, plan_dir=plan_dir
    )
    plan = json.loads(plan_path.read_text())
    assert plan["split_salt"] == f"ser:{settings.training.random_state}"
    assert len(plan["split_digest"]) == 64  # sha256 of the 3-way membership
    tr.load_prepared_plan(plan_path, settings=settings, profile="fast")
    monkeypatch.setenv("SER_SPLIT_SALT", "different-salt")
    with pytest.raises(tr.PreparedPlanError, match="split salt"):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")


def test_recipe_content_digest_semantics(tmp_path):
    # Unset knob and bare built-in id digest the identifier STRING; a file
    # path digests the file CONTENT (reference _recipe_digest,
    # training_orchestration.py:183-190).
    import dataclasses as _dc

    settings = _settings(tmp_path)
    assert settings.dataset.recipe is None
    unset = tr.recipe_content_digest(settings)
    by_id = tr.recipe_content_digest(
        _dc.replace(
            settings, dataset=_dc.replace(settings.dataset, recipe="research-v1")
        )
    )
    assert unset != by_id and len(unset) == len(by_id) == 64
    recipe_path = tmp_path / "recipe.json"
    recipe_path.write_text('{"corpora": []}', encoding="utf-8")
    by_file = _dc.replace(
        settings, dataset=_dc.replace(settings.dataset, recipe=str(recipe_path))
    )
    before = tr.recipe_content_digest(by_file)
    # Editing the file changes the digest even though the path (and every
    # settings value) is unchanged.
    recipe_path.write_text('{"corpora": [1]}', encoding="utf-8")
    assert tr.recipe_content_digest(by_file) != before


def test_prepared_plan_rejects_recipe_change(tmp_path):
    # settings.dataset is outside the settings digest, so the recipe pin is
    # the ONLY guard against a recipe change between prepare and train.
    import dataclasses as _dc

    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    plan_path = tr.write_prepared_plan(
        settings=settings, profile="fast", report=report, plan_dir=tmp_path / "plan"
    )
    assert json.loads(plan_path.read_text())["recipe_digest"] == (
        tr.recipe_content_digest(settings)
    )
    tr.load_prepared_plan(plan_path, settings=settings, profile="fast")
    recipe_on = _dc.replace(
        settings, dataset=_dc.replace(settings.dataset, recipe="research-v1")
    )
    with pytest.raises(tr.PreparedPlanError, match="recipe digest"):
        tr.load_prepared_plan(plan_path, settings=recipe_on, profile="fast")
    # A plan WITHOUT the field is equally unverifiable (pre-pin writer or
    # hand-stripped) — the reference always compares, never skips.
    stripped = json.loads(plan_path.read_text())
    del stripped["recipe_digest"]
    plan_path.write_text(json.dumps(stripped))
    with pytest.raises(tr.PreparedPlanError, match="recipe digest"):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")


def test_prepared_plan_rejects_membership_change(tmp_path):
    """Adding a file after --prepare-only reshuffles the deterministic split;
    the plan's split_digest must invalidate the resume (reference
    validate_operation_plan recomputes _current_split_digest)."""
    ds = _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    plan_path = tr.write_prepared_plan(
        settings=settings, profile="fast", report=report, plan_dir=tmp_path / "plan"
    )
    tr.load_prepared_plan(plan_path, settings=settings, profile="fast")
    # New clip appears after preparation: membership changed.
    import shutil

    source = next((ds / "Actor_01").glob("*.wav"))
    shutil.copy(source, ds / "Actor_01" / "03-01-06-01-01-01-01.wav")
    with pytest.raises(tr.PreparedPlanError, match="split digest"):
        tr.load_prepared_plan(plan_path, settings=settings, profile="fast")


def test_split_digest_tracks_membership(tmp_path):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    first = tr.split_digest(report, settings)
    assert first == tr.split_digest(report, settings)  # deterministic
    # Dropping one usable sample changes the membership digest.
    import dataclasses as _dc

    smaller = _dc.replace(
        report,
        usable_records=report.usable_records[:-1],
        usable_files=report.usable_files[:-1],
    )
    assert tr.split_digest(smaller, settings) != first


# --- Configuration-finding breadth (reference training_readiness.py:975-1195) ---


def _config_reasons(settings):
    return [f.reason for f in tr._config_findings(settings)]


def _replace_section(settings, section, **kwargs):
    import dataclasses as _dc

    return _dc.replace(settings, **{section: _dc.replace(getattr(settings, section), **kwargs)})


def test_config_findings_clean_settings_pass(tmp_path):
    _make_corpus(tmp_path)
    assert tr._config_findings(_settings(tmp_path)) == []


def test_config_findings_reject_bad_split_sizes(tmp_path):
    _make_corpus(tmp_path)
    base = _settings(tmp_path)
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "training", dev_size=0.0)
    )
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "training", test_size=1.5)
    )
    # Individually valid sizes whose sum crowds out the train split.
    summed = _replace_section(base, "training", test_size=0.6, dev_size=0.5)
    assert "invalid_configuration" in _config_reasons(summed)


def test_config_findings_reject_non_finite_and_out_of_range(tmp_path):
    _make_corpus(tmp_path)
    base = _settings(tmp_path)
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "data_loader", max_failed_file_ratio=float("nan"))
    )
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "nn", epsilon=0.0)
    )
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "audio_read", retry_delay_seconds=-1.0)
    )


def test_config_findings_validate_every_profile_runtime(tmp_path):
    _make_corpus(tmp_path)
    base = _settings(tmp_path)
    for section in (
        "fast_runtime",
        "medium_runtime",
        "accurate_runtime",
        "accurate_research_runtime",
    ):
        bad_stride = _replace_section(
            base,
            section,
            pool_window_size_seconds=1.0,
            pool_window_stride_seconds=2.0,
        )
        assert "invalid_configuration" in _config_reasons(bad_stride), section
        bad_hysteresis = _replace_section(
            base, section, post_hysteresis_enter_confidence=1.5
        )
        assert "invalid_configuration" in _config_reasons(bad_hysteresis), section
        bad_retries = _replace_section(base, section, max_timeout_retries=-1)
        assert "invalid_configuration" in _config_reasons(bad_retries), section


def test_config_findings_reject_bad_seeds_workers_and_classifier(tmp_path):
    _make_corpus(tmp_path)
    base = _settings(tmp_path)
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "training", random_state=-1)
    )
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "data_loader", max_workers=0)
    )
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "nn", hidden_layer_sizes=(300, 0))
    )


def test_config_findings_reject_unsupported_device_dtype(tmp_path):
    _make_corpus(tmp_path)
    base = _settings(tmp_path)
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "torch_runtime", device="quantum:0")
    )
    assert "invalid_configuration" in _config_reasons(
        _replace_section(base, "torch_runtime", dtype="float8")
    )
    # Sub-selector syntax on a known device is fine.
    assert _config_reasons(_replace_section(base, "torch_runtime", device="tpu:3")) == []


def test_config_findings_surface_quarantine_policy_errors(tmp_path):
    _make_corpus(tmp_path)
    base = _settings(tmp_path)
    bad_policy = _replace_section(base, "data_loader", max_failed_file_ratio_per_class=2.0)
    reasons = _config_reasons(bad_policy)
    assert reasons.count("invalid_configuration") >= 2  # numeric check + policy ctor


def test_config_findings_block_readiness_run(tmp_path):
    _make_corpus(tmp_path)
    settings = _replace_section(_settings(tmp_path), "training", test_size=0.0)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    assert report.blocking
    assert any(f.reason == "invalid_configuration" for f in report.findings)


# --- Media-integrity pre-pass (reference training_readiness.py:1441-1540) ---


def _write_clip(path, seconds=1.2):
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    path.parent.mkdir(parents=True, exist_ok=True)
    write_wav(path, (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)


def test_media_path_escape_blocks(tmp_path):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    outside = tmp_path / "elsewhere" / "clip.wav"
    _write_clip(outside)
    records = [
        tr.FileRecord(path=str(outside), corpus="ravdess", label="happy", speaker="01")
    ]
    findings, passed = tr._media_integrity_findings(records, settings)
    assert passed == []
    assert [f.reason for f in findings] == ["manifest_invalid"]
    assert findings[0].severity is tr.FindingSeverity.BLOCKING


def test_media_path_alias_blocks_symlinked_duplicate(tmp_path):
    ds = _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    original = next(iter(sorted((ds / "Actor_01").glob("*.wav"))))
    alias = ds / "Actor_01" / "alias-of-first.wav"
    try:
        alias.symlink_to(original)
    except OSError:
        pytest.skip("platform without symlink support")
    records = [
        tr.FileRecord(path=str(original), corpus="ravdess", label="happy", speaker="01"),
        tr.FileRecord(path=str(alias), corpus="ravdess", label="happy", speaker="01"),
    ]
    findings, passed = tr._media_integrity_findings(records, settings)
    assert [f.reason for f in findings] == ["path_alias"]
    assert len(passed) == 1  # first claimant survives


def test_allowed_roots_union_registry_and_folder(tmp_path):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    from ser_tpu._internal.data import registry

    other_root = tmp_path / "registered"
    other_root.mkdir()
    registry.register_dataset(
        registry.DatasetRegistryRecord(
            dataset_id="ravdess",
            dataset_root=str(other_root),
            manifest_path=str(other_root / "manifest.jsonl"),
            utterance_count=6,
            prepared_at_unix=registry.now_unix(),
        ),
        settings=settings,
    )
    roots = tr._allowed_media_roots(settings)
    assert settings.dataset.folder.expanduser() in roots
    assert other_root.expanduser() in roots


def test_readiness_run_blocks_on_alias(tmp_path):
    ds = _make_corpus(tmp_path)
    original = next(iter(sorted((ds / "Actor_01").glob("*.wav"))))
    alias = ds / "Actor_02" / "03-01-03-01-01-01-02.wav"
    alias.unlink()
    try:
        alias.symlink_to(original)
    except OSError:
        pytest.skip("platform without symlink support")
    report = tr.run_training_readiness(settings=_settings(tmp_path), profile="fast")
    assert report.blocking
    assert any(f.reason == "path_alias" for f in report.findings)


# --- Stratified smoke selection (reference training_readiness.py:637-703) ---


def _rec(path, corpus="ravdess", label="happy", language="en"):
    return tr.FileRecord(path=path, corpus=corpus, label=label, language=language)


def test_select_smoke_samples_covers_every_stratum():
    records = [
        _rec("/d/a1.wav"),
        _rec("/d/a2.wav"),
        _rec("/d/b1.flac", corpus="crema_d", label="angry"),
        _rec("/d/c1.wav", corpus="emodb", language="de"),
    ]
    selected = tr.select_smoke_samples(records, cap=8)
    strata = {(r.corpus, r.path.rsplit(".", 1)[-1], r.language) for r in selected}
    assert {("ravdess", "wav", "en"), ("crema_d", "flac", "en"), ("emodb", "wav", "de")} <= strata
    # Lexicographic representative per stratum, deterministic output.
    assert selected == tr.select_smoke_samples(records, cap=8)
    assert "/d/a1.wav" in {r.path for r in selected}


def test_select_smoke_samples_fills_capacity_with_coverage_keys():
    records = [_rec(f"/d/a{i}.wav", label=lab) for i, lab in enumerate(["happy", "angry", "sad"])]
    selected = tr.select_smoke_samples(records, cap=3)
    assert len(selected) == 3  # 1 stratum + 2 coverage fills


def test_select_smoke_samples_errors_when_strata_exceed_cap():
    records = [_rec(f"/d/x{i}.wav", corpus=f"c{i}") for i in range(4)]
    with pytest.raises(ValueError, match="cap"):
        tr.select_smoke_samples(records, cap=2)


def test_backend_smoke_probes_stratified_matrix(tmp_path, monkeypatch):
    _make_corpus(tmp_path)
    settings = _settings(tmp_path)
    report = tr.run_training_readiness(settings=settings, profile="fast")
    seen = []
    real_read = tr.read_audio_file

    def spy_read(path, **kwargs):
        seen.append(path)
        return real_read(path, **kwargs)

    monkeypatch.setattr(tr, "read_audio_file", spy_read)
    findings = tr.run_backend_smoke(
        settings=settings,
        profile="fast",
        usable_files=report.usable_files,
        usable_records=report.usable_records,
    )
    assert [f.reason for f in findings] == ["backend_smoke_ok"]
    # One ravdess/wav/en stratum, capacity fills with coverage keys up to cap.
    assert len(seen) == min(len(report.usable_files), tr.DEFAULT_SMOKE_SAMPLE_CAP)


# --- Typed failure taxonomy (reference training_readiness.py:107-170,704-791) ---


def test_classify_lfs_pointer_aborts_at_corpus_scope():
    from ser_tpu._internal.utils.audio_io import AudioIntegrityError

    c = tr.classify_failure(
        AudioIntegrityError("Audio file is an unmaterialized Git LFS pointer: x.wav"),
        scope=tr.FailureScope.SAMPLE,
    )
    assert c.scope is tr.FailureScope.CORPUS
    assert c.reason_code is tr.FailureReasonCode.GIT_LFS_POINTER
    assert c.disposition is tr.FailureDisposition.ABORT


def test_classify_decode_failure_quarantines():
    from ser_tpu._internal.utils.audio_io import AudioDecodeError

    c = tr.classify_failure(AudioDecodeError("bad RIFF"), scope=tr.FailureScope.SAMPLE)
    assert c.reason_code is tr.FailureReasonCode.SAMPLE_AUDIO_CORRUPT
    assert c.disposition is tr.FailureDisposition.QUARANTINE


def test_classify_transient_io_gets_bounded_retry():
    err = OSError(11, "Resource temporarily unavailable")
    c = tr.classify_failure(err, scope=tr.FailureScope.SAMPLE)
    assert c.reason_code is tr.FailureReasonCode.MEDIA_DECODE_FAILED
    assert c.disposition is tr.FailureDisposition.BOUNDED_RETRY


def test_classify_proven_missing_sample_quarantines(tmp_path):
    clip = tmp_path / "ds" / "a.wav"
    err = FileNotFoundError(2, "No such file", str(clip))
    c = tr.classify_failure(
        err,
        scope=tr.FailureScope.SAMPLE,
        sample_path=str(clip),
        allowed_roots=(tmp_path / "ds",),
    )
    assert c.reason_code is tr.FailureReasonCode.SAMPLE_AUDIO_MISSING
    assert c.disposition is tr.FailureDisposition.QUARANTINE
    # A missing file that is NOT the sample (e.g. a model asset) aborts.
    other = tr.classify_failure(
        FileNotFoundError(2, "No such file", "/models/enc.bin"),
        scope=tr.FailureScope.SAMPLE,
        sample_path=str(clip),
        allowed_roots=(tmp_path / "ds",),
    )
    assert other.disposition is tr.FailureDisposition.ABORT


def test_classify_cache_and_window_and_artifact_dispositions():
    assert (
        tr.classify_failure(
            tr.CacheEntryCorruptError("zlib"), scope=tr.FailureScope.CACHE
        ).disposition
        is tr.FailureDisposition.RECOMPUTE
    )
    assert (
        tr.classify_failure(
            tr.WindowContainmentError("low variance"), scope=tr.FailureScope.WINDOW
        ).disposition
        is tr.FailureDisposition.CONTINUE
    )
    assert (
        tr.classify_failure(
            tr.OptionalArtifactError("report"), scope=tr.FailureScope.OPTIONAL_ARTIFACT
        ).disposition
        is tr.FailureDisposition.CONTINUE
    )


def test_unknown_failure_aborts_by_default():
    c = tr.classify_failure(RuntimeError("novel defect"), scope=tr.FailureScope.SAMPLE)
    assert c.disposition is tr.FailureDisposition.ABORT
    assert c.severity is tr.FindingSeverity.BLOCKING


def test_lfs_pointer_in_corpus_blocks_readiness(tmp_path):
    ds = _make_corpus(tmp_path)
    (ds / "Actor_01" / "03-01-06-01-01-01-01.wav").write_bytes(
        b"version https://git-lfs.github.com/spec/v1\noid sha256:ab\nsize 9\n"
    )
    report = tr.run_training_readiness(settings=_settings(tmp_path), profile="fast")
    assert report.blocking
    assert any(f.reason == "git_lfs_pointer" for f in report.findings)


def test_quarantine_findings_carry_stable_reason_codes(tmp_path):
    _make_corpus(tmp_path, corrupt=1)
    report = tr.run_training_readiness(settings=_settings(tmp_path), profile="fast")
    probe_findings = [
        f
        for f in report.findings
        if f.scope is tr.FindingScope.MEDIA and f.severity is tr.FindingSeverity.WARNING
    ]
    assert [f.reason for f in probe_findings] == ["sample_audio_corrupt"]
