"""Readiness depth: registry, restricted-backend, and resource findings."""

import os
from pathlib import Path

import pytest

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.models.training_readiness import (
    FindingSeverity,
    _probe_directory,
    _registry_findings,
    _resource_findings,
    _restricted_backend_findings,
    run_training_readiness,
)


@pytest.fixture
def settings(tmp_path, monkeypatch):
    monkeypatch.setenv("SER_DATASET_FOLDER", str(tmp_path / "ds"))
    monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
    monkeypatch.setenv("SER_TMP_FOLDER", str(tmp_path / "tmp"))
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "data"))
    return reload_settings()


class TestRegistryFindings:
    def test_healthy_or_empty_registry_produces_no_findings(self, settings):
        assert _registry_findings(settings) == []

    def test_missing_root_and_manifest_block(self, settings, tmp_path):
        from ser_tpu._internal.data.registry import DatasetRegistryRecord, register_dataset

        register_dataset(
            DatasetRegistryRecord(
                dataset_id="ravdess",
                dataset_root=str(tmp_path / "gone"),
                manifest_path=str(tmp_path / "gone" / "m.jsonl"),
                utterance_count=3,
                revision=None,
                prepared_at_unix=0.0,
            ),
            settings=settings,
        )
        findings = _registry_findings(settings)
        reasons = {f.reason for f in findings}
        assert "registry_missing_root" in reasons
        assert "registry_missing_manifest" in reasons
        assert all(f.severity is FindingSeverity.BLOCKING for f in findings)

    def test_registry_issue_blocks_full_readiness_run(self, settings, tmp_path):
        from ser_tpu._internal.data.registry import DatasetRegistryRecord, register_dataset

        register_dataset(
            DatasetRegistryRecord(
                dataset_id="ravdess",
                dataset_root=str(tmp_path / "gone"),
                manifest_path=str(tmp_path / "gone" / "m.jsonl"),
                utterance_count=3,
                revision=None,
                prepared_at_unix=0.0,
            ),
            settings=settings,
        )
        report = run_training_readiness(settings=settings, profile="fast")
        assert report.blocking
        assert not report.usable_files


class TestRestrictedBackendFindings:
    def test_non_research_profiles_skip_the_check(self, settings):
        assert _restricted_backend_findings(settings, "fast") == []
        assert _restricted_backend_findings(settings, "accurate") == []

    def test_research_without_enablement_blocks(self, settings, monkeypatch):
        monkeypatch.delenv("SER_ENABLE_RESTRICTED_BACKENDS", raising=False)
        findings = _restricted_backend_findings(settings, "accurate-research")
        assert len(findings) == 1
        assert findings[0].reason == "restricted_backend_access"
        assert findings[0].severity is FindingSeverity.BLOCKING
        assert "restricted" in findings[0].message


class TestResourceFindings:
    def test_probe_accepts_writable_directory(self, tmp_path):
        _probe_directory(tmp_path)  # must not raise, must not leave artifacts
        assert list(tmp_path.iterdir()) == []

    @pytest.mark.skipif(os.geteuid() == 0, reason="root ignores mode bits")
    def test_probe_rejects_unwritable_parent(self, tmp_path):
        locked = tmp_path / "locked"
        locked.mkdir()
        locked.chmod(0o500)
        try:
            with pytest.raises(OSError, match="not writable"):
                _probe_directory(locked / "child")
        finally:
            locked.chmod(0o700)

    def test_healthy_environment_has_no_findings(self, settings):
        assert _resource_findings(settings, sample_count=4) == []

    def test_absurd_sample_count_triggers_disk_and_memory(self, settings):
        findings = _resource_findings(settings, sample_count=10**9)
        reasons = {f.reason for f in findings}
        assert "disk_space_low" in reasons
        # Memory finding appears on platforms exposing SC_AVPHYS_PAGES.
        assert reasons <= {"disk_space_low", "memory_low", "fd_limit_low"}

    @pytest.mark.skipif(os.geteuid() == 0, reason="root ignores mode bits")
    def test_unwritable_models_folder_blocks(self, settings, tmp_path):
        models = Path(settings.models.folder)
        models.mkdir(parents=True, exist_ok=True)
        models.chmod(0o500)
        try:
            findings = _resource_findings(settings, sample_count=1)
        finally:
            models.chmod(0o700)
        assert any(f.reason == "output_unwritable" for f in findings)
