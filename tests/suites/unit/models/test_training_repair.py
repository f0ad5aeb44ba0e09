"""Repair allowlist: typed records, staging cleanup, network gating."""

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.models import training_repair as repair


def _settings(tmp_path, **extra):
    env = {
        "SER_DATASET_FOLDER": str(tmp_path / "ds"),
        "SER_TMP_FOLDER": str(tmp_path / "tmp"),
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
    }
    env.update(extra)
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def test_repairs_create_directories_and_clean_staging(tmp_path):
    settings = _settings(tmp_path)
    settings.tmp_folder.mkdir(parents=True, exist_ok=True)
    probe = settings.tmp_folder / ".ser-write-probe-123"
    probe.write_text("x")
    keep = settings.tmp_folder / "real_data.json"
    keep.write_text("{}")

    records = repair.apply_training_repairs(settings=settings, profile="fast")
    by_action = {}
    for record in records:
        by_action.setdefault(record.action, []).append(record)

    assert all(r.succeeded for r in by_action["create_application_directory"])
    assert settings.models.folder.is_dir()
    staging = by_action["clean_application_staging"][0]
    assert staging.succeeded and "removed 1" in staging.detail
    assert not probe.exists()
    assert keep.exists()  # only allowlisted patterns are touched


def test_repairs_purge_prepared_and_cache(tmp_path):
    settings = _settings(tmp_path)
    cache = settings.tmp_folder / "embedding-cache"
    cache.mkdir(parents=True)
    (cache / "stale.npz").write_bytes(b"x")
    records = repair.apply_training_repairs(settings=settings, profile="fast")
    purges = [r for r in records if r.action == "purge_cache"]
    assert all(r.succeeded for r in purges)
    assert not cache.exists()


def test_network_repair_denied_without_optin(tmp_path, monkeypatch):
    monkeypatch.delenv("SER_TRAINING_REPAIR_ALLOW_NETWORK", raising=False)
    settings = _settings(tmp_path)
    records = repair.apply_training_repairs(settings=settings, profile="fast")
    redownload = [r for r in records if r.action == "redownload_pinned_model"]
    assert len(redownload) == 1
    assert not redownload[0].succeeded
    assert "SER_TRAINING_REPAIR_ALLOW_NETWORK" in redownload[0].detail


def test_network_repair_requires_revision_pin(tmp_path, monkeypatch):
    monkeypatch.setenv("SER_TRAINING_REPAIR_ALLOW_NETWORK", "1")
    settings = _settings(tmp_path)
    # The medium profile's default model id carries no @revision pin here.
    record = repair._repair_pinned_model(settings, "medium")
    assert not record.succeeded
    assert "pin" in record.detail.lower()


def test_network_repair_with_pin_attempts_and_records_failure(tmp_path, monkeypatch):
    """Zero-egress: the gated path runs and records the provider denial."""
    from types import SimpleNamespace

    monkeypatch.setenv("SER_TRAINING_REPAIR_ALLOW_NETWORK", "1")
    settings = _settings(tmp_path)
    pinned = SimpleNamespace(
        model=SimpleNamespace(default_model_id="facebook/wav2vec2-xls-r-300m@abc123")
    )
    monkeypatch.setattr(repair, "get_profile_catalog", lambda: {"medium": pinned})
    record = repair._repair_pinned_model(settings, "medium")
    assert record.action == "redownload_pinned_model"
    assert not record.succeeded  # no egress in this runtime
    assert "Network downloads are disabled" in record.detail


def test_run_training_repair_exit_code(tmp_path, capsys):
    settings = _settings(tmp_path)  # dataset folder missing -> blocking
    code = repair.run_training_repair(settings=settings, profile="fast")
    assert code == 2
    out = capsys.readouterr().out
    assert "repair[" in out and "post-repair readiness" in out
