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


def test_repairs_invalidate_only_corrupt_cache_entries(tmp_path):
    """Valid cached encodes are hours of accelerator work: they must survive
    a repair pass; only unreadable entries are removed (reference
    ``training_readiness.py:1956-1981``)."""
    import numpy as np

    settings = _settings(tmp_path)
    cache = settings.tmp_folder / "embedding-cache"
    cache.mkdir(parents=True)
    corrupt = cache / "stale.npz"
    corrupt.write_bytes(b"x")
    valid = cache / "good.npz"
    np.savez(valid, embeddings=np.zeros((2, 3), dtype=np.float32))
    records = repair.apply_training_repairs(settings=settings, profile="fast")
    invalidations = [r for r in records if r.action == "invalidate_derived_cache"]
    assert len(invalidations) == 1 and invalidations[0].succeeded
    assert "Invalidated 1" in invalidations[0].detail
    assert not corrupt.exists()
    assert valid.exists()


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


def _register_lfs_corpus(tmp_path, settings):
    """One registered dataset whose media are Git-LFS pointers in a git root."""
    from ser_tpu._internal.data import registry
    from ser_tpu._internal.data.manifest import Utterance, write_manifest_jsonl

    root = tmp_path / "crema_checkout"
    (root / ".git").mkdir(parents=True)
    clip = root / "AudioWAV" / "1001_DFA_ANG_XX.wav"
    clip.parent.mkdir(parents=True)
    clip.write_bytes(
        b"version https://git-lfs.github.com/spec/v1\n"
        b"oid sha256:deadbeef\nsize 123456\n"
    )
    manifest = root / "manifest.jsonl"
    write_manifest_jsonl(
        [
            Utterance(
                sample_id="crema/1001_DFA_ANG_XX",
                corpus="crema_d",
                audio_path=str(clip),
                label="angry",
            )
        ],
        manifest,
    )
    registry.register_dataset(
        registry.DatasetRegistryRecord(
            dataset_id="crema_d",
            dataset_root=str(root),
            manifest_path=str(manifest),
            utterance_count=1,
        ),
        settings=settings,
    )
    return root


def test_registry_audit_flags_lfs_pointers(tmp_path):
    from ser_tpu._internal.data.registry import audit_registry_health

    settings = _settings(tmp_path)
    _register_lfs_corpus(tmp_path, settings)
    issues = audit_registry_health(settings=settings)
    assert any(issue.issue_kind == "lfs_pointer" for issue in issues)


def test_git_lfs_repair_targets_git_root_and_records_outcome(tmp_path, monkeypatch):
    settings = _settings(tmp_path)
    root = _register_lfs_corpus(tmp_path, settings)
    commands = []

    def fake_run(command, *, timeout=300.0):
        commands.append(command)
        return False, "git-lfs not installed"

    monkeypatch.setattr(repair, "_run_repair_command", fake_run)
    records = repair._repair_git_lfs(settings)
    assert [r.action for r in records] == ["hydrate_git_lfs"]
    assert records[0].target == str(root.resolve())
    assert not records[0].succeeded
    # Local checkout only — the network pull never runs without the opt-in.
    assert commands == [("git", "-C", str(root.resolve()), "lfs", "checkout")]


def test_git_lfs_repair_escalates_to_pull_with_optin(tmp_path, monkeypatch):
    settings = _settings(tmp_path)
    root = _register_lfs_corpus(tmp_path, settings)
    monkeypatch.setenv("SER_TRAINING_REPAIR_ALLOW_NETWORK", "1")
    commands = []

    def fake_run(command, *, timeout=300.0):
        commands.append(command)
        return (command[-1] != "checkout" or len(commands) == 3), "ok"

    monkeypatch.setattr(repair, "_run_repair_command", fake_run)
    records = repair._repair_git_lfs(settings)
    assert records[0].succeeded
    assert [c[-1] for c in commands] == ["checkout", "pull", "checkout"]


def test_git_lfs_repair_skips_non_git_datasets(tmp_path):
    from ser_tpu._internal.data import registry
    from ser_tpu._internal.data.manifest import Utterance, write_manifest_jsonl

    settings = _settings(tmp_path)
    root = tmp_path / "plain_folder"
    clip = root / "a.wav"
    clip.parent.mkdir(parents=True)
    clip.write_bytes(b"version https://git-lfs.github.com/spec/v1\noid sha256:00\nsize 1\n")
    manifest = root / "manifest.jsonl"
    write_manifest_jsonl(
        [Utterance(sample_id="x/a", corpus="ravdess", audio_path=str(clip), label="angry")],
        manifest,
    )
    registry.register_dataset(
        registry.DatasetRegistryRecord(
            dataset_id="ravdess",
            dataset_root=str(root),
            manifest_path=str(manifest),
            utterance_count=1,
        ),
        settings=settings,
    )
    assert repair._repair_git_lfs(settings) == []
