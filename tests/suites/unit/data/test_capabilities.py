"""Dataset capability catalog + installed-dataset snapshot tests."""

import json

import pytest

from ser_tpu._internal.data.capabilities import (
    _collect_manifest_audio_stats,
    build_dataset_capability_snapshot_json_payload,
    collect_dataset_capability_snapshot,
    list_dataset_capability_profiles,
    resolve_dataset_capability_profile,
)
from ser_tpu._internal.data.catalog import DATASET_CATALOG


def test_every_catalog_dataset_has_a_capability_profile():
    profiles = list_dataset_capability_profiles()
    assert sorted(p.dataset_id for p in profiles) == sorted(DATASET_CATALOG)
    for profile in profiles:
        assert profile.summary
        assert profile.modalities
        assert profile.recommended_uses
        # SSL is universally available: every corpus has usable raw audio.
        assert profile.ssl_candidate is True


def test_unknown_dataset_raises():
    with pytest.raises(ValueError, match="capability profile"):
        resolve_dataset_capability_profile("not-a-dataset")


def test_manifest_audio_stats_count_unique_present_nonempty(tmp_path):
    ds = tmp_path / "ds"
    ds.mkdir()
    (ds / "a.wav").write_bytes(b"x" * 10)
    (ds / "empty.wav").write_bytes(b"")
    manifest = tmp_path / "m.jsonl"
    rows = [
        {"sample_id": "a", "audio_path": "ds/a.wav"},
        {"sample_id": "a2", "audio_path": "ds/a.wav"},  # duplicate path: once
        {"sample_id": "e", "audio_path": "ds/empty.wav"},
        {"sample_id": "m", "audio_path": "ds/missing.wav"},
        {"sample_id": "junk", "audio_path": ""},  # ignored
    ]
    manifest.write_text(
        "# comment\n" + "".join(json.dumps(r) + "\n" for r in rows), encoding="utf-8"
    )
    referenced, present, nonempty, total = _collect_manifest_audio_stats(
        manifest_path=manifest, dataset_root=ds
    )
    assert (referenced, present, nonempty, total) == (3, 2, 1, 10)


def test_snapshot_marks_installed_only_with_nonempty_audio(tmp_path, monkeypatch):
    from ser_tpu._internal.config.bootstrap import reload_settings
    from ser_tpu._internal.data import registry

    monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
    monkeypatch.setenv("SER_TMP_FOLDER", str(tmp_path / "tmp"))
    settings = reload_settings()

    ds = tmp_path / "ravdess"
    (ds / "Actor_01").mkdir(parents=True)
    wav = ds / "Actor_01" / "03-01-01-01-01-01-01.wav"
    wav.write_bytes(b"RIFF" + b"\x00" * 100)
    manifest = ds / "ravdess.manifest.jsonl"
    manifest.write_text(
        json.dumps(
            {
                "schema_version": 2,
                "sample_id": "03-01-01-01-01-01-01",
                "corpus": "ravdess",
                "audio_path": "Actor_01/03-01-01-01-01-01-01.wav",
                "label": "neutral",
            },
            sort_keys=True,
        )
        + "\n",
        encoding="utf-8",
    )
    registry.register_dataset(
        registry.DatasetRegistryRecord(
            dataset_id="ravdess",
            dataset_root=str(ds),
            manifest_path=str(manifest),
            utterance_count=1,
        ),
        settings=settings,
    )

    rows = collect_dataset_capability_snapshot(settings=settings)
    assert [r.dataset_id for r in rows] == ["ravdess"]
    row = rows[0]
    assert row.installed and row.registered and row.manifest_exists
    assert row.referenced_audio_files == 1
    assert row.present_audio_files == 1
    assert row.nonempty_audio_files == 1
    assert row.dataset_size_bytes == 104
    assert row.label_schema == "emotion_8_class"

    # --all covers the full supported catalog; uninstalled rows carry zeros.
    all_rows = collect_dataset_capability_snapshot(
        settings=settings, include_uninstalled=True
    )
    assert len(all_rows) == len(DATASET_CATALOG)
    uninstalled = next(r for r in all_rows if r.dataset_id == "crema-d")
    assert not uninstalled.installed
    assert uninstalled.referenced_audio_files == 0

    payload = build_dataset_capability_snapshot_json_payload(rows)
    assert set(payload) == {"entries"}
    entry = payload["entries"][0]
    assert entry["dataset_id"] == "ravdess"
    assert entry["recommended_uses"] == [
        "supervised_ser_training",
        "cross_corpus_emotion_merge",
        "ssl_pretraining",
    ]
