"""Per-owner tests for the internal data API facade.

Parity surface: reference ``ser/_internal/api/data.py`` — the CLI's ``data``
subcommand and the public facade route through these wrappers, so the
contract is exact forwarding (no defaults invented, no kwargs dropped).
"""

from __future__ import annotations

from pathlib import Path

from ser_tpu._internal.api import data as api_data
from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs


def _settings(tmp_path: Path):
    return build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_MODELS_FOLDER": str(tmp_path / "models"),
                "SER_DATASET_FOLDER": str(tmp_path / "dataset"),
            }
        )
    )


def test_list_datasets_is_the_full_deterministic_catalog():
    ids = api_data.list_datasets()
    assert isinstance(ids, tuple)
    assert len(ids) == 16
    assert list(ids) == sorted(ids)
    assert "ravdess" in ids and "crema-d" in ids


def test_registry_health_empty_for_fresh_settings(tmp_path):
    issues = api_data.list_dataset_registry_health_issues(settings=_settings(tmp_path))
    assert isinstance(issues, tuple)
    assert issues == ()


def test_prepare_dataset_forwards_every_kwarg(monkeypatch, tmp_path):
    captured: dict = {}

    def fake_prepare(**kwargs):
        captured.update(kwargs)
        return "sentinel-result"

    monkeypatch.setattr(api_data, "_prepare_dataset", fake_prepare)
    settings = _settings(tmp_path)
    result = api_data.prepare_dataset(
        dataset_id="ravdess",
        dataset_root=tmp_path / "root",
        manifest_path=tmp_path / "m.jsonl",
        labels_csv_path=tmp_path / "labels.csv",
        audio_base_dir=tmp_path / "audio",
        source_repo_id="org/repo",
        source_revision="rev1",
        default_language="en",
        skip_download=True,
        accept_license=True,
        compliance_mode="strict",
        settings=settings,
    )
    assert result == "sentinel-result"
    assert captured == {
        "dataset_id": "ravdess",
        "dataset_root": tmp_path / "root",
        "manifest_path": tmp_path / "m.jsonl",
        "labels_csv_path": tmp_path / "labels.csv",
        "audio_base_dir": tmp_path / "audio",
        "source_repo_id": "org/repo",
        "source_revision": "rev1",
        "default_language": "en",
        "skip_download": True,
        "accept_license": True,
        "compliance_mode": "strict",
        "settings": settings,
    }


def test_consent_helpers_are_reexported_from_the_owner():
    from ser_tpu._internal.data import consents

    assert api_data.configure_dataset_consents is consents.configure_dataset_consents
    assert api_data.show_dataset_consents is consents.show_dataset_consents


def test_public_all_matches_module_namespace():
    for name in api_data.__all__:
        assert hasattr(api_data, name), name
