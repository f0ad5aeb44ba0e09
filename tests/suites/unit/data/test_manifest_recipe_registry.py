"""Manifest schema, recipe audit, registry, and consents tests."""

import numpy as np
import pytest

from ser_tpu._internal.data.manifest import (
    ManifestError,
    Utterance,
    normalized_pcm_sha256,
    read_manifest_jsonl,
    write_manifest_jsonl,
)
from ser_tpu._internal.data.recipe import audit_recipe, get_recipe


def _utterance(**overrides):
    base = dict(
        sample_id="s1",
        corpus="ravdess",
        audio_path="/tmp/a.wav",
        label="happy",
        speaker_id="01",
    )
    base.update(overrides)
    return Utterance(**base)


def test_manifest_round_trip(tmp_path):
    utterances = [_utterance(sample_id=f"s{i}") for i in range(3)]
    path = write_manifest_jsonl(utterances, tmp_path / "m.jsonl")
    loaded = read_manifest_jsonl(path)
    assert [u.sample_id for u in loaded] == ["s0", "s1", "s2"]
    assert loaded[0].label == "happy"


def test_manifest_rejects_bad_label(tmp_path):
    with pytest.raises(ManifestError, match="ontology"):
        write_manifest_jsonl([_utterance(label="ecstatic")], tmp_path / "m.jsonl")


def test_manifest_rejects_bad_split(tmp_path):
    with pytest.raises(ManifestError, match="split"):
        write_manifest_jsonl([_utterance(split="validation")], tmp_path / "m.jsonl")


def test_normalized_pcm_digest_is_content_stable():
    audio = np.linspace(-1, 1, 100, dtype=np.float32)
    assert normalized_pcm_sha256(audio) == normalized_pcm_sha256(audio.copy())
    assert normalized_pcm_sha256(audio) != normalized_pcm_sha256(audio * 0.5)


def test_recipe_audit_flags_leakage_and_duplicates():
    recipe = get_recipe("research-v1")
    utterances = [
        _utterance(sample_id="a", audio_sha256="x", split="train"),
        _utterance(sample_id="b", audio_sha256="x", split="test"),  # dup digest + leakage
    ]
    report = audit_recipe(utterances, recipe)
    kinds = {issue.kind for issue in report.issues}
    assert "duplicate_samples" in kinds
    assert "speaker_leakage" in kinds
    assert report.blocking


def test_recipe_audit_corpus_scope():
    recipe = get_recipe("research-v1")
    report = audit_recipe([_utterance(corpus="msp-podcast")], recipe)
    assert any(issue.kind == "corpus_scope" for issue in report.issues)


def test_recipe_strict_escalates_warnings():
    recipe = get_recipe("research-v1")
    utterances = [_utterance(audio_sha256=None, speaker_id=None)]
    relaxed = audit_recipe(utterances, recipe, strict=False)
    strict = audit_recipe(utterances, recipe, strict=True)
    assert not any(
        issue.blocking for issue in relaxed.issues if issue.kind == "missing_digests"
    )
    assert any(
        issue.blocking for issue in strict.issues if issue.kind == "missing_digests"
    )


def test_load_utterances_from_manifest(tmp_path):
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.data.loader import load_utterances

    manifest = tmp_path / "m.jsonl"
    write_manifest_jsonl([_utterance()], manifest)
    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_DATASET_MANIFESTS": str(manifest)})
    )
    utterances = load_utterances(settings=settings)
    assert utterances is not None and utterances[0].sample_id == "s1"


def test_device_oom_parsing():
    from ser_tpu._internal.runtime.oom import is_device_oom, parse_device_oom

    message = (
        "RESOURCE_EXHAUSTED: XLA:TPU compile permanent error. Ran out of memory "
        "while allocating 12.5GiB; free: 2.1GiB, limit: 15.48GiB"
    )
    assert is_device_oom(message)
    info = parse_device_oom(message)
    assert info.requested_bytes == int(12.5 * (1 << 30))
    assert info.available_bytes == int(2.1 * (1 << 30))
    assert info.is_informative
    assert not is_device_oom("ValueError: bad shape")


def test_training_scope_and_readiness_block(tmp_path):
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.models.training_orchestration import (
        TrainingNotReadyError,
        current_training_run,
        ensure_entrypoint_readiness,
        training_operation_scope,
    )

    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_DATASET_FOLDER": str(tmp_path / "missing")})
    )
    assert current_training_run() is None
    with training_operation_scope("fast") as state:
        assert current_training_run() is state
        with pytest.raises(TrainingNotReadyError, match="blocking"):
            ensure_entrypoint_readiness(settings=settings, profile="fast")
        assert state.readiness is not None
    assert current_training_run() is None
