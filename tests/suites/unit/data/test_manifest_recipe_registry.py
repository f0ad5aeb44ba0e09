"""Manifest schema, recipe audit, registry, and consents tests."""

import hashlib

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


def _digest(seed: str) -> str:
    return hashlib.sha256(seed.encode()).hexdigest()


def _utterance(**overrides):
    base = dict(
        sample_id="s1",
        corpus="ravdess",
        audio_path="/tmp/a.wav",
        label="happy",
        speaker_id="ravdess:01",
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
        _utterance(sample_id="a", normalized_audio_sha256=_digest("x"), split="train"),
        _utterance(sample_id="b", normalized_audio_sha256=_digest("x"), split="test"),  # dup digest + leakage
    ]
    report = audit_recipe(utterances, recipe)
    kinds = {issue.kind for issue in report.issues}
    assert "duplicate_samples" in kinds
    assert "speaker_leakage" in kinds
    assert report.blocking


def test_recipe_audit_corpus_scope():
    recipe = get_recipe("research-v1")
    report = audit_recipe([_utterance(corpus="not-a-corpus")], recipe)
    assert any(issue.kind == "corpus_scope" for issue in report.issues)


def test_recipe_routing_decision_table():
    from ser_tpu._internal.data.recipe import get_recipe, route_utterance

    recipe = get_recipe("research-v1")
    # Exact canonical label -> primary head; raw==label -> accepted.
    exact = route_utterance(_utterance(label="happy", raw_label="happy"), recipe)
    assert exact.disposition == "accepted" and "primary_emotion" in exact.tasks
    # Remapped raw label still reaches the primary head.
    remapped = route_utterance(_utterance(label="happy", raw_label="03"), recipe)
    assert remapped.disposition == "remapped" and "primary_emotion" in remapped.tasks
    # EmoV-DB's approximate moods stay out of the primary head.
    weak = route_utterance(
        _utterance(corpus="emov-db", label="happy", raw_label="amused"), recipe
    )
    assert weak.disposition == "weak"
    assert "primary_emotion" not in weak.tasks and "raw_emotion" in weak.tasks
    # Unknown corpus quarantines with no tasks.
    unknown = route_utterance(_utterance(corpus="nope"), recipe)
    assert unknown.disposition == "quarantined" and not unknown.tasks
    # Auxiliary-only corpus: attitude rows are accepted without primary task.
    attitude = route_utterance(
        _utterance(corpus="att-hack", label="friendly", language="fr"), recipe
    )
    assert attitude.disposition == "accepted"
    assert "attitude" in attitude.tasks and "primary_emotion" not in attitude.tasks


def test_load_dataset_recipe_json_round_trip(tmp_path):
    import json

    from ser_tpu._internal.data.recipe import load_dataset_recipe, research_recipe_v1

    built_in = load_dataset_recipe("research-v1")
    assert built_in.digest == research_recipe_v1().digest
    path = tmp_path / "recipe.json"
    path.write_text(json.dumps(built_in.to_record()), encoding="utf-8")
    loaded = load_dataset_recipe(path)
    assert loaded.digest == built_in.digest
    with pytest.raises(ValueError, match="corpora"):
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"recipe_id": "x"}), encoding="utf-8")
        load_dataset_recipe(bad)


def test_audit_dataset_recipe_ledger(tmp_path):
    from ser_tpu._internal.data.dataset_audit import (
        DatasetAuditError,
        audit_dataset_recipe,
    )
    from ser_tpu._internal.data.recipe import get_recipe

    recipe = get_recipe("research-v1")
    rows = [
        _utterance(
            sample_id=f"s{i}",
            normalized_audio_sha256=_digest(f"h{i}"),
            dataset_revision="r1",
            speaker_id=f"ravdess:spk{i % 4}",
            # Every speaker carries both classes so the strict two-class
            # check holds for ANY grouped split assignment.
            label="happy" if i < 4 else "sad",
        )
        for i in range(8)
    ] + [
        _utterance(
            sample_id="alien",
            corpus="not-a-corpus",
            normalized_audio_sha256=_digest("hx"),
            dataset_revision="r1",
        )
    ]
    report = audit_dataset_recipe(rows, recipe=recipe, seed=7, strict=True)
    assert report.recipe_id == "cross-domain-common"
    by_id = {entry.sample_id: entry for entry in report.ledger}
    assert by_id["alien"].split == "quarantined"
    assert by_id["alien"].disposition == "quarantined"
    assert all(
        by_id[f"s{i}"].split in ("train", "dev", "test") for i in range(8)
    )
    assert report.counters["quarantined"] == 1
    # Duplicate content is rejected in strict mode.
    dup = rows + [_utterance(sample_id="dup", normalized_audio_sha256=_digest("h0"), dataset_revision="r1")]
    with pytest.raises(DatasetAuditError, match="[Dd]uplicate"):
        audit_dataset_recipe(dup, recipe=recipe, seed=7, strict=True)


def test_apply_recipe_ledger_reassigns_splits(tmp_path):
    import dataclasses

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.data.loader import apply_recipe_ledger

    settings = build_settings_from_inputs(capture_settings_inputs(env={}))
    settings = dataclasses.replace(
        settings,
        dataset=dataclasses.replace(
            settings.dataset, recipe="research-v1", strict_audit=False
        ),
    )
    rows = [
        _utterance(
            sample_id=f"s{i}",
            normalized_audio_sha256=_digest(f"h{i}"),
            speaker_id=f"ravdess:spk{i % 4}",
            split="train",  # ledger overrides manifest split
        )
        for i in range(8)
    ]
    kept = apply_recipe_ledger(rows, settings=settings)
    assert kept and all(u.split in ("train", "dev", "test") for u in kept)
    # Same speaker -> same split (leak-proof grouping survived reassignment).
    by_speaker = {}
    for u in kept:
        by_speaker.setdefault(u.speaker_id, set()).add(u.split)
    assert all(len(splits) == 1 for splits in by_speaker.values())


def test_apply_recipe_ledger_stamps_run_provenance(tmp_path):
    """A passed audit stamps recipe/ledger digests onto the active training
    run so artifacts carry the reference's v3 provenance fields
    (artifact_envelope.py:66-67)."""
    import dataclasses

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.data.loader import apply_recipe_ledger
    from ser_tpu._internal.models.training_orchestration import (
        training_operation_scope,
    )

    settings = build_settings_from_inputs(capture_settings_inputs(env={}))
    settings = dataclasses.replace(
        settings,
        dataset=dataclasses.replace(
            settings.dataset, recipe="research-v1", strict_audit=False
        ),
    )
    rows = [
        _utterance(sample_id=f"s{i}", normalized_audio_sha256=_digest(f"h{i}"), speaker_id=f"ravdess:spk{i % 4}")
        for i in range(8)
    ]
    with training_operation_scope("accurate") as run_state:
        assert run_state.recipe_digest is None
        apply_recipe_ledger(rows, settings=settings)
        assert run_state.recipe_digest is not None
        assert run_state.split_ledger_digest is not None
        assert len(run_state.recipe_digest) == 64
        assert len(run_state.split_ledger_digest) == 64
    # Without a recipe the loader is a pass-through and stamps nothing.
    with training_operation_scope("accurate") as run_state:
        plain = dataclasses.replace(
            settings, dataset=dataclasses.replace(settings.dataset, recipe=None)
        )
        assert apply_recipe_ledger(rows, settings=plain) is rows
        assert run_state.recipe_digest is None


def test_split_fallback_clears_stamped_provenance(tmp_path):
    """If the ledger split is NOT actually used (files outside manifest
    coverage force the speaker-disjoint fallback), the digests stamped by
    apply_recipe_ledger must be cleared — else the artifact would falsely
    claim an audited split."""
    import dataclasses

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.data.manifest import write_manifest_jsonl
    from ser_tpu._internal.models.encoder_training import _split_training_files
    from ser_tpu._internal.models.training_orchestration import (
        training_operation_scope,
    )

    rows = [
        _utterance(
            sample_id=f"s{i}",
            normalized_audio_sha256=_digest(f"h{i}"),
            speaker_id=f"ravdess:spk{i % 4}",
            audio_path=str(tmp_path / f"covered{i}.wav"),
        )
        for i in range(8)
    ]
    manifest = write_manifest_jsonl(rows, tmp_path / "m.jsonl")
    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={"SER_DATASET_MANIFESTS": str(manifest)}
        )
    )
    settings = dataclasses.replace(
        settings,
        dataset=dataclasses.replace(
            settings.dataset, recipe="research-v1", strict_audit=False
        ),
    )
    # One discovered file is OUTSIDE the manifest -> coverage check fails ->
    # speaker-disjoint fallback.
    files = [(str(tmp_path / f"covered{i}.wav"), "happy", f"spk{i % 4}") for i in range(8)]
    files.append((str(tmp_path / "rogue.wav"), "sad", "spk9"))
    with training_operation_scope("accurate") as run_state:
        _split_training_files(files=files, settings=settings)
        assert run_state.recipe_digest is None
        assert run_state.split_ledger_digest is None


def test_recipe_strict_escalates_warnings():
    recipe = get_recipe("research-v1")
    utterances = [_utterance(normalized_audio_sha256=None, speaker_id=None)]
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
