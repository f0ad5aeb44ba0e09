"""Differential parity: recipe digest, task routing, and the split-ledger audit.

Reference stages: ``ser/_internal/data/recipe.py:118-249`` (canonical recipe
record digest + ``route_utterance`` decision table) and
``ser/_internal/data/dataset_audit.py:159-313`` (content dedupe, union-find
identity grouping, deterministic grouped split assignment, partition
isolation, strict class checks). The ledger decides what trains and where —
sample-for-sample split/disposition/task parity is the contract.
"""

from __future__ import annotations

from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from ser_tpu._internal.data.dataset_audit import (
    DatasetAuditError,
    audit_dataset_recipe,
)
from ser_tpu._internal.data.manifest import Utterance, VadTarget
from ser_tpu._internal.data.recipe import (
    research_recipe_v1,
    route_utterance,
)

#: Corpora that exercise every policy shape: exact-primary, exact+approximate,
#: auxiliary-only, and out-of-recipe.
CORPORA = ["ravdess", "emov-db", "att-hack", "escorpus-pe", "pavoque", "off-recipe"]
LABELS = [None, "happy", "sad", "angry", "neutral"]
RAW_LABELS = [None, "happy", "amused", "boredom", "03"]
LANGUAGES = [None, "en", "fr"]


def _ours(item: dict) -> Utterance:
    vad = item.get("vad")
    return Utterance(
        sample_id=item["sample_id"],
        corpus=item["corpus"],
        audio_path=item.get("audio_path", "/tmp/a.wav"),
        label=item.get("label"),
        raw_label=item.get("raw_label") or "",
        vad=(
            VadTarget(valence=vad[0], arousal=vad[1], dominance=vad[2])
            if vad
            else None
        ),
        social_attitude=item.get("social_attitude"),
        binary_affect=item.get("binary_affect"),
        transcript=item.get("transcript"),
        speaker_id=item.get("speaker_id"),
        session_id=item.get("session_id"),
        language=item.get("language"),
        split=item.get("split"),
        native_split=item.get("native_split"),
        normalized_audio_sha256=item.get("audio_sha256"),
        dataset_revision=item.get("revision"),
    )


def test_recipe_digest_parity(oracle):
    theirs = oracle.call("recipe_digest")
    recipe = research_recipe_v1()
    assert recipe.recipe_id == theirs["recipe_id"]
    assert recipe.revision == theirs["revision"]
    assert recipe.ontology_version == theirs["ontology_version"]
    assert recipe.to_record() == theirs["record"]
    assert recipe.digest == theirs["digest"]


def test_plan_recipe_content_digest_parity(oracle, tmp_path):
    """Prepared-plan recipe CONTENT digest bit-matches the reference's
    ``_recipe_digest`` (``training_orchestration.py:183-190``) for the unset
    knob, a bare built-in id, and a recipe FILE (content, not path)."""
    import dataclasses

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.models.training_readiness import recipe_content_digest

    base = build_settings_from_inputs(capture_settings_inputs(env={}))
    recipe_file = tmp_path / "recipe.json"
    recipe_file.write_text(
        '{"recipe_id": "custom", "corpora": []}\n', encoding="utf-8"
    )
    for knob in (None, "research-v1", str(recipe_file)):
        ours = recipe_content_digest(
            dataclasses.replace(
                base, dataset=dataclasses.replace(base.dataset, recipe=knob)
            )
        )
        assert ours == oracle.call("plan_recipe_digest", recipe=knob), knob


@st.composite
def routing_samples(draw):
    count = draw(st.integers(min_value=1, max_value=24))
    samples = []
    for index in range(count):
        samples.append(
            {
                "sample_id": f"s{index:03d}",
                "corpus": draw(st.sampled_from(CORPORA)),
                "label": draw(st.sampled_from(LABELS)),
                "raw_label": draw(st.sampled_from(RAW_LABELS)),
                "vad": draw(
                    st.one_of(
                        st.none(),
                        st.tuples(
                            st.floats(-1, 1, allow_nan=False),
                            st.floats(-1, 1, allow_nan=False),
                            st.floats(-1, 1, allow_nan=False),
                        ),
                    )
                ),
                "social_attitude": draw(st.sampled_from([None, "friendly"])),
                "binary_affect": draw(st.sampled_from([None, "non_neutral"])),
                "transcript": draw(st.sampled_from([None, "kids are talking"])),
                "language": draw(st.sampled_from(LANGUAGES)),
            }
        )
    return samples


@hyp_settings(max_examples=60, deadline=None)
@given(samples=routing_samples())
def test_route_utterance_parity(oracle, samples):
    theirs = oracle.call("route_utterance", samples=samples)
    recipe = research_recipe_v1()
    for item, expected in zip(samples, theirs, strict=True):
        routed = route_utterance(_ours(item), recipe)
        got = {
            "sample_id": item["sample_id"],
            "disposition": routed.disposition,
            "tasks": sorted(routed.tasks),
            "reason": routed.reason,
        }
        assert got == expected, f"routing diverged for {item}"


@st.composite
def audit_samples(draw):
    count = draw(st.integers(min_value=3, max_value=32))
    native = draw(st.booleans())
    hash_pool = [f"hash{i:02d}" for i in range(count + 4)]
    samples = []
    for index in range(count):
        corpus = draw(st.sampled_from(["ravdess", "emov-db", "att-hack", "off-recipe"]))
        label = draw(st.sampled_from(["happy", "sad", "angry", None]))
        samples.append(
            {
                "sample_id": f"s{index:03d}",
                "corpus": corpus,
                "label": label,
                "raw_label": label,
                "language": "en",
                "speaker_id": draw(
                    st.sampled_from([None, f"spk{index % 5}", f"spk{index % 3}"])
                ),
                "session_id": draw(st.sampled_from([None, f"sess{index % 4}"])),
                # Occasional shared hash exercises content-duplicate quarantine.
                "audio_sha256": draw(st.sampled_from(hash_pool[: count // 2 + 2])),
                "revision": "rev-1",
                "native_split": (
                    ("train", "dev", "test")[index % 3] if native else None
                ),
            }
        )
    seed = draw(st.integers(min_value=0, max_value=999))
    return samples, seed


@hyp_settings(max_examples=40, deadline=None)
@given(inputs=audit_samples())
def test_audit_dataset_recipe_parity(oracle, inputs):
    samples, seed = inputs
    recipe = research_recipe_v1()
    rows = [_ours(item) for item in samples]

    try:
        theirs = oracle.call(
            "audit_dataset_recipe", samples=samples, seed=seed, strict=False
        )
        their_error = None
    except Exception as err:  # noqa: BLE001 - error parity asserted below
        theirs, their_error = None, type(err).__name__

    if their_error is not None:
        try:
            audit_dataset_recipe(rows, recipe=recipe, seed=seed, strict=False)
        except DatasetAuditError:
            return
        raise AssertionError(
            f"reference raised ({their_error}) but the repo audit passed"
        )

    report = audit_dataset_recipe(rows, recipe=recipe, seed=seed, strict=False)
    ours = {
        entry.sample_id: {
            "split": entry.split,
            "group_id": entry.group_id,
            "tasks": sorted(entry.tasks),
            "disposition": entry.disposition,
            "reason": entry.reason,
        }
        for entry in report.ledger
    }
    for expected in theirs["ledger"]:
        got = ours[expected["sample_id"]]
        expected_view = {
            "split": expected["split"],
            "group_id": expected["group_id"],
            "tasks": sorted(expected["tasks"]),
            "disposition": expected["disposition"],
            "reason": (
                # Our duplicate-quarantine reason string names our field.
                "duplicate_normalized_audio"
                if expected["reason"] == "duplicate_normalized_audio"
                else expected["reason"]
            ),
        }
        assert got == expected_view, f"ledger diverged for {expected['sample_id']}"
    assert dict(report.counters) == theirs["counters"]


@hyp_settings(max_examples=20, deadline=None)
@given(inputs=audit_samples())
def test_audit_strict_error_parity(oracle, inputs):
    """Strict mode must reject exactly the same manifest sets."""
    samples, seed = inputs
    recipe = research_recipe_v1()
    rows = [_ours(item) for item in samples]

    their_error = None
    try:
        oracle.call("audit_dataset_recipe", samples=samples, seed=seed, strict=True)
    except Exception as err:  # noqa: BLE001
        their_error = type(err).__name__

    our_error = None
    try:
        audit_dataset_recipe(rows, recipe=recipe, seed=seed, strict=True)
    except DatasetAuditError:
        our_error = "DatasetAuditError"

    assert (their_error is None) == (our_error is None), (
        f"strict divergence: theirs={their_error} ours={our_error}"
    )
