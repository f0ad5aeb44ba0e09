"""Every catalog dataset prepares from a staged local tree (VERDICT #7)."""

import numpy as np
import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.data import strategies
from ser_tpu._internal.data.catalog import list_dataset_ids
from ser_tpu._internal.data.prepare import prepare_dataset
from ser_tpu._internal.utils.audio_io import write_wav


def _settings(tmp_path, extra_env=None):
    env = {
        "SER_TMP_FOLDER": str(tmp_path / "tmp"),
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
    }
    if extra_env:
        env.update(extra_env)
    return build_settings_from_inputs(capture_settings_inputs(env=env))


#: Corpora whose native label schema sits outside the 8 primaries; preparing
#: them needs a widened SER_ALLOWED_LABELS, exactly as the reference's global
#: ontology requires (label_ontology.py:20-30 derives allowed labels from the
#: emotion map unless overridden).
_EXTENDED_ONTOLOGY_ENV = {
    "att-hack": "friendly,distant,dominant,seductive",
    "coraa-ser": "neutral,non_neutral_female,non_neutral_male",
}


def _wav(path):
    path.parent.mkdir(parents=True, exist_ok=True)
    tone = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)).astype(np.float32)
    write_wav(path, tone, 16000)


#: dataset_id → (relative wav paths, expected label of the FIRST file).
_STAGED_TREES: dict[str, tuple[list[str], str]] = {
    "ravdess": (["Actor_01/03-01-05-01-01-01-01.wav"], "angry"),
    "crema-d": (["AudioWAV/1001_DFA_ANG_XX.wav"], "angry"),
    "emodb-2.0": (["wav/03a01Fa.wav"], "happy"),
    "jl-corpus": (["female1_angry_1a_1.wav"], "angry"),
    "mesd": (["Anger_F_A_word.wav"], "angry"),
    "escorpus-pe": (["speaker1/clip-05-05-03.wav"], "happy"),
    "spanish-meacorpus-2023": (["alegría/clip_001.wav"], "happy"),
    "cafe": (["Colère/01-C-1-1.wav"], "angry"),
    "oreau-french-esd": (["joie/f1_phrase1.wav"], "happy"),
    "att-hack": (["F01-friendly-001.wav"], "friendly"),
    "asvp-esd": (["happy/actor_12_clip.wav"], "happy"),
    "emov-db": (["amused_1-15_0001.wav"], "happy"),
    "pavoque": (["angry/pavoque_000.wav"], "angry"),
    "coraa-ser": (["neutral_001.wav", "non_neutral_female_002.wav"], "neutral"),
}

#: Corpora whose labels ship as annotation CSVs (no filename convention).
_CSV_ONLY = {"msp-podcast": "en", "biic-podcast": "zh"}


def test_every_catalog_id_has_a_strategy_or_ravdess_builder():
    assert set(list_dataset_ids()) == set(_STAGED_TREES) | set(_CSV_ONLY)
    for dataset_id in list_dataset_ids():
        if dataset_id == "ravdess":
            continue
        strategies.get_strategy(dataset_id)  # must resolve


@pytest.mark.parametrize("dataset_id", sorted(_STAGED_TREES))
def test_prepare_from_staged_tree(tmp_path, dataset_id):
    files, expected_label = _STAGED_TREES[dataset_id]
    root = tmp_path / dataset_id
    for rel in files:
        _wav(root / rel)
    allowed = _EXTENDED_ONTOLOGY_ENV.get(dataset_id)
    result = prepare_dataset(
        dataset_id=dataset_id,
        dataset_root=root,
        skip_download=True,
        settings=_settings(
            tmp_path, {"SER_ALLOWED_LABELS": allowed} if allowed else None
        ),
    )
    assert result.utterance_count == len(files)
    import json

    rows = [
        json.loads(line)
        for line in open(result.manifest_path, encoding="utf-8")
        if line.strip() and not line.startswith('{"manifest_schema_version"')
    ]
    labeled = [r for r in rows if "label" in r]
    assert labeled[0]["label"] == expected_label
    assert labeled[0]["corpus"] == dataset_id


def test_default_ontology_drops_extended_labels_on_prepare(tmp_path):
    """Without SER_ALLOWED_LABELS the global ontology is the 8 primaries and
    att-hack's attitude labels are dropped at prepare time (reference applies
    one resolve_label_ontology(settings) to every strategy,
    application/prepare.py:76)."""
    root = tmp_path / "att-hack"
    _wav(root / "F01-friendly-001.wav")
    with pytest.raises(RuntimeError, match="No labeled utterances"):
        prepare_dataset(
            dataset_id="att-hack",
            dataset_root=root,
            skip_download=True,
            settings=_settings(tmp_path),
        )


@pytest.mark.parametrize("dataset_id", sorted(_CSV_ONLY))
def test_csv_only_corpora_prepare_via_generated_labels_csv(tmp_path, dataset_id):
    root = tmp_path / dataset_id
    _wav(root / "audio" / "seg_0001.wav")
    (root / "labels.csv").write_text(
        "FileName,emotion\naudio/seg_0001.wav,happy\n", encoding="utf-8"
    )
    result = prepare_dataset(
        dataset_id=dataset_id,
        dataset_root=root,
        skip_download=True,
        settings=_settings(tmp_path),
    )
    assert result.utterance_count == 1


@pytest.mark.parametrize("dataset_id", sorted(_CSV_ONLY))
def test_csv_only_corpora_error_names_the_gap(tmp_path, dataset_id):
    root = tmp_path / dataset_id
    _wav(root / "audio" / "seg_0001.wav")
    with pytest.raises(ValueError, match="labels"):
        prepare_dataset(
            dataset_id=dataset_id,
            dataset_root=root,
            skip_download=True,
            settings=_settings(tmp_path),
        )


def test_escorpus_vad_quadrants():
    from pathlib import Path

    cases = {
        "x-05-05-03": "happy",
        "x-01-05-04": "angry",
        "x-01-05-01": "fearful",
        "x-01-01-03": "sad",
        "x-03-05-03": "surprised",
        "x-02-03-03": "disgust",
        "x-03-03-03": "neutral",
    }
    for stem, expected in cases.items():
        label, raw = strategies.escorpus_pe_label(Path(f"{stem}.wav"))
        assert label == expected, stem
        assert raw.startswith("vad:")


def test_token_labels_strip_accents_and_scan_parents():
    from pathlib import Path

    assert strategies.token_label(Path("Colère/clip.wav")) == ("angry", "colere")
    assert strategies.token_label(Path("alegría/x.wav")) == ("happy", "alegria")
    assert strategies.token_label(Path("nothing/here.wav")) is None


def test_generated_labels_csv_synonyms_are_canonicalized(tmp_path):
    root = tmp_path / "mesd"
    _wav(root / "clip1.wav")
    (root / "labels.csv").write_text(
        "FileName,emotion\nclip1.wav,anger\n", encoding="utf-8"
    )
    result = prepare_dataset(
        dataset_id="mesd", dataset_root=root, skip_download=True, settings=_settings(tmp_path)
    )
    assert result.utterance_count == 1
    import json

    rows = [json.loads(l) for l in open(result.manifest_path, encoding="utf-8")]
    assert any(r.get("label") == "angry" and r.get("raw_label") == "anger" for r in rows)


def test_emotion_word_outside_corpus_root_cannot_label(tmp_path):
    """Labels resolve from the path RELATIVE to the staged root — an emotion
    word in an ancestor directory must not relabel the corpus."""
    from ser_tpu._internal.data.strategies import get_strategy

    root = tmp_path / "happy-lab" / "cafe"
    (root / "colere").mkdir(parents=True)
    (root / "colere" / "042.wav").write_bytes(b"RIFF")
    utterances = get_strategy("cafe").build(root)
    assert [u.label for u in utterances] == ["angry"]  # colere, NOT 'happy'


def test_emodb_strategy_keeps_adapter_speaker(tmp_path):
    from ser_tpu._internal.data.strategies import get_strategy

    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    (wav_dir / "03a01Fa.wav").write_bytes(b"RIFF")
    (wav_dir / "16b10Wb.wav").write_bytes(b"RIFF")
    utterances = get_strategy("emodb-2.0").build(tmp_path)
    assert sorted(u.speaker_id for u in utterances) == ["emodb-2.0:03", "emodb-2.0:16"]


def test_get_strategy_ravdess_names_the_builtin_route():
    import pytest

    from ser_tpu._internal.data.strategies import get_strategy

    with pytest.raises(KeyError, match="built-in RAVDESS preparer"):
        get_strategy("ravdess")
