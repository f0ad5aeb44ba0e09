"""Per-dataset filename adapter tests."""

from pathlib import Path

import pytest

from ser_tpu._internal.data.adapters import (
    parse_crema_d,
    parse_emodb,
    parse_jl_corpus,
)


def test_crema_d_parsing():
    utterance = parse_crema_d(Path("/d/1001_DFA_ANG_XX.wav"))
    assert utterance is not None
    assert utterance.label == "angry"
    assert utterance.speaker_id == "crema-d:1001"
    assert utterance.corpus == "crema-d"
    assert parse_crema_d(Path("/d/1001_DFA_ZZZ_XX.wav")) is None
    assert parse_crema_d(Path("/d/malformed.wav")) is None


def test_emodb_parsing():
    utterance = parse_emodb(Path("/d/03a01Fa.wav"))
    assert utterance is not None
    assert utterance.label == "happy"
    assert utterance.speaker_id == "emodb-2.0:03"
    assert utterance.language == "de"
    assert parse_emodb(Path("/d/03a01Wa.wav")).label == "angry"
    # Boredom maps to neutral like the reference catalog (not calm).
    assert parse_emodb(Path("/d/03a01La.wav")).label == "neutral"
    assert parse_emodb(Path("/d/x.wav")) is None


def test_jl_corpus_parsing():
    utterance = parse_jl_corpus(Path("/d/female1_angry_1a_1.wav"))
    assert utterance is not None
    assert utterance.label == "angry"
    assert utterance.speaker_id == "jl-corpus:female1"
    assert parse_jl_corpus(Path("/d/male2_excited_2b_1.wav")).label == "surprised"


def test_strategy_build_walks_tree_and_keeps_adapter_speaker(tmp_path):
    from ser_tpu._internal.data.strategies import get_strategy

    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "1001_DFA_HAP_XX.wav").write_bytes(b"RIFF")
    (tmp_path / "1002_IEO_SAD_LO.wav").write_bytes(b"RIFF")
    (tmp_path / "notes.txt").write_text("ignore")
    utterances = get_strategy("crema-d").build(tmp_path)
    assert sorted(u.label for u in utterances) == ["happy", "sad"]
    assert sorted(u.speaker_id for u in utterances) == ["crema-d:1001", "crema-d:1002"]
    utterances[0].validate()


def test_csv_only_strategy_raises(tmp_path):
    from ser_tpu._internal.data.strategies import get_strategy

    with pytest.raises(ValueError, match="labels_csv_path"):
        get_strategy("msp-podcast").build(tmp_path)


def test_prepare_dataset_uses_adapter(tmp_path):
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.data.prepare import prepare_dataset

    root = tmp_path / "crema"
    root.mkdir()
    (root / "1001_DFA_NEU_XX.wav").write_bytes(b"RIFF")
    settings = build_settings_from_inputs(capture_settings_inputs(env={}))
    result = prepare_dataset(
        dataset_id="crema-d",
        dataset_root=root,
        skip_download=True,
        settings=settings,
    )
    assert result.utterance_count == 1
    assert Path(result.manifest_path).exists()
