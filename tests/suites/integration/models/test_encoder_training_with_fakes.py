"""Encoder-profile training through an injected tiny backend (designed seam)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[4] / "scripts"))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.repr.backend import EncodedSequence


class TinyDspBackend:
    """Deterministic fake encoder: 20 ms frames of simple spectral stats."""

    backend_id = "jax_xlsr"
    feature_dim = 4

    def encode_sequence(self, audio, sample_rate):
        hop = int(0.02 * sample_rate)
        n = max(1, audio.size // hop)
        frames = audio[: n * hop].reshape(n, hop)
        # Cheap separable stats: energy, mean, zero-cross rate, absmax.
        emb = np.stack(
            [
                (frames**2).mean(axis=1),
                frames.mean(axis=1),
                (np.diff(np.sign(frames), axis=1) != 0).mean(axis=1),
                np.abs(frames).max(axis=1),
            ],
            axis=1,
        ).astype(np.float32)
        starts = np.arange(n, dtype=np.float64) * 0.02
        return EncodedSequence(
            embeddings=emb,
            frame_start_seconds=starts,
            frame_end_seconds=starts + 0.02,
            backend_id=self.backend_id,
        )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("enc_train")
    build_dataset(root / "ds", actors=2, repetitions=2, seconds=2.2)
    return root


def test_medium_training_with_injected_backend(corpus):
    import dataclasses

    from ser_tpu._internal.models.encoder_training import train_encoder_profile_model

    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(corpus / "ds"),
                "SER_MODELS_FOLDER": str(corpus / "models"),
                "SER_TMP_FOLDER": str(corpus / "tmp"),
            }
        )
    )
    settings = dataclasses.replace(
        settings, nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(32,), max_iter=120)
    )
    report = train_encoder_profile_model(
        profile="medium", settings=settings, backend=TinyDspBackend()
    )
    assert report["backend_id"] == "jax_xlsr"
    assert report["feature_vector_size"] == 8  # mean+std of 4 dims
    assert report["grouped"]["samples_evaluated"] >= 2
    assert Path(report["model_path"]).exists()
    # Artifact metadata carries backend/model identity for compat filtering.
    from ser_tpu._internal.models.artifacts import load_model_artifact

    loaded = load_model_artifact(report["model_path"], expected_backend_id="jax_xlsr")
    assert loaded.artifact_metadata["pooling_strategy"] == "mean_std"
    assert loaded.artifact_metadata["backend_model_id"] == "facebook/wav2vec2-xls-r-300m"


def test_noise_controls_drop_low_variance_windows(corpus):
    import dataclasses

    from ser_tpu._internal.models.encoder_training import train_encoder_profile_model

    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(corpus / "ds"),
                "SER_MODELS_FOLDER": str(corpus / "models2"),
                "SER_TMP_FOLDER": str(corpus / "tmp2"),
            }
        )
    )
    settings = dataclasses.replace(
        settings,
        nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(16,), max_iter=40),
        medium_training=dataclasses.replace(
            settings.medium_training, max_windows_per_clip=1
        ),
    )
    report = train_encoder_profile_model(
        profile="medium", settings=settings, backend=TinyDspBackend()
    )
    # One window per clip → training windows == number of train clips.
    assert report["training_windows"] <= 32


def test_training_stamps_the_resolved_model_override(corpus):
    """With SER_MEDIUM_MODEL_ID overridden, the artifact must record the
    OVERRIDE id — stamping the catalog default made the just-trained
    artifact fail its own load-time model-id compat check, and keyed the
    embedding cache on the wrong model."""
    import dataclasses

    from ser_tpu._internal.models.artifacts import load_model_artifact
    from ser_tpu._internal.models.encoder_training import train_encoder_profile_model

    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(corpus / "ds"),
                "SER_MODELS_FOLDER": str(corpus / "models"),
                "SER_TMP_FOLDER": str(corpus / "tmp"),
                "SER_MEDIUM_MODEL_ID": "my-org/custom-xlsr",
            }
        )
    )
    settings = dataclasses.replace(
        settings, nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(16,), max_iter=60)
    )
    report = train_encoder_profile_model(
        profile="medium", settings=settings, backend=TinyDspBackend()
    )
    assert report["backend_model_id"] == "my-org/custom-xlsr"
    loaded = load_model_artifact(
        report["model_path"],
        expected_backend_id="jax_xlsr",
        expected_model_id="my-org/custom-xlsr",
    )
    assert loaded.artifact_metadata["backend_model_id"] == "my-org/custom-xlsr"


def test_vanished_file_is_contained_mid_training(tmp_path):
    """A sample deleted between readiness and encode quarantines, not crashes.

    Reference semantics: training-time containment via classify_failure +
    budget-enforced quarantine (training_orchestration.py:715-790); the
    training report records the containment audit trail.
    """
    import dataclasses

    from ser_tpu._internal.models.encoder_training import train_encoder_profile_model

    build_dataset(tmp_path / "ds", actors=2, repetitions=2, seconds=2.2)
    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(tmp_path / "ds"),
                "SER_MODELS_FOLDER": str(tmp_path / "models"),
                "SER_TMP_FOLDER": str(tmp_path / "tmp"),
                "SER_DATA_LOADER_MAX_FAILED_FILE_RATIO": "0.5",
            }
        )
    )
    settings = dataclasses.replace(
        settings, nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(16,), max_iter=60)
    )

    # Delete one clip at the narrowest possible window: after discovery and
    # split, right before its own decode inside the windowed-dataset loop.
    victim: list[str] = []
    from ser_tpu._internal.models import encoder_training as et

    real_read = et.read_audio_file

    def vanish_then_read(path, **kwargs):
        if not victim:
            Path(path).unlink()
            victim.append(str(path))
        return real_read(path, **kwargs)

    import unittest.mock as mock

    with mock.patch.object(et, "read_audio_file", side_effect=vanish_then_read):
        report = train_encoder_profile_model(
            profile="medium", settings=settings, backend=TinyDspBackend()
        )
    assert victim
    assert report["containment"].get("sample:sample_audio_missing:quarantine") == 1
    assert report["quarantined_mid_training"] == victim
