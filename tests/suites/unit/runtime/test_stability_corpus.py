"""Stability-corpus evidence: long transition clips + gate routing.

VERDICT r04 weak #1: with every synthetic clip at 3.2 s, each candidate
emitted exactly one segment per clip and the stability metrics collapsed to
the constants 18.75 segments/min and median 3.2 s — the thresholds
(reference ``profile_quality_gate.py:412-491``) could never fail. These
tests pin the two fixes: (a) the long-transition stability corpus genuinely
contains scripted emotion changes, and (b) ``evaluate_candidate_gate``
measures stability on the PASSED corpus, not the training clips.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).resolve().parents[4] / "scripts"
sys.path.insert(0, str(SCRIPTS))

from build_synthetic_ravdess_dataset import (  # noqa: E402
    build_stability_corpus,
    synthesize_clip,
    synthesize_transition_clip,
)

from ser_tpu.runtime.schema import InferenceResult, SegmentPrediction


def _spectral_centroid_track(clip: np.ndarray, sr: int, win: float = 1.0):
    """Per-second spectral centroid (coarse pitch-structure trace)."""
    n = int(win * sr)
    centroids = []
    for start in range(0, clip.size - n, n):
        spectrum = np.abs(np.fft.rfft(clip[start : start + n]))
        freqs = np.fft.rfftfreq(n, 1.0 / sr)
        centroids.append(float((spectrum * freqs).sum() / max(spectrum.sum(), 1e-9)))
    return np.asarray(centroids)


def test_transition_clip_has_scripted_emotion_changes():
    """The long clip's spectral structure must actually CHANGE mid-clip —
    otherwise it is just a longer constant tone and stability metrics
    collapse again."""
    sr = 16000
    long_clip = synthesize_transition_clip("03", 7, sr, 45.0, actor=1)
    plain = synthesize_clip("03", 7, sr, 45.0, hard=True, actor=1)
    assert long_clip.shape == plain.shape == (45 * sr,)

    track_long = _spectral_centroid_track(long_clip, sr)
    track_plain = _spectral_centroid_track(plain, sr)
    # The transition clip's centroid varies across spans far more than the
    # single-emotion clip's (which only has tremolo/noise variation).
    assert np.std(track_long) > 2.0 * np.std(track_plain)


def test_transition_clip_deterministic():
    a = synthesize_transition_clip("05", 11, 16000, 30.0, actor=2)
    b = synthesize_transition_clip("05", 11, 16000, 30.0, actor=2)
    np.testing.assert_array_equal(a, b)


def test_build_stability_corpus_names_carry_dominant_label(tmp_path):
    files = build_stability_corpus(tmp_path, actors=2, seconds=30.0)
    assert len(files) == 8
    codes = {f.name.split("-")[2] for f in files}
    assert codes == {"03", "04", "05", "08"}
    for f in files:
        assert f.exists() and f.stat().st_size > 30 * 16000  # >1 byte/sample


def test_evaluate_candidate_gate_measures_passed_stability_corpus(
    tmp_path, monkeypatch
):
    """The hook must be driven with the stability corpus paths; the decision
    must carry stability computed from THOSE segments (here: a churning
    candidate that the gate HOLDs on stability grounds)."""
    import ser_tpu._internal.runtime.quality_gate_workflow as wf
    from ser_tpu._internal.data import loader as loader_mod
    from ser_tpu._internal.repr import encode_util, encoders
    from ser_tpu._internal.repr.backend import EncodedSequence
    from ser_tpu._internal.runtime import backend_hooks as hooks_mod
    from ser_tpu._internal.runtime.quality_gate import ProfileEvaluation
    from ser_tpu._internal.utils import audio_io
    from ser_tpu.config import reload_settings

    monkeypatch.setenv("SER_DATASET_FOLDER", str(tmp_path / "ds"))
    monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
    settings = reload_settings()

    class FakeClip:
        def __init__(self, i):
            self.label = "happy" if i % 2 else "sad"
            self.speaker_id = f"spk{i % 4}"
            self.file_path = str(tmp_path / f"clip{i}.wav")
            self.features = np.full(4, float(i), dtype=np.float64)

    clips = [FakeClip(i) for i in range(8)]
    monkeypatch.setattr(
        loader_mod, "load_labeled_clips", lambda *, settings: clips
    )
    monkeypatch.setattr(
        audio_io,
        "read_audio_file",
        lambda path, audio_read_config=None: (np.zeros(16000, np.float32), 16000),
    )
    monkeypatch.setattr(encoders, "build_encoder_backend", lambda *a, **k: object())

    def fake_encode_clips(backend, decoded):
        for _ in decoded:
            frames = 4
            yield EncodedSequence(
                embeddings=np.random.default_rng(0)
                .standard_normal((frames, 3))
                .astype(np.float32),
                frame_start_seconds=np.arange(frames, dtype=np.float64) * 0.25,
                frame_end_seconds=(np.arange(frames, dtype=np.float64) + 1) * 0.25,
                backend_id="jax_xlsr",
            )

    monkeypatch.setattr(encode_util, "encode_clips", fake_encode_clips)
    monkeypatch.setattr(
        wf,
        "evaluate_head_cross_folds",
        lambda *a, **k: ProfileEvaluation(
            profile=k.get("profile", "x"), uar=0.9, macro_f1=0.9, folds=2
        ),
    )

    requested: list[str] = []

    def churn_hook(request):
        requested.append(request.file_path)
        # 40 segments of 0.5 s over a 20 s span → 120 segments/min,
        # median 0.5 s — both thresholds violated.
        segments = tuple(
            SegmentPrediction(
                emotion="happy" if i % 2 else "sad",
                start_seconds=i * 0.5,
                end_seconds=(i + 1) * 0.5,
                confidence=0.9,
            )
            for i in range(40)
        )
        return InferenceResult(schema_version="v1", frames=[], segments=list(segments))

    monkeypatch.setattr(
        hooks_mod, "build_backend_hooks", lambda settings: {"jax_xlsr": churn_hook}
    )

    stability_corpus = [
        (str(tmp_path / "long0.wav"), "happy"),
        (str(tmp_path / "long1.wav"), "sad"),
    ]
    decision = wf.evaluate_candidate_gate(
        settings=settings,
        candidate="medium",
        folds=2,
        stability_corpus=stability_corpus,
    )

    # The hook saw exactly the stability corpus, not the training clips.
    assert requested == [path for path, _ in stability_corpus]
    assert decision.candidate_stability is not None
    assert decision.candidate_stability.segments_per_minute > 25.0
    assert decision.candidate_stability.median_segment_duration_seconds < 2.5
    # And the churn HOLDs the gate on stability grounds.
    assert not decision.promote
    assert any("segments/min" in reason for reason in decision.reasons)
