"""Differential parity: the FULL windowed execution pass, end to end.

Reference stage: ``ser/_internal/runtime/medium_execution.py:52-98`` — the
composition windows → mean+std pool → predict/proba → postprocess that turns
an encoded sequence into the InferenceResult users see. Stage-level suites
pin each piece; this suite runs the whole chain through BOTH frameworks with
the identical encoded sequence and the identical fitted sklearn model, and
asserts frame- and segment-level bitwise equality.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from ser_tpu._internal.repr.backend import EncodedSequence
from ser_tpu._internal.runtime.postprocessing import SegmentPostprocessingConfig
from ser_tpu._internal.runtime.profile_execution import run_windowed_inference_once

LABELS = ["angry", "calm", "happy", "sad"]


@pytest.fixture(scope="module")
def fitted_model():
    from sklearn.neural_network import MLPClassifier

    rng = np.random.default_rng(0)
    dim = 16  # pooled dim = 2 * 8-dim embeddings
    x = rng.standard_normal((64, dim))
    y = [LABELS[i % len(LABELS)] for i in range(64)]
    for i, label in enumerate(y):
        x[i, LABELS.index(label)] += 2.5
    return MLPClassifier(hidden_layer_sizes=(8,), max_iter=300, random_state=42).fit(
        x, y
    )


class _InjectedBackend:
    """FeatureBackend double returning one pinned encoded sequence."""

    backend_id = "jax_xlsr"

    def __init__(self, encoded: EncodedSequence):
        self._encoded = encoded
        self.feature_dim = int(encoded.embeddings.shape[1])

    def encode_sequence(self, audio, sample_rate):
        return self._encoded


@st.composite
def encoded_sequences(draw):
    frames = draw(st.integers(min_value=2, max_value=40))
    stride = draw(st.sampled_from([0.25, 0.5, 1.0]))
    seed = draw(st.integers(min_value=0, max_value=9999))
    rng = np.random.default_rng(seed)
    starts = np.arange(frames) * stride
    ends = starts + stride
    embeddings = rng.standard_normal((frames, 8)).astype(np.float32)
    window_size = draw(st.sampled_from([0.5, 1.0, 2.0]))
    window_stride = draw(st.sampled_from([0.5, 1.0]))
    smoothing = draw(st.sampled_from([1, 3, 5]))
    return embeddings, starts, ends, window_size, window_stride, smoothing


@hyp_settings(max_examples=40, deadline=None)
@given(inputs=encoded_sequences())
def test_full_execution_pass_parity(oracle, fitted_model, inputs):
    embeddings, starts, ends, window_size, window_stride, smoothing = inputs
    enter, exit_, min_segment = 0.60, 0.45, 0.40

    theirs = oracle.call(
        "medium_inference_once",
        embeddings=embeddings,
        frame_starts=starts,
        frame_ends=ends,
        backend_id="hf_xlsr",
        window_size=window_size,
        window_stride=window_stride,
        smoothing=smoothing,
        enter=enter,
        exit=exit_,
        min_segment=min_segment,
        model=fitted_model,
        expected_feature_size=16,
    )

    encoded = EncodedSequence(
        embeddings=embeddings,
        frame_start_seconds=starts.astype(np.float64),
        frame_end_seconds=ends.astype(np.float64),
        backend_id="jax_xlsr",
    )
    ours = run_windowed_inference_once(
        audio=np.zeros(16000, dtype=np.float32),
        sample_rate=16000,
        backend=_InjectedBackend(encoded),
        model=fitted_model,
        pool_window_size_seconds=window_size,
        pool_window_stride_seconds=window_stride,
        pooling_strategy="mean_std",
        postprocessing_config=SegmentPostprocessingConfig(
            smoothing_window_frames=smoothing,
            hysteresis_enter_confidence=enter,
            hysteresis_exit_confidence=exit_,
            min_segment_duration_seconds=min_segment,
        ),
        output_schema_version=theirs["schema_version"],
        expected_feature_size=16,
    )

    ours_frames = [
        (f.start_seconds, f.end_seconds, f.emotion, f.confidence, f.probabilities)
        for f in ours.frames
    ]
    assert ours_frames == [tuple(f) for f in theirs["frames"]]
    ours_segments = [
        (s.start_seconds, s.end_seconds, s.emotion, s.confidence, s.probabilities)
        for s in ours.segments
    ]
    assert ours_segments == [tuple(s) for s in theirs["segments"]]
