"""Differential parity: transcript text metrics (WER, tokens, percentiles).

Reference stage: ``ser/_internal/transcription/text_metrics.py:12-62`` — WER
feeds the calibration accuracy gates and the persisted default-model
recommendation, so tokenization (punctuation as separators) and the
nearest-rank percentile convention must match exactly.
"""

from __future__ import annotations

from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from ser_tpu._internal.transcript.profiling import (
    _normalize_words,
    nearest_rank_percentile,
    word_error_rate,
)

#: Adversarial vocabulary: punctuation-in-word, unicode, digits, casing.
WORDS = [
    "kids",
    "are",
    "talking",
    "door's",
    "DOGS",
    "e-mail",
    "café",
    "3rd",
    "...",
    "a,b",
    "it's",
    "",
]


@st.composite
def texts(draw):
    count = draw(st.integers(min_value=0, max_value=12))
    return " ".join(draw(st.sampled_from(WORDS)) for _ in range(count))


@hyp_settings(max_examples=80, deadline=None)
@given(reference=texts(), hypothesis=texts())
def test_wer_and_tokens_parity(oracle, reference, hypothesis):
    theirs = oracle.call(
        "text_metrics",
        texts=[reference, hypothesis],
        pairs=[(reference, hypothesis), (hypothesis, reference)],
    )
    assert _normalize_words(reference) == theirs["tokens"][0]
    assert _normalize_words(hypothesis) == theirs["tokens"][1]
    assert word_error_rate(reference, hypothesis) == theirs["wer"][0]
    assert word_error_rate(hypothesis, reference) == theirs["wer"][1]


@hyp_settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False), max_size=24
    ),
    fraction=st.sampled_from([0.10, 0.50, 0.90, 0.95, 1.0]),
)
def test_nearest_rank_percentile_parity(oracle, values, fraction):
    theirs = oracle.call("text_metrics", percentiles=[(values, fraction)])
    assert nearest_rank_percentile(values, fraction) == theirs["percentile"][0]
