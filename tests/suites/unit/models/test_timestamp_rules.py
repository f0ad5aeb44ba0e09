"""Whisper timestamp decoding rules on synthetic logits."""

import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu.models.whisper_decode import apply_timestamp_rules

VOCAB = 40
EOT = 20
TS_BEGIN = 25  # ids 25..39 are timestamps; 21..24 specials; 0..19 text


def _apply(logits, *, last=0, penult=0, max_ts=TS_BEGIN, count=5):
    return np.asarray(
        apply_timestamp_rules(
            jnp.asarray(logits, dtype=jnp.float32)[None, :],
            last_token=jnp.asarray([last], dtype=jnp.int32),
            penultimate_token=jnp.asarray([penult], dtype=jnp.int32),
            max_timestamp=jnp.asarray([max_ts], dtype=jnp.int32),
            generated_count=jnp.asarray([count], dtype=jnp.int32),
            eot=jnp.asarray(EOT, dtype=jnp.int32),
            timestamp_begin=TS_BEGIN,
            max_initial_timestamp_index=10,
        )
    )[0]


def test_first_generated_token_must_be_an_early_timestamp():
    out = _apply(np.zeros(VOCAB), count=0)
    assert np.all(out[:TS_BEGIN] < -1e29)  # all text/specials/eot masked
    assert np.all(out[TS_BEGIN : TS_BEGIN + 11] > -1e29)


def test_lone_timestamp_blocks_text():
    logits = np.zeros(VOCAB)
    logits[EOT] = 12.0  # EOT clearly dominant → rule 5 must not force
    out = _apply(logits, last=TS_BEGIN + 3, penult=5, count=4)
    assert np.all(out[:EOT] < -1e29)  # text masked
    assert out[EOT] > -1e29  # EOT stays legal
    assert np.all(out[TS_BEGIN + 3 :] > -1e29)  # closing timestamps legal


def test_closed_pair_blocks_third_timestamp():
    out = _apply(
        np.zeros(VOCAB), last=TS_BEGIN + 4, penult=TS_BEGIN + 4, count=6, max_ts=TS_BEGIN
    )
    assert np.all(out[TS_BEGIN:] < -1e29)
    assert np.all(out[:EOT] > -1e29)


def test_timestamps_strictly_increase_after_text():
    """Published `timestamps[-1] + 1` case: when not closing a pair, a repeat
    of the last stamp is illegal (zero-length segments would loop forever)."""
    out = _apply(np.zeros(VOCAB), last=7, penult=8, max_ts=TS_BEGIN + 6)
    assert np.all(out[TS_BEGIN : TS_BEGIN + 7] < -1e29)
    assert np.all(out[TS_BEGIN + 7 :] > -1e29)


def test_closing_timestamp_may_repeat_the_opening_stamp():
    """While closing a pair the published rule masks only BELOW the last
    stamp, so <|t|><|t|> (an empty segment marker) stays legal."""
    logits = np.zeros(VOCAB)
    logits[EOT] = 12.0  # keep rule 5 quiet
    out = _apply(logits, last=TS_BEGIN + 6, penult=5, max_ts=TS_BEGIN + 6, count=4)
    assert np.all(out[TS_BEGIN : TS_BEGIN + 6] < -1e29)
    assert out[TS_BEGIN + 6] > -1e29


def test_token_after_forced_initial_timestamp_is_text():
    """Published `len(seq) < 2 or ...`: a missing penultimate counts as a
    timestamp, so the step after the forced initial stamp must emit TEXT —
    not a second stamp (the inverted reading burned a decode slot on every
    transcription and started segments with a doubled stamp)."""
    out = _apply(np.zeros(VOCAB), last=TS_BEGIN + 2, penult=0, count=1,
                 max_ts=TS_BEGIN + 2)
    assert np.all(out[TS_BEGIN:] < -1e29)  # no second stamp
    assert np.all(out[:EOT] > -1e29)  # text legal


def test_notimestamps_token_is_always_masked():
    out = _apply(np.zeros(VOCAB), last=4, penult=5)
    assert out[TS_BEGIN - 1] < -1e29


def test_aggregate_timestamp_probability_forces_timestamp():
    logits = np.zeros(VOCAB)
    # Many moderately likely timestamps vs one slightly better text token:
    logits[TS_BEGIN:] = 2.0
    logits[3] = 2.5
    out = _apply(logits, last=4, penult=5)
    assert np.all(out[:TS_BEGIN] < -1e29)  # text (incl. best) masked
    # max_ts=TS_BEGIN and not closing → TS_BEGIN itself is also masked
    # (strict increase); later stamps survive and rule 5 forces them.
    assert np.all(out[TS_BEGIN + 1 :] > -1e29)


def test_dominant_text_token_is_not_forced():
    logits = np.zeros(VOCAB)
    logits[3] = 12.0  # text clearly wins the aggregate comparison
    out = _apply(logits, last=4, penult=5)
    assert out[3] > -1e29


def test_rules_are_per_row_independent():
    base = np.zeros((2, VOCAB), dtype=np.float32)
    base[:, 3] = 12.0  # dominant text keeps rule 5 quiet on both rows
    logits = jnp.asarray(base)
    out = np.asarray(
        apply_timestamp_rules(
            logits,
            last_token=jnp.asarray([TS_BEGIN + 2, 4], dtype=jnp.int32),
            penultimate_token=jnp.asarray([3, 5], dtype=jnp.int32),
            max_timestamp=jnp.asarray([TS_BEGIN, TS_BEGIN], dtype=jnp.int32),
            generated_count=jnp.asarray([4, 4], dtype=jnp.int32),
            eot=jnp.asarray(EOT, dtype=jnp.int32),
            timestamp_begin=TS_BEGIN,
        )
    )
    assert np.all(out[0, :EOT] < -1e29)  # row 0: lone timestamp → no text
    assert np.all(out[1, :EOT] > -1e29)  # row 1 unaffected


def test_decode_with_rules_emits_timestamp_first_and_monotonic():
    """End-to-end: a tiny random model under rules produces a leading early
    timestamp and non-decreasing timestamp tokens."""
    import jax

    from ser_tpu.models import whisper as wm
    from ser_tpu.models.whisper_decode import greedy_decode_kv_cache

    config = wm.WhisperConfig.tiny()
    decoder = wm.WhisperDecoder(config)
    states = jax.random.normal(
        jax.random.PRNGKey(21), (1, wm.CHUNK_FRAMES // 2, config.d_model)
    )
    params = decoder.init(
        jax.random.PRNGKey(22),
        np.zeros((1, config.max_target_positions), np.int32),
        states,
    )["params"]
    tokens, lengths, _ = greedy_decode_kv_cache(
        params,
        config,
        states,
        jnp.asarray([200, 202, 203], dtype=jnp.int32),
        jnp.asarray(201, dtype=jnp.int32),
        prefix_len=3,
        timestamp_begin=210,
    )
    emitted = np.asarray(tokens[0, 3 : 3 + int(lengths[0])])
    assert emitted.size > 0
    assert emitted[0] >= 210  # rule 4: leading timestamp
    stamps = emitted[emitted >= 210]
    assert np.all(np.diff(stamps) >= 0)  # rule 3 end to end