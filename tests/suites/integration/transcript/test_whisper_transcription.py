"""Whisper transcription: KV-cache decode, alignment, and the word pipeline."""

import numpy as np
import pytest

from ser_tpu.models import whisper as whisper_model


class FakeTokenizer:
    """Deterministic mini-tokenizer covering the decode loop's contract.

    Specials live at fixed ids; 'words' are single ids decoded to " w<id>"
    (leading space marks a word boundary, as BPE vocabularies do).
    """

    SPECIALS = {
        "<|startoftranscript|>": 200,
        "<|endoftext|>": 201,
        "<|en|>": 202,
        "<|transcribe|>": 203,
        "<|0.00|>": 210,
    }
    unk_token_id = 199

    def convert_tokens_to_ids(self, tokens):
        return [self.SPECIALS.get(token, self.unk_token_id) for token in tokens]

    def decode(self, ids):
        return "".join(f" w{i}" for i in ids)


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    config = whisper_model.WhisperConfig.tiny()
    encoder_params = whisper_model.init_whisper_encoder_params(config, seed=0)
    decoder = whisper_model.WhisperDecoder(config)
    tokens = np.zeros((1, config.max_target_positions), dtype=np.int32)
    states = np.zeros((1, whisper_model.CHUNK_FRAMES // 2, config.d_model), dtype=np.float32)
    decoder_params = decoder.init(
        jax.random.PRNGKey(0), tokens, states
    )["params"]
    return whisper_model.WhisperForTranscription(
        config, encoder_params, decoder_params, FakeTokenizer()
    )


def test_transcribe_words_runs_and_produces_monotone_timestamps(tiny_model):
    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    words = tiny_model.transcribe_words(audio, language="en", use_vad=False)
    # Random-weight decode emits arbitrary tokens; the contract is structural:
    for word in words:
        assert word.end_seconds > word.start_seconds
        assert 0.0 <= word.start_seconds <= 2.0 + 1e-6
    starts = [w.start_seconds for w in words]
    assert starts == sorted(starts)


def test_silence_with_vad_yields_empty(tiny_model):
    silence = np.zeros(16000, dtype=np.float32)
    assert tiny_model.transcribe_words(silence, use_vad=True) == []


def test_vad_trims_leading_silence():
    audio = np.zeros(16000, dtype=np.float32)
    audio[8000:12000] = 0.5
    trimmed, offset = whisper_model._trim_silence(audio)
    assert trimmed.size < audio.size
    assert np.abs(trimmed).max() == pytest.approx(0.5)
    # The reported offset maps trimmed coordinates back to the original:
    # sample 0 of the trimmed audio is sample `offset` of the input.
    assert 0 < offset <= 8000
    assert audio[offset : offset + trimmed.size].tolist() == trimmed.tolist()


def test_vad_offset_shifts_words_to_original_timeline(tiny_model, monkeypatch):
    """Words decode on the trimmed timeline but report in original-audio
    coordinates — the emotion-timeline join depends on it."""
    ts = FakeTokenizer.SPECIALS["<|0.00|>"]
    scripted = [ts, 5, ts + 50]  # one word spanning [0.0, 1.0] of the chunk
    monkeypatch.setattr(
        tiny_model,
        "_decode_chunk_batch",
        lambda states, language, num_frames: ([scripted], None),
    )
    lead_s = 2.0
    audio = np.zeros(int(16000 * (lead_s + 1.5)), dtype=np.float32)
    rng = np.random.default_rng(2)
    audio[int(16000 * lead_s) :] = 0.3 * rng.standard_normal(
        audio.size - int(16000 * lead_s)
    ).astype(np.float32)
    words = tiny_model.transcribe_words(audio, use_vad=True)
    assert words, "scripted decode produced no words"
    # VAD trims ~2 s of leading silence; the word must NOT start near 0.
    assert words[0].start_seconds == pytest.approx(lead_s, abs=0.1)


def test_timestamp_token_segmentation_interpolation_fallback(tiny_model, monkeypatch):
    """Without alignment capture, timestamp tokens bound interpolated words."""
    ts = FakeTokenizer.SPECIALS["<|0.00|>"]
    # <|1.00|> = ts + 50 (0.02 s per step), tokens 5,6 inside [1.0, 2.0].
    scripted = [ts + 50, 5, 6, ts + 100]
    monkeypatch.setattr(
        tiny_model,
        "_decode_chunk_batch",
        lambda states, language, num_frames: ([scripted], None),
    )
    audio = (0.1 * np.random.default_rng(1).standard_normal(16000 * 3)).astype(np.float32)
    words = tiny_model.transcribe_words(audio, use_vad=False)
    assert [w.word for w in words] == ["w5", "w6"]
    assert words[0].start_seconds == pytest.approx(1.0)
    assert words[0].end_seconds == pytest.approx(1.5)
    assert words[1].end_seconds == pytest.approx(2.0)


def test_kv_cache_decode_matches_full_prefix_reforward():
    """Cached decode must emit the exact token stream of the full re-forward."""
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import greedy_decode_kv_cache

    config = whisper_model.WhisperConfig.tiny()
    decoder = whisper_model.WhisperDecoder(config)
    max_len = config.max_target_positions
    init_tokens = np.zeros((1, max_len), dtype=np.int32)
    states = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, whisper_model.CHUNK_FRAMES // 2, config.d_model),
        dtype=jnp.float32,
    )
    params = decoder.init(jax.random.PRNGKey(1), init_tokens, states)["params"]

    prefix = jnp.asarray([200, 202, 203], dtype=jnp.int32)
    eot = 201
    full_tokens, full_emitted = whisper_model.greedy_decode_on_device(
        decoder, params, states, prefix, eot, prefix_len=3
    )
    cached_tokens, cached_lengths, _ = greedy_decode_kv_cache(
        params,
        config,
        states,
        prefix,
        jnp.asarray(eot, dtype=jnp.int32),
        prefix_len=3,
    )
    n_full = int(full_emitted)
    n_cached = int(cached_lengths[0])
    assert n_cached == n_full
    assert np.asarray(cached_tokens[0, 3 : 3 + n_cached]).tolist() == np.asarray(
        full_tokens[0, 3 : 3 + n_full]
    ).tolist()


def test_kv_cache_decode_batches_rows_independently():
    """Each batch row decodes against its own encoder states."""
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import greedy_decode_kv_cache

    config = whisper_model.WhisperConfig.tiny()
    decoder = whisper_model.WhisperDecoder(config)
    init_tokens = np.zeros((1, config.max_target_positions), dtype=np.int32)
    single = jax.random.normal(
        jax.random.PRNGKey(7),
        (1, whisper_model.CHUNK_FRAMES // 2, config.d_model),
        dtype=jnp.float32,
    )
    params = decoder.init(jax.random.PRNGKey(2), init_tokens, single)["params"]
    other = jax.random.normal(jax.random.PRNGKey(8), single.shape, dtype=jnp.float32)
    both = jnp.concatenate([single, other], axis=0)

    prefix = jnp.asarray([200, 202, 203], dtype=jnp.int32)
    eot = jnp.asarray(201, dtype=jnp.int32)
    kwargs = dict(prefix_len=3)
    tokens_b, lengths_b, _ = greedy_decode_kv_cache(
        params, config, both, prefix, eot, **kwargs
    )
    tokens_0, lengths_0, _ = greedy_decode_kv_cache(
        params, config, single, prefix, eot, **kwargs
    )
    n = min(int(lengths_0[0]), int(lengths_b[0]))
    assert int(lengths_b[0]) == int(lengths_0[0])
    assert np.array_equal(
        np.asarray(tokens_b[0, 3 : 3 + n]), np.asarray(tokens_0[0, 3 : 3 + n])
    )


def test_device_alignment_reduction_matches_numpy_pipeline():
    """reduce_alignment_matrix == the host normalize/standardize/medfilt/mean."""
    import jax.numpy as jnp

    from ser_tpu.models import word_timing
    from ser_tpu.models.whisper_decode import reduce_alignment_matrix

    rng = np.random.default_rng(9)
    batch, heads, max_len, enc_frames = 2, 3, 16, 40
    prefix_len, emitted = 3, 9
    raw = rng.random((batch, heads, max_len, enc_frames)).astype(np.float32)
    raw /= raw.sum(axis=-1, keepdims=True)

    device = np.asarray(
        reduce_alignment_matrix(
            jnp.asarray(raw),
            jnp.asarray([prefix_len + emitted] * batch, dtype=jnp.int32),
            jnp.asarray([enc_frames] * batch, dtype=jnp.int32),
            prefix_len=prefix_len,
        )
    )
    for row in range(batch):
        weights = raw[row, :, prefix_len : prefix_len + emitted, :].astype(np.float64)
        weights /= weights.sum(axis=-1, keepdims=True) + 1e-12
        mean = weights.mean(axis=-2, keepdims=True)
        std = weights.std(axis=-2, keepdims=True)
        weights = (weights - mean) / (std + 1e-9)
        weights = word_timing.median_filter(weights, 7)
        expected = weights.mean(axis=0)
        got = device[row, prefix_len : prefix_len + emitted, :]
        np.testing.assert_allclose(got, expected, atol=2e-4)


def test_alignment_capture_rows_are_probabilities():
    """Captured alignment rows are softmax distributions over encoder frames."""
    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import greedy_decode_kv_cache

    config = whisper_model.WhisperConfig.tiny()
    decoder = whisper_model.WhisperDecoder(config)
    init_tokens = np.zeros((1, config.max_target_positions), dtype=np.int32)
    states = jax.random.normal(
        jax.random.PRNGKey(5),
        (1, whisper_model.CHUNK_FRAMES // 2, config.d_model),
        dtype=jnp.float32,
    )
    params = decoder.init(jax.random.PRNGKey(4), init_tokens, states)["params"]
    tokens, lengths, align = greedy_decode_kv_cache(
        params,
        config,
        states,
        jnp.asarray([200, 202, 203], dtype=jnp.int32),
        jnp.asarray(201, dtype=jnp.int32),
        prefix_len=3,
        align_spec=((1, 0), (1, 2)),
    )
    align_np = np.asarray(align)
    assert align_np.shape[:2] == (1, 2)
    processed = 3 + int(lengths[0])  # prefix rows are recorded too
    sums = align_np[0, :, : max(processed - 1, 1), :].sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_degeneracy_detector_flags_repetition_only():
    from ser_tpu.models.whisper import transcript_is_degenerate

    assert transcript_is_degenerate("the cat " * 40)
    assert not transcript_is_degenerate(
        "kids are talking by the door while dogs are sitting by the door"
    )
    assert not transcript_is_degenerate("la la la")  # too short to judge


def test_degenerate_chunk_retries_with_temperature(tiny_model, monkeypatch):
    """A repetitive greedy decode re-runs with escalating temperature and the
    clean retry replaces it."""
    ts = FakeTokenizer.SPECIALS["<|0.00|>"]
    degenerate = [ts, *([7] * 60), ts + 100]
    clean = [ts, 5, 6, ts + 100]
    calls = []

    def fake_decode(states, language, num_frames, *, temperature=0.0, rng_seed=0):
        calls.append(temperature)
        rows = states.shape[0]
        if temperature == 0.0:
            return [list(degenerate) for _ in range(rows)], None
        return [list(clean) for _ in range(rows)], None

    monkeypatch.setattr(tiny_model, "_decode_chunk_batch", fake_decode)
    audio = (0.1 * np.random.default_rng(2).standard_normal(16000 * 3)).astype(np.float32)
    words = tiny_model.transcribe_words(audio, use_vad=False)
    assert calls[0] == 0.0 and calls[1] == 0.2  # first retry temperature
    assert [w.word for w in words] == ["w5", "w6"]


def test_non_degenerate_decode_never_retries(tiny_model, monkeypatch):
    ts = FakeTokenizer.SPECIALS["<|0.00|>"]
    calls = []

    def fake_decode(states, language, num_frames, *, temperature=0.0, rng_seed=0):
        calls.append(temperature)
        return [[ts, 5, 6, ts + 50] for _ in range(states.shape[0])], None

    monkeypatch.setattr(tiny_model, "_decode_chunk_batch", fake_decode)
    audio = (0.1 * np.random.default_rng(3).standard_normal(16000 * 2)).astype(np.float32)
    tiny_model.transcribe_words(audio, use_vad=False)
    assert calls == [0.0]


def test_sampled_decode_runs_and_differs_from_greedy():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import greedy_decode_kv_cache

    config = whisper_model.WhisperConfig.tiny()
    decoder = whisper_model.WhisperDecoder(config)
    states = jax.random.normal(
        jax.random.PRNGKey(11),
        (1, whisper_model.CHUNK_FRAMES // 2, config.d_model),
        dtype=jnp.float32,
    )
    params = decoder.init(
        jax.random.PRNGKey(12), np.zeros((1, config.max_target_positions), np.int32), states
    )["params"]
    prefix = jnp.asarray([200, 202, 203], dtype=jnp.int32)
    eot = jnp.asarray(201, dtype=jnp.int32)
    greedy, g_len, _ = greedy_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3
    )
    sampled, s_len, _ = greedy_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3, temperature=1.5, rng_seed=7
    )
    assert int(s_len[0]) > 0
    n = min(int(g_len[0]), int(s_len[0]))
    assert not np.array_equal(
        np.asarray(greedy[0, 3 : 3 + n]), np.asarray(sampled[0, 3 : 3 + n])
    )


def _tiny_decode_fixture(seed_states=3, seed_params=1, batch=1):
    import jax
    import jax.numpy as jnp

    config = whisper_model.WhisperConfig.tiny()
    decoder = whisper_model.WhisperDecoder(config)
    states = jax.random.normal(
        jax.random.PRNGKey(seed_states),
        (batch, whisper_model.CHUNK_FRAMES // 2, config.d_model),
        dtype=jnp.float32,
    )
    params = decoder.init(
        jax.random.PRNGKey(seed_params),
        np.zeros((1, config.max_target_positions), np.int32),
        states[:1],
    )["params"]
    prefix = jnp.asarray([200, 202, 203], dtype=jnp.int32)
    return config, decoder, params, states, prefix


def _teacher_forced_logprob(decoder, params, states, tokens, n_emitted, prefix_len):
    """Sum of per-token log-probs of the emitted ids under the model."""
    import jax

    row = np.asarray(tokens)[None, 0] if tokens.ndim == 1 else np.asarray(tokens[:1])
    logits = decoder.apply({"params": params}, row, states[:1])
    logprobs = np.asarray(jax.nn.log_softmax(np.asarray(logits, dtype=np.float64), axis=-1))
    total = 0.0
    for step in range(n_emitted):
        position = prefix_len + step  # token at `position` predicted from position-1
        total += logprobs[0, position - 1, row[0, position]]
    return total


def test_beam_size_one_matches_greedy():
    """A single-beam search is greedy decoding by construction."""
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import beam_decode_kv_cache, greedy_decode_kv_cache

    config, _, params, states, prefix = _tiny_decode_fixture()
    eot = jnp.asarray(201, dtype=jnp.int32)
    greedy, g_len, _ = greedy_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3
    )
    beam, b_len = beam_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3, beam_size=1
    )
    n = int(g_len[0])
    assert int(b_len[0]) == n
    assert np.array_equal(np.asarray(beam[0, 3 : 3 + n]), np.asarray(greedy[0, 3 : 3 + n]))


def test_beam_search_scores_at_least_greedy():
    """Beam-5's winner must score >= the greedy sequence under the model."""
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import beam_decode_kv_cache, greedy_decode_kv_cache

    config, decoder, params, states, prefix = _tiny_decode_fixture(seed_states=5)
    eot = jnp.asarray(201, dtype=jnp.int32)
    greedy, g_len, _ = greedy_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3
    )
    beam, b_len = beam_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3, beam_size=5
    )
    g_score = _teacher_forced_logprob(decoder, params, states, greedy, int(g_len[0]), 3)
    b_score = _teacher_forced_logprob(decoder, params, states, beam, int(b_len[0]), 3)
    # length_penalty=1.0 compares mean-ish normalized scores; with random
    # weights neither sequence ends early, so lengths match and the raw sums
    # are directly comparable.
    assert int(b_len[0]) == int(g_len[0])
    assert b_score >= g_score - 1e-4


def test_beam_decode_batch_rows_and_eot_padding():
    """Rows decode independently; positions past each length are EOT."""
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import beam_decode_kv_cache

    config, _, params, states, prefix = _tiny_decode_fixture(seed_states=9, batch=2)
    eot = jnp.asarray(201, dtype=jnp.int32)
    tokens, lengths = beam_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3, beam_size=3
    )
    assert tokens.shape[0] == 2
    toks = np.asarray(tokens)
    for row in range(2):
        n = int(lengths[row])
        tail = toks[row, 3 + n :]
        assert (tail == 201).all() or n == config.max_target_positions - 3 - 1
    # Different encoder states -> different streams (independence check).
    n = min(int(lengths[0]), int(lengths[1]))
    assert not np.array_equal(toks[0, 3 : 3 + n], toks[1, 3 : 3 + n])


def test_alignment_forward_matches_loop_capture():
    """Teacher-forced capture equals the greedy loop's in-flight capture."""
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import alignment_forward, greedy_decode_kv_cache

    config, _, params, states, prefix = _tiny_decode_fixture(seed_states=13)
    eot = jnp.asarray(201, dtype=jnp.int32)
    spec = ((1, 0), (1, 2))
    tokens, lengths, loop_align = greedy_decode_kv_cache(
        params, config, states, prefix, eot, prefix_len=3, align_spec=spec
    )
    forced = np.asarray(
        alignment_forward(params, config, states, tokens, align_spec=spec)
    )
    # The loop writes capture rows only for positions it processes
    # (0..max_len-2); the final row exists solely in the teacher-forced pass.
    n_rows = min(3 + int(lengths[0]), config.max_target_positions - 1)
    got = forced[0, :, :n_rows, :]
    want = np.asarray(loop_align)[0, :, :n_rows, :]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_transcribe_words_beam_mode_end_to_end():
    """Beam-mode transcription produces structurally valid words."""
    import jax

    config = whisper_model.WhisperConfig.tiny()
    encoder_params = whisper_model.init_whisper_encoder_params(config, seed=0)
    decoder = whisper_model.WhisperDecoder(config)
    tokens = np.zeros((1, config.max_target_positions), dtype=np.int32)
    states = np.zeros(
        (1, whisper_model.CHUNK_FRAMES // 2, config.d_model), dtype=np.float32
    )
    decoder_params = decoder.init(jax.random.PRNGKey(0), tokens, states)["params"]
    model = whisper_model.WhisperForTranscription(
        config,
        encoder_params,
        decoder_params,
        FakeTokenizer(),
        decode_strategy="beam",
        beam_size=2,
    )
    model.RETRY_TEMPERATURES = ()
    rng = np.random.default_rng(1)
    audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    words = model.transcribe_words(audio, language="en", use_vad=False)
    for word in words:
        assert word.end_seconds > word.start_seconds
    starts = [w.start_seconds for w in words]
    assert starts == sorted(starts)


def test_unknown_decode_strategy_rejected():
    config = whisper_model.WhisperConfig.tiny()
    with pytest.raises(ValueError, match="decode strategy"):
        whisper_model.WhisperForTranscription(
            config, {}, {}, FakeTokenizer(), decode_strategy="mcts"
        )


def test_beam_decode_with_timestamp_rules_and_suppression():
    """Rules + suppression compose with beam bookkeeping (non-decreasing
    stamps, suppressed ids never emitted, EOT padding intact)."""
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import beam_decode_kv_cache

    config, _, params, states, prefix = _tiny_decode_fixture(seed_states=21)
    eot = jnp.asarray(201, dtype=jnp.int32)
    ts_begin = 210
    suppressed = (5, 6, 7)
    tokens, lengths = beam_decode_kv_cache(
        params,
        config,
        states,
        prefix,
        eot,
        prefix_len=3,
        beam_size=3,
        suppress_tokens=suppressed,
        timestamp_begin=ts_begin,
    )
    toks = np.asarray(tokens)[0, 3 : 3 + int(lengths[0])].tolist()
    assert toks, "beam decode emitted nothing"
    assert not set(toks) & set(suppressed)
    stamps = [t for t in toks if t >= ts_begin]
    assert stamps == sorted(stamps)
    # Rule 4: the first generated token must be an early timestamp.
    assert toks[0] >= ts_begin
    assert toks[0] <= ts_begin + 50


def test_beam_finished_pool_prefers_eot_terminated_hypothesis():
    """When greedy would stop at EOT, the beam pool must return that
    hypothesis (EOT score included) rather than a never-finished live beam."""
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import beam_decode_kv_cache, greedy_decode_kv_cache

    config, _, params, states, prefix = _tiny_decode_fixture(seed_states=3)
    # Find the greedy path's natural tokens, then rerun beam-1 with THAT
    # stream's most frequent token declared as EOT — greedy then terminates
    # early, and the pool must capture exactly the truncated prefix.
    g_tokens, g_len, _ = greedy_decode_kv_cache(
        params, config, states, prefix, jnp.asarray(201, jnp.int32), prefix_len=3
    )
    emitted = np.asarray(g_tokens)[0, 3 : 3 + int(g_len[0])].tolist()
    # Choose an id that appears after position 0 in the greedy stream.
    eot_id = next(t for t in emitted[1:] if t != emitted[0])
    g2_tokens, g2_len, _ = greedy_decode_kv_cache(
        params, config, states, prefix, jnp.asarray(eot_id, jnp.int32), prefix_len=3
    )
    b_tokens, b_len = beam_decode_kv_cache(
        params, config, states, prefix, jnp.asarray(eot_id, jnp.int32),
        prefix_len=3, beam_size=1,
    )
    n = int(g2_len[0])
    assert int(b_len[0]) == n
    assert np.asarray(b_tokens)[0, 3 : 3 + n].tolist() == np.asarray(g2_tokens)[
        0, 3 : 3 + n
    ].tolist()
    # The pool hypothesis is EOT-terminated and EOT-padded.
    assert (np.asarray(b_tokens)[0, 3 + n :] == eot_id).all()


def test_alignment_heads_from_wrong_checkpoint_are_filtered():
    """Out-of-range (layer, head) metadata drops with a warning; an
    all-invalid list falls back to the default spec."""
    config = whisper_model.WhisperConfig.tiny()  # 2 layers, 4 heads
    with pytest.warns(UserWarning, match="alignment head"):
        model = whisper_model.WhisperForTranscription(
            config, {}, {}, FakeTokenizer(),
            alignment_heads=((1, 0), (30, 2), (0, 99)),
        )
    assert model.alignment_heads == ((1, 0),)
    with pytest.warns(UserWarning):
        model = whisper_model.WhisperForTranscription(
            config, {}, {}, FakeTokenizer(), alignment_heads=((30, 2),)
        )
    assert model.alignment_heads  # default spec restored
    for layer, head in model.alignment_heads:
        assert 0 <= layer < config.decoder_layers
        assert 0 <= head < config.n_heads


def test_decode_rejects_out_of_range_align_spec():
    import jax.numpy as jnp

    from ser_tpu.models.whisper_decode import alignment_forward, greedy_decode_kv_cache

    config, _, params, states, prefix = _tiny_decode_fixture()
    eot = jnp.asarray(201, dtype=jnp.int32)
    with pytest.raises(ValueError, match="out of range"):
        greedy_decode_kv_cache(
            params, config, states, prefix, eot, prefix_len=3, align_spec=((99, 0),)
        )
    with pytest.raises(ValueError, match="out of range"):
        alignment_forward(
            params, config, states, jnp.zeros((1, 8), jnp.int32), align_spec=((0, 99),)
        )


def test_retry_keeps_least_degenerate_candidate(tiny_model, monkeypatch):
    """If every temperature retry is WORSE than the original, the original
    stays — the schedule must never trade down."""
    ts = FakeTokenizer.SPECIALS["<|0.00|>"]
    original = [ts] + [7, 8] * 20  # degenerate but the best available
    worse = [ts] + [9] * 60  # even more compressible
    calls = {"n": 0}

    def scripted(states, language, num_frames, temperature=0.0, rng_seed=0):
        if temperature == 0.0:
            return [original], None
        calls["n"] += 1
        return [worse], None

    monkeypatch.setattr(tiny_model, "_decode_chunk_batch", scripted)
    audio = (0.2 * np.random.default_rng(3).standard_normal(16000)).astype(np.float32)
    words = tiny_model.transcribe_words(audio, use_vad=False)
    assert calls["n"] == len(tiny_model.RETRY_TEMPERATURES)  # all retries ran
    # The kept stream is the original: words decode to alternating w7/w8.
    texts = {w.word for w in words}
    assert texts == {"w7", "w8"}
