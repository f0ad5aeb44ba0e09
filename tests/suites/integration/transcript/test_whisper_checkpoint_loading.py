"""Staged-checkpoint loading for the transcription lane.

Behavior spec: reference ``transcript/backends/stable_whisper.py`` loads the
HF Whisper checkpoint (config + weights + tokenizer + generation_config)
from the local model cache. This file pins OUR loading path against a
synthetic HF-layout checkpoint: the weight converter's tensor layout (incl.
whisper's bias-free k_proj), config/generation-config parsing, tokenizer
loading, and the adapter's staged-assets transcribe end to end — the
production path ``JaxWhisperTranscriber.load_model → from_pretrained_dir``
that random-init unit tests bypass.
"""

from __future__ import annotations

import json
import wave

import numpy as np
import pytest

from ser_tpu.models import whisper as whisper_model

TINY = whisper_model.WhisperConfig(
    n_mels=80,
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    n_heads=4,
    vocab_size=2048,
    max_target_positions=64,
)

ALIGNMENT_HEADS = [[1, 0], [1, 2]]
SUPPRESS_TOKENS = [5, 3, 9]


def _t(rng, *shape):
    import torch

    return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)


def _attention(rng, sd, base, d):
    for proj in ("q_proj", "v_proj", "out_proj"):
        sd[f"{base}.{proj}.weight"] = _t(rng, d, d)
        sd[f"{base}.{proj}.bias"] = _t(rng, d)
    # Whisper's k_proj carries NO bias on disk; the converter must not ask.
    sd[f"{base}.k_proj.weight"] = _t(rng, d, d)


def build_whisper_checkpoint(model_dir, *, seed: int = 0):
    """Writes a tiny-dims HF Whisper checkpoint + tokenizer + gen config."""
    import torch

    cfg = TINY
    d = cfg.d_model
    rng = np.random.default_rng(seed)
    sd: dict = {
        "encoder.conv1.weight": _t(rng, d, cfg.n_mels, 3),
        "encoder.conv1.bias": _t(rng, d),
        "encoder.conv2.weight": _t(rng, d, d, 3),
        "encoder.conv2.bias": _t(rng, d),
        "encoder.layer_norm.weight": _t(rng, d),
        "encoder.layer_norm.bias": _t(rng, d),
        "decoder.embed_tokens.weight": _t(rng, cfg.vocab_size, d),
        "decoder.embed_positions.weight": _t(rng, cfg.max_target_positions, d),
        "decoder.layer_norm.weight": _t(rng, d),
        "decoder.layer_norm.bias": _t(rng, d),
    }
    for i in range(cfg.encoder_layers):
        base = f"encoder.layers.{i}"
        _attention(rng, sd, f"{base}.self_attn", d)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{base}.{ln}.weight"] = _t(rng, d)
            sd[f"{base}.{ln}.bias"] = _t(rng, d)
        sd[f"{base}.fc1.weight"] = _t(rng, 4 * d, d)
        sd[f"{base}.fc1.bias"] = _t(rng, 4 * d)
        sd[f"{base}.fc2.weight"] = _t(rng, d, 4 * d)
        sd[f"{base}.fc2.bias"] = _t(rng, d)
    for i in range(cfg.decoder_layers):
        base = f"decoder.layers.{i}"
        _attention(rng, sd, f"{base}.self_attn", d)
        _attention(rng, sd, f"{base}.encoder_attn", d)
        for ln in ("self_attn_layer_norm", "encoder_attn_layer_norm", "final_layer_norm"):
            sd[f"{base}.{ln}.weight"] = _t(rng, d)
            sd[f"{base}.{ln}.bias"] = _t(rng, d)
        sd[f"{base}.fc1.weight"] = _t(rng, 4 * d, d)
        sd[f"{base}.fc1.bias"] = _t(rng, 4 * d)
        sd[f"{base}.fc2.weight"] = _t(rng, d, 4 * d)
        sd[f"{base}.fc2.bias"] = _t(rng, d)

    model_dir.mkdir(parents=True, exist_ok=True)
    torch.save(sd, model_dir / "pytorch_model.bin")
    (model_dir / "config.json").write_text(
        json.dumps(
            {
                "num_mel_bins": cfg.n_mels,
                "d_model": cfg.d_model,
                "encoder_layers": cfg.encoder_layers,
                "decoder_layers": cfg.decoder_layers,
                "encoder_attention_heads": cfg.n_heads,
                "vocab_size": cfg.vocab_size,
                "max_target_positions": cfg.max_target_positions,
            }
        )
    )
    (model_dir / "generation_config.json").write_text(
        json.dumps(
            {"alignment_heads": ALIGNMENT_HEADS, "suppress_tokens": SUPPRESS_TOKENS}
        )
    )
    # Minimal byte-level BPE tokenizer the real WhisperTokenizer can load
    # offline; specials land as added tokens (ids 81+), all under vocab_size.
    vocab = {chr(33 + index): index for index in range(80)}
    vocab["Ġw"] = 80  # " w" — a leading-space word token
    (model_dir / "vocab.json").write_text(json.dumps(vocab))
    (model_dir / "merges.txt").write_text("#version: 0.2\n")
    specials = [
        "<|endoftext|>",
        "<|startoftranscript|>",
        "<|en|>",
        "<|transcribe|>",
        "<|notimestamps|>",
    ] + [f"<|{i / 100:.2f}|>" for i in range(0, 3001, 2)]
    (model_dir / "added_tokens.json").write_text(
        json.dumps({token: 81 + index for index, token in enumerate(specials)})
    )
    (model_dir / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "WhisperTokenizer",
                "unk_token": "<|endoftext|>",
                "bos_token": "<|endoftext|>",
                "eos_token": "<|endoftext|>",
            }
        )
    )
    return model_dir


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    return build_whisper_checkpoint(
        tmp_path_factory.mktemp("whisper") / "OpenAI" / "whisper" / "test-tiny"
    )


def _tree_shapes(tree, prefix=""):
    import jax

    return {
        jax.tree_util.keystr(path): np.asarray(leaf).shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_converted_trees_match_flax_init_layout(checkpoint_dir):
    """Converted param trees must be drop-in for the flax modules' own init."""
    import jax

    cfg = whisper_model.whisper_config_from_hf_dir(checkpoint_dir)
    assert cfg == TINY

    encoder_params = whisper_model.load_hf_whisper_encoder_params(checkpoint_dir, cfg)
    init_encoder = whisper_model.init_whisper_encoder_params(cfg, seed=0)
    assert _tree_shapes(encoder_params) == _tree_shapes(init_encoder)

    decoder_params = whisper_model.load_hf_whisper_decoder_params(checkpoint_dir, cfg)
    decoder = whisper_model.WhisperDecoder(cfg)
    tokens = np.zeros((1, cfg.max_target_positions), dtype=np.int32)
    states = np.zeros(
        (1, whisper_model.CHUNK_FRAMES // 2, cfg.d_model), dtype=np.float32
    )
    init_decoder = decoder.init(jax.random.PRNGKey(0), tokens, states)["params"]
    assert _tree_shapes(decoder_params) == _tree_shapes(init_decoder)


def test_generation_config_parsing(checkpoint_dir):
    heads = whisper_model.alignment_heads_from_hf_dir(checkpoint_dir)
    assert heads == tuple((layer, head) for layer, head in ALIGNMENT_HEADS)
    # Suppress list comes back sorted and deduplicated.
    assert whisper_model.suppress_tokens_from_hf_dir(checkpoint_dir) == tuple(
        sorted(SUPPRESS_TOKENS)
    )


def test_from_pretrained_dir_builds_working_model(checkpoint_dir):
    model = whisper_model.WhisperForTranscription.from_pretrained_dir(
        checkpoint_dir, compute_dtype="float32"
    )
    assert model.alignment_heads == tuple(
        (layer, head) for layer, head in ALIGNMENT_HEADS
    )
    audio = (0.2 * np.random.default_rng(1).standard_normal(16000)).astype(np.float32)
    words = model.transcribe_words(audio, language="en", use_vad=False)
    for word in words:  # random weights: assert the structural contract only
        assert word.end_seconds > word.start_seconds
        assert isinstance(word.word, str) and word.word


def test_encoder_backend_loads_staged_checkpoint(tmp_path, monkeypatch):
    """The accurate profile's encoder backend shares the converter: its
    staged-HF branch must load without SER_ALLOW_RANDOM_INIT."""
    monkeypatch.delenv("SER_ALLOW_RANDOM_INIT", raising=False)
    from ser_tpu._internal.repr.whisper_backend import WhisperEncoderBackend

    cache_root = tmp_path / "model-cache"
    build_whisper_checkpoint(cache_root / "OpenAI" / "whisper" / "test-tiny")
    backend = WhisperEncoderBackend(
        model_id="OpenAI/whisper/test-tiny", cache_root=cache_root
    )
    assert backend.feature_dim == TINY.d_model
    audio = (0.1 * np.random.default_rng(2).standard_normal(16000)).astype(np.float32)
    encoded = backend.encode_sequence(audio, 16000)
    assert encoded.backend_id == "jax_whisper_encoder"
    assert np.isfinite(encoded.embeddings).all()


def test_adapter_staged_assets_end_to_end(tmp_path):
    """The production path: cache_root staging → load_model → transcribe."""
    from ser_tpu._internal.transcript.jax_whisper_backend import JaxWhisperTranscriber

    cache_root = tmp_path / "model-cache"
    build_whisper_checkpoint(cache_root / "OpenAI" / "whisper" / "test-tiny")
    backend = JaxWhisperTranscriber(
        model_name="OpenAI/whisper/test-tiny", cache_root=cache_root, use_vad=False
    )
    assert backend.assets_available() is True
    assert backend.check_compatibility().blocking is False

    pcm = (
        np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 8000
    ).astype(np.int16)
    clip = tmp_path / "clip.wav"
    with wave.open(str(clip), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(16000)
        handle.writeframes(pcm.tobytes())

    backend.load_model()
    words = backend.transcribe(str(clip), language="en")
    assert isinstance(words, list)
    for word in words:
        assert word.end_seconds > word.start_seconds
