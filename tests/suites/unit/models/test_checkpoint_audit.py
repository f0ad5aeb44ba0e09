"""Doctored-checkpoint audits: converters refuse layout variants loudly.

Parity surface: the reference validates load-info when loading real
checkpoints (``/root/reference/ser/_internal/repr/hf_whisper.py:444-485``).
Every repo converter now tracks consumed tensors and refuses to load a
checkpoint with unconsumed keys, raises by NAME on missing keys, and the
config-derived manifests (:mod:`ser_tpu.models.checkpoint_audit`) let the
doctor validate staged weights (names + shapes) before first contact. All
prior converter tests used self-saved layouts that match by construction —
these doctor the checkpoints deliberately.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from ser_tpu.models import wav2vec2, whisper
from ser_tpu.models.checkpoint_audit import (
    demucs_manifest,
    read_checkpoint_shapes,
    wav2vec2_manifest,
    whisper_manifest,
)
from ser_tpu.models.demucs_v4 import (
    DemucsV4Config,
    config_from_checkpoint_kwargs,
    convert_demucs_state_dict,
)

W2V_CFG = wav2vec2.Wav2Vec2Config.tiny()
WSP_CFG = whisper.WhisperConfig.tiny()


def _state_from_manifest(manifest, alt_group: int | None = 0) -> dict:
    shapes = dict(manifest.required)
    if manifest.alternative_groups and alt_group is not None:
        shapes.update(manifest.alternative_groups[alt_group])
    rng = np.random.default_rng(0)
    return {
        name: rng.standard_normal(shape).astype(np.float32)
        for name, shape in shapes.items()
    }


def _write_hf_dir(path, state: dict, config_json: dict):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    (path / "config.json").write_text(json.dumps(config_json), encoding="utf-8")
    save_file(state, str(path / "model.safetensors"))
    return path


def _w2v_config_json() -> dict:
    return {
        "hidden_size": W2V_CFG.hidden_size,
        "num_hidden_layers": W2V_CFG.num_hidden_layers,
        "num_attention_heads": W2V_CFG.num_attention_heads,
        "intermediate_size": W2V_CFG.intermediate_size,
        "conv_dim": list(W2V_CFG.conv_dim),
        "conv_kernel": list(W2V_CFG.conv_kernel),
        "conv_stride": list(W2V_CFG.conv_stride),
        "num_conv_pos_embeddings": W2V_CFG.num_conv_pos_embeddings,
        "num_conv_pos_embedding_groups": W2V_CFG.num_conv_pos_embedding_groups,
        "feat_extract_norm": W2V_CFG.feat_extract_norm,
        "do_stable_layer_norm": W2V_CFG.do_stable_layer_norm,
    }


def _wsp_config_json() -> dict:
    return {
        "num_mel_bins": WSP_CFG.n_mels,
        "d_model": WSP_CFG.d_model,
        "encoder_layers": WSP_CFG.encoder_layers,
        "decoder_layers": WSP_CFG.decoder_layers,
        "encoder_attention_heads": WSP_CFG.n_heads,
        "vocab_size": WSP_CFG.vocab_size,
        "max_target_positions": WSP_CFG.max_target_positions,
    }


# --------------------------------------------------------------------------- #
# wav2vec2
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("alt_group", [0, 1, 2])
def test_wav2vec2_manifest_state_converts_cleanly(tmp_path, alt_group):
    """The manifest and the converter agree on every name, for all three
    on-disk pos-conv weight-norm layouts."""
    manifest = wav2vec2_manifest(W2V_CFG)
    state = _state_from_manifest(manifest, alt_group)
    model_dir = _write_hf_dir(tmp_path / "m", state, _w2v_config_json())
    params = wav2vec2.load_hf_wav2vec2_params(model_dir, W2V_CFG)
    assert "feature_encoder" in params
    assert manifest.validate(read_checkpoint_shapes(model_dir)).ok


def test_wav2vec2_extra_tensor_refused(tmp_path):
    manifest = wav2vec2_manifest(W2V_CFG)
    state = _state_from_manifest(manifest)
    state["encoder.layers.0.adapter_layer.weight"] = np.zeros((4, 4), np.float32)
    model_dir = _write_hf_dir(tmp_path / "m", state, _w2v_config_json())
    with pytest.raises(KeyError, match="adapter_layer"):
        wav2vec2.load_hf_wav2vec2_params(model_dir, W2V_CFG)


def test_wav2vec2_missing_tensor_named(tmp_path):
    manifest = wav2vec2_manifest(W2V_CFG)
    state = _state_from_manifest(manifest)
    del state["encoder.layers.1.attention.q_proj.weight"]
    model_dir = _write_hf_dir(tmp_path / "m", state, _w2v_config_json())
    with pytest.raises(KeyError, match="q_proj"):
        wav2vec2.load_hf_wav2vec2_params(model_dir, W2V_CFG)


def test_wav2vec2_transposed_shape_flagged():
    manifest = wav2vec2_manifest(W2V_CFG)
    shapes = {name: shape for name, shape in manifest.required.items()}
    shapes.update(manifest.alternative_groups[0])
    name = "feature_projection.projection.weight"
    shapes[name] = tuple(reversed(shapes[name]))
    validation = manifest.validate(shapes)
    assert not validation.ok
    assert any(entry[0] == name for entry in validation.shape_mismatches)


def test_wav2vec2_pretraining_heads_and_prefix_tolerated(tmp_path):
    """The published XLS-R export: ``wav2vec2.``-prefixed body + pretraining
    heads. Both load and validate clean."""
    manifest = wav2vec2_manifest(W2V_CFG)
    state = {
        f"wav2vec2.{name}": value
        for name, value in _state_from_manifest(manifest).items()
    }
    state["wav2vec2.masked_spec_embed"] = np.zeros((W2V_CFG.hidden_size,), np.float32)
    state["quantizer.codevectors"] = np.zeros((1, 8, 4), np.float32)
    state["project_hid.weight"] = np.zeros((4, W2V_CFG.hidden_size), np.float32)
    model_dir = _write_hf_dir(tmp_path / "m", state, _w2v_config_json())
    wav2vec2.load_hf_wav2vec2_params(model_dir, W2V_CFG)
    assert manifest.validate(read_checkpoint_shapes(model_dir)).ok


# --------------------------------------------------------------------------- #
# whisper
# --------------------------------------------------------------------------- #


def _whisper_state() -> dict:
    manifest = whisper_manifest(WSP_CFG, component="model")
    state = _state_from_manifest(manifest)
    # Real checkpoints carry the fixed sinusoidal table; recognized, unloaded.
    state["encoder.embed_positions.weight"] = np.zeros(
        (whisper.CHUNK_FRAMES // 2, WSP_CFG.d_model), np.float32
    )
    return state


def test_whisper_manifest_state_converts_cleanly(tmp_path):
    state = _whisper_state()
    model_dir = _write_hf_dir(tmp_path / "m", state, _wsp_config_json())
    whisper.load_hf_whisper_encoder_params(model_dir, WSP_CFG)
    whisper.load_hf_whisper_decoder_params(model_dir, WSP_CFG)
    manifest = whisper_manifest(WSP_CFG, component="model")
    assert manifest.validate(read_checkpoint_shapes(model_dir)).ok


def test_whisper_encoder_extra_tensor_refused_decoder_untouched(tmp_path):
    state = _whisper_state()
    state["encoder.layers.0.extra_norm.weight"] = np.zeros((4,), np.float32)
    model_dir = _write_hf_dir(tmp_path / "m", state, _wsp_config_json())
    with pytest.raises(KeyError, match="extra_norm"):
        whisper.load_hf_whisper_encoder_params(model_dir, WSP_CFG)
    # The decoder loader's audit is scoped: an encoder-side extra does not
    # block decoder conversion.
    whisper.load_hf_whisper_decoder_params(model_dir, WSP_CFG)


def test_whisper_decoder_missing_tensor_named(tmp_path):
    state = _whisper_state()
    del state["decoder.layers.1.encoder_attn.v_proj.bias"]
    model_dir = _write_hf_dir(tmp_path / "m", state, _wsp_config_json())
    with pytest.raises(KeyError, match="encoder_attn.v_proj.bias"):
        whisper.load_hf_whisper_decoder_params(model_dir, WSP_CFG)


def test_whisper_transposed_shape_flagged():
    manifest = whisper_manifest(WSP_CFG, component="encoder")
    shapes = dict(manifest.required)
    shapes["encoder.conv1.weight"] = tuple(reversed(shapes["encoder.conv1.weight"]))
    validation = manifest.validate(shapes)
    assert any(e[0] == "encoder.conv1.weight" for e in validation.shape_mismatches)


def test_whisper_tied_proj_out_recognized():
    manifest = whisper_manifest(WSP_CFG, component="model")
    shapes = dict(manifest.required)
    shapes["proj_out.weight"] = (WSP_CFG.vocab_size, WSP_CFG.d_model)
    assert manifest.validate(shapes).ok


# --------------------------------------------------------------------------- #
# demucs v4
# --------------------------------------------------------------------------- #

DM_CFG = DemucsV4Config.tiny()


def _demucs_state() -> dict:
    from ser_tpu.models._demucs_synthetic import synthetic_state_dict

    return synthetic_state_dict(DM_CFG, seed=0)


def test_demucs_extra_tensor_refused():
    state = _demucs_state()
    # A dconv attn/lstm-branch variant only ADDS keys — the classic silent
    # partial conversion (ADVICE r04).
    state["encoder.0.dconv.layers.0.7.content.weight"] = np.zeros((4, 4, 1), np.float32)
    with pytest.raises(KeyError, match="dconv.layers.0.7"):
        convert_demucs_state_dict(state, DM_CFG)


def test_demucs_missing_tensor_named():
    state = _demucs_state()
    del state["tencoder.1.conv.bias"]
    with pytest.raises(KeyError, match="tencoder.1.conv.bias"):
        convert_demucs_state_dict(state, DM_CFG)


def test_demucs_transposed_shape_flagged():
    manifest = demucs_manifest(DM_CFG)
    shapes = {name: np.asarray(v).shape for name, v in _demucs_state().items()}
    shapes["encoder.0.conv.weight"] = tuple(reversed(shapes["encoder.0.conv.weight"]))
    validation = manifest.validate(shapes)
    assert any(e[0] == "encoder.0.conv.weight" for e in validation.shape_mismatches)


def test_demucs_structural_kwarg_mismatch_refused():
    with pytest.raises(ValueError, match="dconv_mode"):
        config_from_checkpoint_kwargs({"dconv_mode": 3})
    with pytest.raises(ValueError, match="cac"):
        config_from_checkpoint_kwargs({"cac": False})
    with pytest.raises(ValueError, match="norm_starts"):
        config_from_checkpoint_kwargs({"norm_starts": 2, "depth": 4})


def test_demucs_benign_and_matching_kwargs_accepted(caplog):
    cfg = config_from_checkpoint_kwargs(
        {
            "depth": 4,
            "channels": 48,
            "cac": True,
            "rewrite": True,
            "multi_freqs": [],
            "norm_starts": 4,
            "rescale": 0.1,
            "t_dropout": 0.02,
            "use_train_segment": True,
        }
    )
    assert cfg.depth == 4 and cfg.channels == 48


def test_demucs_unknown_kwarg_warns(monkeypatch):
    # The repo logger may have propagation configured off by earlier tests
    # (configure_logging), so capture the warning at the logger object.
    from ser_tpu._internal.utils import logger as logger_mod

    records: list[str] = []
    real_get = logger_mod.get_logger

    def capture_get(name):
        log = real_get(name)

        class _Capture:
            def warning(self, msg, *args):
                records.append(msg % args if args else msg)

            def __getattr__(self, attr):
                return getattr(log, attr)

        return _Capture()

    monkeypatch.setattr(logger_mod, "get_logger", capture_get)
    config_from_checkpoint_kwargs({"mystery_knob": 7})
    assert any("mystery_knob" in message for message in records)


# --------------------------------------------------------------------------- #
# staged-dir shape reading
# --------------------------------------------------------------------------- #


def test_read_checkpoint_shapes_safetensors_header_only(tmp_path):
    state = {
        "a.weight": np.zeros((3, 5), np.float32),
        "b.bias": np.zeros((7,), np.float32),
    }
    model_dir = _write_hf_dir(tmp_path / "m", state, {})
    assert read_checkpoint_shapes(model_dir) == {"a.weight": (3, 5), "b.bias": (7,)}


def test_demucs_default_manifest_pins_real_checkpoint_shapes():
    """First-contact contract for the PUBLISHED htdemucs artifact: the
    default config's manifest carries the real checkpoint's key shapes
    (derived from the released architecture: 4 sources, stereo, channels 48,
    depth 4, nfft 4096, bottom 512, 5 transformer layers)."""
    manifest = demucs_manifest(DemucsV4Config())
    required = manifest.required
    # Freq embedding: 2048 bins / stride 4 rows, `channels` wide.
    assert required["freq_emb.embedding.weight"] == (512, 48)
    # First freq encoder layer consumes cac stereo (2*2 channels).
    assert required["encoder.0.conv.weight"] == (48, 4, 8, 1)
    # Deepest channels: 48 * 2**3 = 384; bottom upsampler maps 384 -> 512.
    assert required["channel_upsampler.weight"] == (512, 384, 1)
    # Output heads: 4 sources * cac stereo channels.
    assert required["decoder.3.conv_tr.weight"] == (48, 16, 8, 1)
    # Cross-domain transformer at bottom_channels with packed in_proj.
    assert required["crosstransformer.layers.0.cross_attn.in_proj_weight"] == (
        1536,
        512,
    )
    # Even layers are cross-attention, odd are self-attention (published
    # CrossTransformerEncoder alternation).
    assert required["crosstransformer.layers_t.4.cross_attn.in_proj_weight"] == (
        1536,
        512,
    )
    assert required["crosstransformer.layers_t.3.self_attn.in_proj_weight"] == (
        1536,
        512,
    )
    # Every tensor of the synthetic published-layout state dict is covered.
    from ser_tpu.models._demucs_synthetic import synthetic_state_dict

    state = synthetic_state_dict(DemucsV4Config.tiny(), seed=0)
    tiny_manifest = demucs_manifest(DemucsV4Config.tiny())
    assert tiny_manifest.validate(
        {name: np.asarray(v).shape for name, v in state.items()}
    ).ok
