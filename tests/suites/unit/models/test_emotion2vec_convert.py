"""FunASR emotion2vec conversion against a structurally faithful checkpoint.

The synthetic ``model.pt`` reproduces the fairseq data2vec-2.0 audio key
layout (the format behind ``iic/emotion2vec_plus_large``; reference
``emotion2vec.py:275-300`` consumes it through FunASR) with tiny dimensions
and random values — the VERDICT's sanctioned stand-in for real weights in a
zero-egress environment.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ser_tpu.models import emotion2vec_convert as e2v
from ser_tpu.models.wav2vec2 import Wav2Vec2Encoder

HIDDEN = 64
HEADS = 1  # inferred as hidden // 64
FFN = 128
CONV_DIMS = (32, 32)
CONV_KERNELS = (10, 3)
PRENET, TRUNK = 2, 3
POS_DEPTH, POS_KERNEL, POS_GROUPS = 2, 5, 4


def _altblock(rng, hidden=HIDDEN, ffn=FFN, gamma=False):
    block = {
        "norm1.weight": rng.standard_normal(hidden),
        "norm1.bias": rng.standard_normal(hidden),
        "attn.qkv.weight": rng.standard_normal((3 * hidden, hidden)),
        "attn.qkv.bias": rng.standard_normal(3 * hidden),
        "attn.proj.weight": rng.standard_normal((hidden, hidden)),
        "attn.proj.bias": rng.standard_normal(hidden),
        "norm2.weight": rng.standard_normal(hidden),
        "norm2.bias": rng.standard_normal(hidden),
        "mlp.fc1.weight": rng.standard_normal((ffn, hidden)),
        "mlp.fc1.bias": rng.standard_normal(ffn),
        "mlp.fc2.weight": rng.standard_normal((hidden, ffn)),
        "mlp.fc2.bias": rng.standard_normal(hidden),
    }
    if gamma:
        block["gamma_1"] = rng.standard_normal(hidden)
        block["gamma_2"] = rng.standard_normal(hidden)
    return block


def build_synthetic_checkpoint(tmp_path, *, gamma=False, envelope=False):
    rng = np.random.default_rng(0)
    audio = "modality_encoders.AUDIO."
    state = {}
    in_dim = 1
    for i, (dim, kernel) in enumerate(zip(CONV_DIMS, CONV_KERNELS)):
        state[f"{audio}local_encoder.conv_layers.{i}.0.weight"] = rng.standard_normal(
            (dim, in_dim, kernel)
        )
        state[f"{audio}local_encoder.conv_layers.{i}.2.1.weight"] = rng.standard_normal(dim)
        state[f"{audio}local_encoder.conv_layers.{i}.2.1.bias"] = rng.standard_normal(dim)
        in_dim = dim
    # project_features as d2v2-audio ships it: Sequential(Transpose, LN, Linear).
    state[f"{audio}project_features.1.weight"] = rng.standard_normal(CONV_DIMS[-1])
    state[f"{audio}project_features.1.bias"] = rng.standard_normal(CONV_DIMS[-1])
    state[f"{audio}project_features.2.weight"] = rng.standard_normal((HIDDEN, CONV_DIMS[-1]))
    state[f"{audio}project_features.2.bias"] = rng.standard_normal(HIDDEN)
    for i in range(POS_DEPTH):
        state[f"{audio}relative_positional_encoder.{i}.0.weight"] = rng.standard_normal(
            (HIDDEN, HIDDEN // POS_GROUPS, POS_KERNEL)
        )
        state[f"{audio}relative_positional_encoder.{i}.0.bias"] = rng.standard_normal(HIDDEN)
    for i in range(PRENET):
        for key, value in _altblock(rng, gamma=gamma).items():
            state[f"{audio}context_encoder.blocks.{i}.{key}"] = value
    for i in range(TRUNK):
        for key, value in _altblock(rng, gamma=gamma).items():
            state[f"blocks.{i}.{key}"] = value
    state["norm.weight"] = rng.standard_normal(HIDDEN)
    state["norm.bias"] = rng.standard_normal(HIDDEN)
    # Inference-irrelevant tensors the converter must skip.
    state["decoder.proj.weight"] = rng.standard_normal((HIDDEN, HIDDEN))
    state["_ema.blocks.0.norm1.weight"] = rng.standard_normal(HIDDEN)
    state["proj.weight"] = rng.standard_normal((9, HIDDEN))  # plus classifier head

    tensors = {k: torch.from_numpy(np.asarray(v, dtype=np.float32)) for k, v in state.items()}
    payload = {"model": tensors} if envelope else tensors
    model_dir = tmp_path / "emotion2vec_plus_large"
    model_dir.mkdir(parents=True, exist_ok=True)
    torch.save(payload, model_dir / "model.pt")
    return model_dir


def test_config_inferred_from_shapes(tmp_path):
    model_dir = build_synthetic_checkpoint(tmp_path)
    config, params = e2v.load_funasr_emotion2vec_params(model_dir)
    assert config.hidden_size == HIDDEN
    assert config.num_hidden_layers == PRENET + TRUNK
    assert config.intermediate_size == FFN
    assert config.conv_dim == CONV_DIMS
    assert config.conv_kernel == CONV_KERNELS
    assert config.conv_pos_depth == POS_DEPTH
    assert config.feature_norm_before_projection
    assert config.encoder_norm
    assert f"layer_{PRENET + TRUNK - 1}" in params


def test_converted_params_run_through_the_flax_encoder(tmp_path):
    import jax.numpy as jnp

    model_dir = build_synthetic_checkpoint(tmp_path)
    config, params = e2v.load_funasr_emotion2vec_params(model_dir)
    encoder = Wav2Vec2Encoder(config)
    waveform = jnp.asarray(
        0.1 * np.random.default_rng(1).standard_normal((1, 1600)), dtype=jnp.float32
    )
    hidden = encoder.apply({"params": params}, waveform)
    assert hidden.shape[0] == 1 and hidden.shape[2] == HIDDEN
    assert np.isfinite(np.asarray(hidden)).all()


def test_layer_scale_folds_into_projections(tmp_path):
    model_dir = build_synthetic_checkpoint(tmp_path, gamma=True)
    config, params = e2v.load_funasr_emotion2vec_params(model_dir)
    state = e2v.load_funasr_state_dict(model_dir)
    gamma_1 = state["blocks.0.gamma_1"]
    raw_proj = state["blocks.0.attn.proj.weight"].T
    folded = params[f"layer_{PRENET}"]["attn_out"]["kernel"]
    np.testing.assert_allclose(folded, raw_proj * gamma_1[None, :], rtol=1e-6)


def test_fairseq_envelope_and_skip_keys(tmp_path):
    model_dir = build_synthetic_checkpoint(tmp_path, envelope=True)
    state = e2v.load_funasr_state_dict(model_dir)
    assert not any(k.startswith(("decoder.", "_ema", "proj.")) for k in state)
    config, _ = e2v.load_funasr_emotion2vec_params(model_dir)
    assert config.num_hidden_layers == PRENET + TRUNK


def test_backend_loads_funasr_checkpoint_without_random_init(tmp_path, monkeypatch):
    """The VERDICT done-criterion: no SER_ALLOW_RANDOM_INIT needed."""
    monkeypatch.delenv("SER_ALLOW_RANDOM_INIT", raising=False)
    cache_root = tmp_path / "cache"
    model_dir = cache_root / "iic" / "emotion2vec_plus_large"
    model_dir.mkdir(parents=True)
    built = build_synthetic_checkpoint(tmp_path / "staging")
    (model_dir / "model.pt").write_bytes((built / "model.pt").read_bytes())

    from ser_tpu._internal.repr.emotion2vec_backend import Emotion2VecBackend

    backend = Emotion2VecBackend(
        model_id="iic/emotion2vec_plus_large", cache_root=cache_root
    )
    audio = (0.1 * np.random.default_rng(2).standard_normal(16000)).astype(np.float32)
    encoded = backend.encode_sequence(audio, 16000)
    assert encoded.backend_id == "emotion2vec"
    assert encoded.embeddings.shape[1] == HIDDEN
    assert np.isfinite(encoded.embeddings).all()


def test_depth_one_positional_encoder_converts_and_runs(tmp_path):
    """A single relative_positional_encoder block must map to the encoder's
    'pos_conv' module name (depth 1 selects ConvPositionalEmbedding)."""
    import jax.numpy as jnp

    model_dir = build_synthetic_checkpoint(tmp_path)
    import torch as _torch

    payload = _torch.load(model_dir / "model.pt", weights_only=True)
    audio = "modality_encoders.AUDIO."
    for key in list(payload):
        if key.startswith(f"{audio}relative_positional_encoder.1."):
            del payload[key]
    _torch.save(payload, model_dir / "model.pt")

    config, params = e2v.load_funasr_emotion2vec_params(model_dir)
    assert config.conv_pos_depth == 1
    assert "pos_conv" in params["pos_embed"]
    encoder = Wav2Vec2Encoder(config)
    out = encoder.apply(
        {"params": params}, jnp.zeros((1, 1600), dtype=jnp.float32)
    )
    assert np.isfinite(np.asarray(out)).all()


def test_unknown_layout_tensor_fails_loudly(tmp_path):
    model_dir = build_synthetic_checkpoint(tmp_path)
    import torch as _torch

    payload = _torch.load(model_dir / "model.pt", weights_only=True)
    payload["modality_encoders.AUDIO.post_extract_proj.weight"] = _torch.zeros(
        (HIDDEN, HIDDEN)
    )
    _torch.save(payload, model_dir / "model.pt")
    with pytest.raises(KeyError, match="unconsumed"):
        e2v.load_funasr_emotion2vec_params(model_dir)


def test_bf16_checkpoint_converts(tmp_path):
    model_dir = build_synthetic_checkpoint(tmp_path)
    import torch as _torch

    payload = _torch.load(model_dir / "model.pt", weights_only=True)
    payload = {k: v.to(_torch.bfloat16) for k, v in payload.items()}
    _torch.save(payload, model_dir / "model.pt")
    config, params = e2v.load_funasr_emotion2vec_params(model_dir)
    assert params["feature_projection"]["kernel"].dtype == np.float32
