"""FunASR/ModelScope emotion2vec checkpoint → flax wav2vec2-family params.

Parity surface: reference ``ser/_internal/repr/emotion2vec.py:275-300`` drives
``iic/emotion2vec_plus_large`` through FunASR's ``AutoModel``; the checkpoint
on disk is a single ``model.pt`` whose state dict follows fairseq's
data2vec-2.0 multi-model naming (emotion2vec is data2vec-2.0 audio):

- ``modality_encoders.AUDIO.local_encoder.conv_layers.{i}.0.weight`` strided
  conv frontend (per-layer LN at ``.2.1.{weight,bias}`` in layer-norm mode,
  group norm at ``conv_layers.0.2.{weight,bias}`` in default mode);
- ``modality_encoders.AUDIO.project_features`` — a plain Linear or a
  Sequential carrying ``(TransposeLast, LayerNorm, Linear)`` at indices 1/2;
- ``modality_encoders.AUDIO.relative_positional_encoder.{i}.0.*`` — stacked
  grouped conv positional blocks (``conv_pos_depth`` of them);
- ``modality_encoders.AUDIO.context_encoder.blocks.{i}.*`` — prenet
  transformer blocks, then the shared trunk at ``blocks.{i}.*`` — both in
  AltBlock naming (``norm1``, fused ``attn.qkv``, ``attn.proj``, ``norm2``,
  ``mlp.fc1/fc2``, optional layer-scale ``gamma_1/gamma_2``);
- optional final ``norm.{weight,bias}``.

Prenet + trunk map onto one flat pre-norm ``Wav2Vec2Encoder`` stack (they are
structurally identical blocks applied back to back); fused QKV splits into
q/k/v thirds; layer-scale folds into the following projection (elementwise
per-output-channel, so ``gamma ⊙ (Wx + b) == (gamma ⊙ W)x + gamma ⊙ b``).
EMA teacher, decoder, and classifier-head tensors are inference-irrelevant
and skipped. Config is inferred from tensor shapes, so no config.json is
required. Layout assumptions are pinned by a structurally faithful synthetic
checkpoint in ``tests/suites/unit/models/test_emotion2vec_convert.py``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models.wav2vec2 import Wav2Vec2Config

logger = get_logger(__name__)

_AUDIO = "modality_encoders.AUDIO."
_SKIP_PREFIXES = ("decoder.", "_ema", "ema.", "proj.", "regression_head.")


def load_funasr_state_dict(model_dir: str | Path) -> dict[str, np.ndarray]:
    """Loads ``model.pt`` tensors as numpy, normalizing the key prefix."""
    import torch

    path = Path(model_dir) / "model.pt"
    if not path.is_file():
        raise FileNotFoundError(f"No FunASR checkpoint (model.pt) in {model_dir}.")
    try:
        raw = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        # Genuine fairseq envelopes carry non-tensor objects (omegaconf cfg,
        # optimizer state) that the weights_only unpickler rejects. The
        # checkpoint is operator-staged (trusted input by the same policy
        # that lets us run its weights), so retry with full unpickling.
        logger.warning(
            "weights_only load of %s failed; retrying with full unpickling "
            "(fairseq-style envelope).",
            path,
        )
        raw = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw and isinstance(raw["model"], dict):
        raw = raw["model"]  # fairseq-style envelope
    state: dict[str, np.ndarray] = {}
    for key, value in raw.items():
        if not hasattr(value, "shape"):
            continue  # envelope scalars/objects
        if key.startswith("model."):
            key = key[len("model.") :]
        if any(key.startswith(prefix) for prefix in _SKIP_PREFIXES):
            continue
        if key.startswith(_AUDIO + "decoder."):
            continue
        if value.dtype == torch.bfloat16:
            value = value.float()  # numpy has no bf16; convert via f32
        state[key] = np.asarray(value)
    return state


def _count_blocks(state: dict, prefix: str) -> int:
    indices = set()
    for key in state:
        if key.startswith(prefix):
            rest = key[len(prefix) :]
            head = rest.split(".", 1)[0]
            if head.isdigit():
                indices.add(int(head))
    return len(indices)


def config_from_funasr_state(state: dict[str, np.ndarray]) -> Wav2Vec2Config:
    """Infers the architecture from checkpoint tensor shapes."""
    conv_prefix = _AUDIO + "local_encoder.conv_layers."
    n_convs = _count_blocks(state, conv_prefix)
    if n_convs == 0:
        raise KeyError("Checkpoint lacks the data2vec-2.0 audio conv frontend.")
    conv_dim, conv_kernel = [], []
    for i in range(n_convs):
        weight = state[f"{conv_prefix}{i}.0.weight"]  # (out, in, k)
        conv_dim.append(int(weight.shape[0]))
        conv_kernel.append(int(weight.shape[2]))
    # Strides are not serialized; the published emotion2vec/data2vec audio
    # frontends all use the wav2vec2 schedule (5,2,2,2,2,2,2) truncated to
    # the layer count.
    conv_stride = tuple(([5] + [2] * (n_convs - 1))[:n_convs])

    if _AUDIO + "project_features.weight" in state:
        hidden = int(state[_AUDIO + "project_features.weight"].shape[0])
        feature_norm = False
    elif _AUDIO + "project_features.2.weight" in state:
        hidden = int(state[_AUDIO + "project_features.2.weight"].shape[0])
        feature_norm = _AUDIO + "project_features.1.weight" in state
    else:
        raise KeyError("Checkpoint lacks project_features.")

    n_prenet = _count_blocks(state, _AUDIO + "context_encoder.blocks.")
    n_trunk = _count_blocks(state, "blocks.")
    if n_trunk == 0:
        raise KeyError("Checkpoint lacks trunk transformer blocks.")
    fc1 = state.get("blocks.0.mlp.fc1.weight")
    intermediate = int(fc1.shape[0]) if fc1 is not None else 4 * hidden

    pos_prefix = _AUDIO + "relative_positional_encoder."
    pos_depth = _count_blocks(state, pos_prefix)
    if pos_depth == 0:
        # Weights for a positional encoder cannot be invented; a layout
        # without one is unsupported and must fail loudly here rather than
        # as a raw KeyError mid-conversion.
        raise KeyError(
            "Checkpoint serializes no relative_positional_encoder blocks; "
            "the data2vec-2.0 conv positional encoder is required."
        )
    pos_kernel = int(state[f"{pos_prefix}0.0.weight"].shape[2])
    pos_groups_in = int(state[f"{pos_prefix}0.0.weight"].shape[1])
    pos_groups = max(1, hidden // pos_groups_in)
    num_pos = pos_kernel * pos_depth

    return Wav2Vec2Config(
        hidden_size=hidden,
        num_hidden_layers=n_prenet + n_trunk,
        num_attention_heads=max(1, hidden // 64),
        intermediate_size=intermediate,
        conv_dim=tuple(conv_dim),
        conv_kernel=tuple(conv_kernel),
        conv_stride=conv_stride,
        num_conv_pos_embeddings=num_pos,
        num_conv_pos_embedding_groups=pos_groups,
        feat_extract_norm=(
            "layer" if f"{conv_prefix}0.2.1.weight" in state else "group"
        ),
        do_stable_layer_norm=True,
        conv_pos_depth=max(1, pos_depth),
        feature_norm_before_projection=feature_norm,
        encoder_norm="norm.weight" in state,
    )


def _conv_kernel(weight: np.ndarray) -> np.ndarray:
    return weight.transpose(2, 1, 0)  # torch (out, in, k) → flax (k, in, out)


def _block_params(state: dict, base: str, hidden: int) -> dict:
    """One AltBlock → TransformerLayer params (QKV split, gamma folded)."""
    qkv_w = state[f"{base}.attn.qkv.weight"]  # (3h, h)
    qkv_b = state.get(f"{base}.attn.qkv.bias", np.zeros(3 * hidden, qkv_w.dtype))
    pieces = {}
    for slot, name in enumerate(("q", "k", "v")):
        pieces[name] = {
            "kernel": qkv_w[slot * hidden : (slot + 1) * hidden].T,
            "bias": qkv_b[slot * hidden : (slot + 1) * hidden],
        }
    proj_w = state[f"{base}.attn.proj.weight"].T  # (h_in, h_out)
    proj_b = state[f"{base}.attn.proj.bias"]
    gamma_1 = state.get(f"{base}.gamma_1")
    if gamma_1 is not None:
        proj_w = proj_w * gamma_1[None, :]
        proj_b = proj_b * gamma_1
    fc2_w = state[f"{base}.mlp.fc2.weight"].T
    fc2_b = state[f"{base}.mlp.fc2.bias"]
    gamma_2 = state.get(f"{base}.gamma_2")
    if gamma_2 is not None:
        fc2_w = fc2_w * gamma_2[None, :]
        fc2_b = fc2_b * gamma_2
    return {
        "attn_ln": {
            "scale": state[f"{base}.norm1.weight"],
            "bias": state[f"{base}.norm1.bias"],
        },
        **pieces,
        "attn_out": {"kernel": proj_w, "bias": proj_b},
        "ffn_ln": {
            "scale": state[f"{base}.norm2.weight"],
            "bias": state[f"{base}.norm2.bias"],
        },
        "ffn_in": {
            "kernel": state[f"{base}.mlp.fc1.weight"].T,
            "bias": state[f"{base}.mlp.fc1.bias"],
        },
        "ffn_out": {"kernel": fc2_w, "bias": fc2_b},
    }


def load_funasr_emotion2vec_params(
    model_dir: str | Path,
) -> tuple[Wav2Vec2Config, dict]:
    """Converts a staged FunASR emotion2vec checkpoint.

    Returns ``(inferred config, flax param tree)`` for ``Wav2Vec2Encoder``.
    """
    raw_state = load_funasr_state_dict(model_dir)
    config = config_from_funasr_state(raw_state)
    hidden = config.hidden_size

    class _Tracking(dict):
        """Records consumed keys so layout variants fail loudly, not silently."""

        consumed: set[str] = set()

        def __getitem__(self, key):
            self.consumed.add(key)
            return super().__getitem__(key)

        def get(self, key, default=None):
            self.consumed.add(key)
            return super().get(key, default)

    state = _Tracking(raw_state)
    state.consumed = set()

    params: dict = {"feature_encoder": {}, "pos_embed": {}}
    fe = params["feature_encoder"]
    conv_prefix = _AUDIO + "local_encoder.conv_layers."
    for i in range(len(config.conv_dim)):
        conv: dict = {"kernel": _conv_kernel(state[f"{conv_prefix}{i}.0.weight"])}
        bias = state.get(f"{conv_prefix}{i}.0.bias")
        if config.feat_extract_norm == "layer":
            conv["bias"] = (
                bias if bias is not None else np.zeros(config.conv_dim[i], np.float32)
            )
            fe[f"conv_ln_{i}"] = {
                "scale": state[f"{conv_prefix}{i}.2.1.weight"],
                "bias": state[f"{conv_prefix}{i}.2.1.bias"],
            }
        elif i == 0 and f"{conv_prefix}0.2.weight" in state:
            fe["conv_gn"] = {
                "scale": state[f"{conv_prefix}0.2.weight"],
                "bias": state[f"{conv_prefix}0.2.bias"],
            }
        fe[f"conv_{i}"] = conv

    if _AUDIO + "project_features.weight" in state:
        params["feature_projection"] = {
            "kernel": state[_AUDIO + "project_features.weight"].T,
            "bias": state[_AUDIO + "project_features.bias"],
        }
    else:
        params["feature_projection"] = {
            "kernel": state[_AUDIO + "project_features.2.weight"].T,
            "bias": state[_AUDIO + "project_features.2.bias"],
        }
        if config.feature_norm_before_projection:
            params["feature_ln"] = {
                "scale": state[_AUDIO + "project_features.1.weight"],
                "bias": state[_AUDIO + "project_features.1.bias"],
            }

    # Param naming must match the encoder's module choice: depth > 1 builds
    # StackedConvPositionalEmbedding (`pos_conv_{i}`); depth 1 builds the
    # single wav2vec2-style ConvPositionalEmbedding (`pos_conv`).
    pos_prefix = _AUDIO + "relative_positional_encoder."
    if config.conv_pos_depth > 1:
        for i in range(config.conv_pos_depth):
            params["pos_embed"][f"pos_conv_{i}"] = {
                "kernel": _conv_kernel(state[f"{pos_prefix}{i}.0.weight"]),
                "bias": state[f"{pos_prefix}{i}.0.bias"],
            }
    else:
        params["pos_embed"]["pos_conv"] = {
            "kernel": _conv_kernel(state[f"{pos_prefix}0.0.weight"]),
            "bias": state[f"{pos_prefix}0.0.bias"],
        }

    layer = 0
    n_prenet = _count_blocks(state, _AUDIO + "context_encoder.blocks.")
    for i in range(n_prenet):
        params[f"layer_{layer}"] = _block_params(
            state, f"{_AUDIO}context_encoder.blocks.{i}", hidden
        )
        layer += 1
    for i in range(_count_blocks(state, "blocks.")):
        params[f"layer_{layer}"] = _block_params(state, f"blocks.{i}", hidden)
        layer += 1

    if config.encoder_norm:
        params["encoder_final_ln"] = {
            "scale": state["norm.weight"],
            "bias": state["norm.bias"],
        }

    # A layout variant whose tensors were silently dropped would produce
    # embeddings that are quietly wrong — the opposite of the loud
    # missing-key policy above. Positional-encoder LayerNorms are the one
    # known-benign leftover (the module applies them non-affinely).
    pos_ln = _AUDIO + "relative_positional_encoder."
    unconsumed = {
        key
        for key in raw_state
        if key not in state.consumed
        and not (key.startswith(pos_ln) and ".0." not in key)
    }
    if unconsumed:
        preview = ", ".join(sorted(unconsumed)[:8])
        raise KeyError(
            f"Checkpoint layout variant not understood: {len(unconsumed)} "
            f"unconsumed tensor(s) (e.g. {preview}). Refusing to load a "
            "partial conversion."
        )
    return config, params


__all__ = [
    "config_from_funasr_state",
    "load_funasr_emotion2vec_params",
    "load_funasr_state_dict",
]
