"""wav2vec2 / XLS-R speech encoder in flax (medium-profile compute core).

TPU-native reimplementation of the model class behind the reference's
``hf_xlsr`` backend (reference ``ser/_internal/repr/hf_xlsr.py`` drives
``facebook/wav2vec2-xls-r-300m`` through torch/transformers). Architecture
follows the public wav2vec2 2.0 design: strided conv feature encoder →
grouped-conv positional embedding → pre-norm transformer stack. Everything is
static-shape and einsum-based so XLA tiles attention/FFN matmuls onto the MXU;
bf16 activation policy is a constructor knob.

Weights convert from a local HF checkpoint (safetensors or torch .bin) via
``load_hf_wav2vec2_params``; random init is supported for tests/benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.activations import gelu_erf as _gelu


@dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters (defaults = XLS-R 300M)."""

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    feat_extract_norm: str = "layer"  # "layer" (XLS-R) or "group" (base)
    do_stable_layer_norm: bool = True  # pre-norm transformer (XLS-R)
    # data2vec-2.0 audio (emotion2vec) replaces the single 128-wide grouped
    # pos-conv with a stack of smaller conv blocks (conv → non-affine LN →
    # GELU); depth 1 keeps the wav2vec2 module.
    conv_pos_depth: int = 1
    # Structural switches detected from a checkpoint at conversion time: a
    # layout without these norms must not gain normalizations the original
    # never applied.
    feature_norm_before_projection: bool = True
    encoder_norm: bool = True
    # Conv-frontend lowering: "conv" keeps XLA's convolution op; "matmul"
    # rewrites each strided conv as a strided-slice patch gather + ONE dense
    # matmul (contraction k*C_in = 1536 for the k=3 stack) so the frontend
    # rides the MXU instead of the convolution unit. Same param tree and
    # reduction set — checkpoints and numerics are interchangeable.
    frontend_impl: str = "conv"  # "conv" | "matmul"

    @property
    def frame_stride_samples(self) -> int:
        stride = 1
        for s in self.conv_stride:
            stride *= s
        return stride  # 320 → 20 ms at 16 kHz

    @property
    def frame_receptive_samples(self) -> int:
        receptive = 1
        for k, s in zip(reversed(self.conv_kernel), reversed(self.conv_stride)):
            receptive = (receptive - 1) * s + k
        return receptive  # 400 → 25 ms at 16 kHz

    @classmethod
    def tiny(cls) -> "Wav2Vec2Config":
        """Small config for tests and sharding dry-runs.

        Keeps the PRODUCTION conv stack strides (320-sample frames, 20 ms at
        16 kHz) at tiny widths: an earlier 2-layer stack (stride 10) left
        frame counts ~32x production, making attention quadratic in
        waveform length — a 2 s clip cost seconds and a 30 s clip gigabytes
        on the CPU test mesh, and pooled windows saw 1600 frames where
        production sees 50. Matching the production frame rate keeps
        tiny-config behavior representative AND cheap.
        """
        return cls(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            conv_dim=(32, 32, 32, 32, 32, 32, 32),
            conv_kernel=(10, 3, 3, 3, 3, 2, 2),
            conv_stride=(5, 2, 2, 2, 2, 2, 2),
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )


class _PatchMatmulConv(nn.Module):
    """VALID strided 1-D conv evaluated as patch-gather + one matmul.

    Parameter tree (``kernel`` of shape (k, C_in, C_out), optional ``bias``)
    matches ``nn.Conv`` exactly, so the two lowerings share checkpoints. The
    reduction set also matches (one dot over the k*C_in axis), so outputs are
    bit-comparable up to dot-order rounding.
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.stride
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, c_in, self.features),
        )
        t_out = (x.shape[1] - k) // s + 1
        # Tap-major patch layout matches kernel.reshape(k * c_in, features).
        taps = [x[:, j : j + s * t_out : s, :] for j in range(k)]
        patches = jnp.concatenate(taps, axis=-1)
        dtype = self.dtype or x.dtype
        y = jnp.dot(
            patches.astype(dtype),
            kernel.reshape(k * c_in, self.features).astype(dtype),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvFeatureEncoder(nn.Module):
    """Strided 1-D conv stack mapping raw waveform to latent frames."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, waveform: jax.Array) -> jax.Array:
        # waveform: (B, T) → (B, frames, conv_dim[-1])
        x = waveform[:, :, None]
        cfg = self.config
        for i, (dim, kernel, stride) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            if cfg.frontend_impl == "matmul":
                x = _PatchMatmulConv(
                    features=dim,
                    kernel_size=kernel,
                    stride=stride,
                    use_bias=cfg.feat_extract_norm == "layer",
                    name=f"conv_{i}",
                )(x)
            else:
                x = nn.Conv(
                    features=dim,
                    kernel_size=(kernel,),
                    strides=(stride,),
                    use_bias=cfg.feat_extract_norm == "layer",
                    padding="VALID",
                    name=f"conv_{i}",
                )(x)
            if cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"conv_ln_{i}")(x)
            elif i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=cfg.layer_norm_eps, name="conv_gn"
                )(x)
            x = _gelu(x)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped convolution positional embedding (wav2vec2 style)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        pos = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(k,),
            padding=[(k // 2, k // 2)],
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(hidden)
        if k % 2 == 0:
            pos = pos[:, :-1, :]
        return hidden + _gelu(pos)


class StackedConvPositionalEmbedding(nn.Module):
    """data2vec-2.0 positional encoder: N conv blocks, then residual add.

    Each block: grouped 1-D conv (kernel = num_conv_pos_embeddings / depth) →
    non-affine LayerNorm → GELU (fairseq ``D2vModalityConfig.conv_pos_depth``
    semantics as consumed by emotion2vec).
    """

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        cfg = self.config
        k = max(3, cfg.num_conv_pos_embeddings // cfg.conv_pos_depth)
        pos = hidden
        for i in range(cfg.conv_pos_depth):
            pos = nn.Conv(
                features=cfg.hidden_size,
                kernel_size=(k,),
                padding=[(k // 2, k // 2)],
                feature_group_count=cfg.num_conv_pos_embedding_groups,
                name=f"pos_conv_{i}",
            )(pos)
            if k % 2 == 0:
                pos = pos[:, :-1, :]
            pos = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps,
                use_bias=False,
                use_scale=False,
                name=f"pos_ln_{i}",
            )(pos)
            pos = _gelu(pos)
        return hidden + pos


class TransformerLayer(nn.Module):
    """Pre-norm (stable-LN) transformer encoder layer."""

    config: Wav2Vec2Config
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, frame_mask: jax.Array | None = None) -> jax.Array:
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads

        residual = hidden
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(hidden)
        # dtype=compute_dtype keeps matmuls on the bf16 MXU path; softmax and
        # residual stream stay f32.
        q = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype, name="q")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype, name="k")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype, name="v")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, head_dim)

        from ser_tpu.models.attention import multi_head_attention

        attended = multi_head_attention(
            split(q),
            split(k),
            split(v),
            frame_mask=frame_mask,
            compute_dtype=self.compute_dtype,
        )
        attended = attended.reshape(hidden.shape[0], hidden.shape[1], cfg.hidden_size)
        x = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype, name="attn_out")(attended)
        hidden = residual + x.astype(residual.dtype)

        residual = hidden
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_ln")(hidden)
        x = nn.Dense(cfg.intermediate_size, dtype=self.compute_dtype, name="ffn_in")(x)
        x = _gelu(x)
        x = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype, name="ffn_out")(x)
        return residual + x.astype(residual.dtype)


class Wav2Vec2Encoder(nn.Module):
    """Full wav2vec2 encoder: conv frontend → projection → transformer stack."""

    config: Wav2Vec2Config
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, waveform: jax.Array, frame_mask: jax.Array | None = None
    ) -> jax.Array:
        """Encodes (B, T_samples) → (B, T_frames, hidden).

        ``frame_mask`` (B, T_frames) excludes padded frames from attention so
        fixed-shape batching of variable-length chunks stays exact.
        """
        cfg = self.config
        latents = ConvFeatureEncoder(cfg, name="feature_encoder")(waveform)
        if cfg.feature_norm_before_projection:
            latents = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="feature_ln")(latents)
        hidden = nn.Dense(cfg.hidden_size, name="feature_projection")(latents)
        if frame_mask is not None:
            hidden = hidden * frame_mask[:, :, None].astype(hidden.dtype)
        if cfg.conv_pos_depth > 1:
            hidden = StackedConvPositionalEmbedding(cfg, name="pos_embed")(hidden)
        else:
            hidden = ConvPositionalEmbedding(cfg, name="pos_embed")(hidden)
        if cfg.encoder_norm and not cfg.do_stable_layer_norm:
            hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_pre_ln")(hidden)
        for i in range(cfg.num_hidden_layers):
            hidden = TransformerLayer(
                cfg, compute_dtype=self.compute_dtype, name=f"layer_{i}"
            )(hidden, frame_mask)
        if cfg.encoder_norm and cfg.do_stable_layer_norm:
            hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_final_ln")(hidden)
        return hidden


def init_wav2vec2_params(
    config: Wav2Vec2Config, *, seed: int = 0, sample_samples: int = 16000
) -> dict:
    """Deterministic random-init parameters (tests/benchmarks/dry-runs)."""
    model = Wav2Vec2Encoder(config)
    dummy = jnp.zeros((1, sample_samples), dtype=jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


# --------------------------------------------------------------------------- #
# HF checkpoint conversion
# --------------------------------------------------------------------------- #


def _torch_state_dict(model_dir) -> dict[str, np.ndarray]:
    """Loads a local HF checkpoint's tensors as numpy (safetensors or .bin)."""
    from pathlib import Path

    model_dir = Path(model_dir)
    safetensor_files = sorted(model_dir.glob("*.safetensors"))
    if safetensor_files:
        from safetensors.numpy import load_file

        merged: dict[str, np.ndarray] = {}
        for file in safetensor_files:
            merged.update(load_file(str(file)))
        return merged
    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bin_files:
        raise FileNotFoundError(f"No model weights (*.safetensors / *.bin) in {model_dir}.")
    import torch

    merged = {}
    for file in bin_files:
        state = torch.load(str(file), map_location="cpu", weights_only=True)
        merged.update(
            {
                # numpy has no bf16: bf16-exported checkpoints convert via f32.
                k: (v.float() if v.dtype == torch.bfloat16 else v).numpy()
                for k, v in state.items()
            }
        )
    return merged


def config_from_hf_dir(model_dir) -> Wav2Vec2Config:
    """Builds a config from a local HF ``config.json``."""
    import json
    from pathlib import Path

    raw = json.loads((Path(model_dir) / "config.json").read_text(encoding="utf-8"))
    return Wav2Vec2Config(
        hidden_size=raw["hidden_size"],
        num_hidden_layers=raw["num_hidden_layers"],
        num_attention_heads=raw["num_attention_heads"],
        intermediate_size=raw["intermediate_size"],
        conv_dim=tuple(raw["conv_dim"]),
        conv_kernel=tuple(raw["conv_kernel"]),
        conv_stride=tuple(raw["conv_stride"]),
        num_conv_pos_embeddings=raw["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=raw["num_conv_pos_embedding_groups"],
        layer_norm_eps=raw.get("layer_norm_eps", 1e-5),
        feat_extract_norm=raw.get("feat_extract_norm", "layer"),
        do_stable_layer_norm=raw.get("do_stable_layer_norm", True),
    )


def load_hf_wav2vec2_params(model_dir, config: Wav2Vec2Config) -> dict:
    """Converts a local HF wav2vec2 checkpoint into this module's param tree.

    Load-info discipline mirrors the reference's checkpoint validation
    (``hf_whisper.py:444-485``): missing weights raise by name, and any
    tensor the conversion never consumed (an adapter stack, an unexpected
    norm, a renamed layout) refuses the load instead of silently dropping
    weights — see :mod:`ser_tpu.models.checkpoint_audit`.
    """
    from ser_tpu.models.checkpoint_audit import (
        WAV2VEC2_IGNORED,
        AuditedState,
        unconsumed_key_error,
    )

    sd = AuditedState(_torch_state_dict(model_dir))

    def t(name):  # torch tensor by name, with wav2vec2. prefix tolerance
        for key in (name, f"wav2vec2.{name}"):
            if key in sd:
                return sd.take(key)
        raise KeyError(f"Missing weight {name!r} in checkpoint.")

    params: dict = {"feature_encoder": {}, "pos_embed": {}}
    fe = params["feature_encoder"]
    for i in range(len(config.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        conv = {"kernel": t(f"{base}.conv.weight").transpose(2, 1, 0)}
        if config.feat_extract_norm == "layer":
            conv["bias"] = t(f"{base}.conv.bias")
            fe[f"conv_ln_{i}"] = {
                "scale": t(f"{base}.layer_norm.weight"),
                "bias": t(f"{base}.layer_norm.bias"),
            }
        elif i == 0:
            fe["conv_gn"] = {
                "scale": t(f"{base}.layer_norm.weight"),
                "bias": t(f"{base}.layer_norm.bias"),
            }
        fe[f"conv_{i}"] = conv

    params["feature_ln"] = {
        "scale": t("feature_projection.layer_norm.weight"),
        "bias": t("feature_projection.layer_norm.bias"),
    }
    params["feature_projection"] = {
        "kernel": t("feature_projection.projection.weight").T,
        "bias": t("feature_projection.projection.bias"),
    }

    # HF stores the pos-conv kernel weight-normalized: weight = g * v / ||v||.
    # Three on-disk layouts exist: plain `weight`, legacy `weight_g/weight_v`,
    # and torch >= 2.1 parametrized `parametrizations.weight.original0/1`.
    def pos_conv_weight():
        base = "encoder.pos_conv_embed.conv"
        try:
            return t(f"{base}.weight")
        except KeyError:
            pass
        try:
            g = t(f"{base}.weight_g")
            v = t(f"{base}.weight_v")
        except KeyError:
            g = t(f"{base}.parametrizations.weight.original0")
            v = t(f"{base}.parametrizations.weight.original1")
        norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
        return g * v / np.maximum(norm, 1e-12)

    weight = pos_conv_weight()
    params["pos_embed"]["pos_conv"] = {
        "kernel": weight.transpose(2, 1, 0),
        "bias": t("encoder.pos_conv_embed.conv.bias"),
    }

    ln_name = "encoder_final_ln" if config.do_stable_layer_norm else "encoder_pre_ln"
    params[ln_name] = {
        "scale": t("encoder.layer_norm.weight"),
        "bias": t("encoder.layer_norm.bias"),
    }

    for i in range(config.num_hidden_layers):
        base = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "attn_ln": {
                "scale": t(f"{base}.layer_norm.weight"),
                "bias": t(f"{base}.layer_norm.bias"),
            },
            "q": {"kernel": t(f"{base}.attention.q_proj.weight").T, "bias": t(f"{base}.attention.q_proj.bias")},
            "k": {"kernel": t(f"{base}.attention.k_proj.weight").T, "bias": t(f"{base}.attention.k_proj.bias")},
            "v": {"kernel": t(f"{base}.attention.v_proj.weight").T, "bias": t(f"{base}.attention.v_proj.bias")},
            "attn_out": {"kernel": t(f"{base}.attention.out_proj.weight").T, "bias": t(f"{base}.attention.out_proj.bias")},
            "ffn_ln": {
                "scale": t(f"{base}.final_layer_norm.weight"),
                "bias": t(f"{base}.final_layer_norm.bias"),
            },
            "ffn_in": {
                "kernel": t(f"{base}.feed_forward.intermediate_dense.weight").T,
                "bias": t(f"{base}.feed_forward.intermediate_dense.bias"),
            },
            "ffn_out": {
                "kernel": t(f"{base}.feed_forward.output_dense.weight").T,
                "bias": t(f"{base}.feed_forward.output_dense.bias"),
            },
        }

    ignore_exact = tuple(
        variant
        for entry in WAV2VEC2_IGNORED
        if not entry.endswith(".")
        for variant in (entry, f"wav2vec2.{entry}")
    )
    ignore_prefixes = tuple(
        variant
        for entry in WAV2VEC2_IGNORED
        if entry.endswith(".")
        for variant in (entry, f"wav2vec2.{entry}")
    )
    leftovers = sd.unconsumed(
        ignore_exact=ignore_exact, ignore_prefixes=ignore_prefixes
    )
    if leftovers:
        raise unconsumed_key_error(leftovers, model="wav2vec2")
    return params


__all__ = [
    "ConvFeatureEncoder",
    "Wav2Vec2Config",
    "Wav2Vec2Encoder",
    "config_from_hf_dir",
    "init_wav2vec2_params",
    "load_hf_wav2vec2_params",
]
