"""Hybrid Transformer Demucs (demucs v4) in JAX — real-weight separation lane.

The reference's ``use_demucs`` path runs the published ``htdemucs`` model over
the input before transcription (reference
``ser/_internal/transcript/backends/stable_whisper.py:272-478`` drives the
demucs v4 separator through stable-ts). This module is a faithful TPU-native
reimplementation of that architecture — dual spectrogram/waveform U-Nets with
GLU-gated convolutions and dilated-conv residual branches, a cross-domain
transformer bottleneck, complex-as-channels spectrogram output — plus a
converter from the published torch checkpoint layout
(``htdemucs``'s ``.th`` file: ``{"klass", "kwargs", "state"}`` or a raw
``state_dict``) into the in-house flat ``.npz`` the zero-egress runtime
stages. Weight-layout fidelity is pinned by
``tests/suites/unit/models/test_demucs_convert.py`` (structural, published
names) and numerics by
``tests/suites/integration/models/test_demucs_torch_mirror.py`` (forward
agreement against a torch mirror of the published module definitions).

Design notes (TPU):
- The forward is FUNCTIONAL over a nested param dict (like
  ``whisper_decode``): conv weights stay in torch layouts (OIHW/OIW) and run
  through ``lax.conv_general_dilated`` with explicit dimension numbers — no
  transposition at conversion time means no transposition bugs.
- Everything is static-shape; segments are batched into ONE device call and
  blended with the published triangular overlap-add on the host.
- The SER lane is 16 kHz mono; htdemucs is a 44.1 kHz stereo model. The
  entry point resamples (scipy polyphase, 441/160), duplicates mono to
  stereo, separates, takes the vocals stem, downmixes, and resamples back —
  the same adaptation stable-ts applies around demucs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.activations import gelu_erf as _gelu

_EPS = 1e-5


@dataclass(frozen=True)
class DemucsV4Config:
    """htdemucs architecture hyperparameters (defaults = published htdemucs).

    Field names follow the published constructor so ``kwargs`` recorded in a
    checkpoint can be cross-checked mechanically.
    """

    sources: tuple[str, ...] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    depth: int = 4
    nfft: int = 4096
    bottom_channels: int = 512
    t_layers: int = 5
    t_heads: int = 8
    t_hidden_scale: float = 4.0
    kernel_size: int = 8
    stride: int = 4
    dconv_depth: int = 2
    dconv_comp: int = 4
    freq_emb_scale: float = 0.2
    emb_scale: float = 10.0
    max_period: float = 10000.0
    sample_rate: int = 44100
    segment_seconds: float = 7.8
    overlap: float = 0.25

    @property
    def hop(self) -> int:
        return self.nfft // 4

    @property
    def freq_bins(self) -> int:
        return self.nfft // 2

    @property
    def segment_samples(self) -> int:
        return int(self.segment_seconds * self.sample_rate)

    def layer_channels(self, index: int) -> int:
        return self.channels * self.growth**index

    @classmethod
    def tiny(cls) -> "DemucsV4Config":
        """Test-size model: sub-second CPU forward, same wiring."""
        return cls(
            sources=("other", "vocals"),
            audio_channels=2,
            channels=4,
            depth=2,
            nfft=64,
            bottom_channels=16,
            t_layers=3,
            t_heads=2,
            sample_rate=44100,
            segment_seconds=0.02,
        )


# --------------------------------------------------------------------------- #
# torch-layout conv/norm primitives
# --------------------------------------------------------------------------- #


def _conv1d(x, p, *, stride=1, padding=0, groups=1):
    """(B, C, T) with torch-layout weight (O, I/groups, K)."""
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def _conv2d(x, p, *, stride=(1, 1), padding=((0, 0), (0, 0))):
    """(B, C, F, T) with torch-layout weight (O, I, Kf, Kt)."""
    out = jax.lax.conv_general_dilated(
        x,
        p["weight"],
        window_strides=stride,
        padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None, None]
    return out


def _conv_transpose1d(x, p, *, stride):
    """torch ``ConvTranspose1d`` (weight (I, O, K), padding 0) via dilated conv."""
    w = p["weight"]  # (in, out, k)
    k = w.shape[-1]
    kernel = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (out, in, k) correlation
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None]
    return out


def _conv_transpose2d(x, p, *, stride):
    """torch ``ConvTranspose2d`` with kernel/stride on the FREQ axis only."""
    w = p["weight"]  # (in, out, kf, kt=1)
    kf = w.shape[2]
    kernel = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=[(kf - 1, kf - 1), (0, 0)],
        lhs_dilation=(stride, 1),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        out = out + p["bias"][None, :, None, None]
    return out


def _group_norm(x, p, *, groups, eps=1e-5):
    """torch ``GroupNorm`` over (B, C, *spatial)."""
    shape = x.shape
    b, c = shape[0], shape[1]
    grouped = x.reshape(b, groups, -1)
    mean = grouped.mean(axis=-1, keepdims=True)
    var = grouped.var(axis=-1, keepdims=True)
    normed = ((grouped - mean) / jnp.sqrt(var + eps)).reshape(shape)
    expand = (1, c) + (1,) * (len(shape) - 2)
    return normed * p["weight"].reshape(expand) + p["bias"].reshape(expand)


def _layer_norm(x, p, *, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _glu(x, axis=1):
    value, gate = jnp.split(x, 2, axis=axis)
    return value * jax.nn.sigmoid(gate)


# --------------------------------------------------------------------------- #
# Encoder / decoder layers (published HEncLayer / HDecLayer / DConv)
# --------------------------------------------------------------------------- #


def _dconv(x, layers):
    """Dilated residual branch (published ``DConv``): (B, C, T).

    Each block: Conv1d(k=3, dilation d, pad d) → GroupNorm(1) → GELU →
    Conv1d(1x1, 2C) → GroupNorm(1) → GLU → LayerScale; residual add.
    Dilation is structural (2**block, the published ``dilate=True`` growth),
    not a tensor — keeping it off the tree keeps the forward jittable.
    """
    for index, block in enumerate(layers):
        dilation = 2**index
        y = jax.lax.conv_general_dilated(
            x,
            block["conv1"]["weight"],
            window_strides=(1,),
            padding=[(dilation, dilation)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        ) + block["conv1"]["bias"][None, :, None]
        y = _gelu(_group_norm(y, block["norm1"], groups=1))
        y = _conv1d(y, block["conv2"])
        y = _glu(_group_norm(y, block["norm2"], groups=1))
        x = x + y * block["scale"][None, :, None]
    return x


def _henc_layer(x, p, cfg: DemucsV4Config, *, freq: bool):
    """Published ``HEncLayer``: strided conv → GELU → DConv → 1x1 GLU rewrite.

    htdemucs (depth 4, norm_starts=4) uses Identity norms in every layer.
    """
    pad = cfg.kernel_size // 4
    if freq:
        y = _conv2d(
            x, p["conv"], stride=(cfg.stride, 1), padding=((pad, pad), (0, 0))
        )
    else:
        length = x.shape[-1]
        if length % cfg.stride != 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, cfg.stride - length % cfg.stride)))
        y = _conv1d(x, p["conv"], stride=cfg.stride, padding=pad)
    y = _gelu(y)
    if freq:
        b, c, fr, t = y.shape
        flat = y.transpose(0, 2, 1, 3).reshape(b * fr, c, t)
        flat = _dconv(flat, p["dconv"])
        y = flat.reshape(b, fr, c, t).transpose(0, 2, 1, 3)
        z = _glu(_conv2d(y, p["rewrite"]))
    else:
        y = _dconv(y, p["dconv"])
        z = _glu(_conv1d(y, p["rewrite"]))
    return z


def _hdec_layer(x, skip, p, cfg: DemucsV4Config, *, freq: bool, last: bool, length: int):
    """Published ``HDecLayer``: skip add → 3-ctx GLU rewrite → transposed conv."""
    pad = cfg.kernel_size // 4
    x = x + skip
    if freq:
        y = _glu(_conv2d(x, p["rewrite"], padding=((1, 1), (1, 1))))
        z = _conv_transpose2d(y, p["conv_tr"], stride=cfg.stride)
        z = z[:, :, pad:-pad, :]
    else:
        y = _glu(_conv1d(x, p["rewrite"], padding=1))
        z = _conv_transpose1d(y, p["conv_tr"], stride=cfg.stride)
        z = z[:, :, pad : pad + length]
    if not last:
        z = _gelu(z)
    return z


# --------------------------------------------------------------------------- #
# Cross-domain transformer (published CrossTransformerEncoder)
# --------------------------------------------------------------------------- #


def _mha(q, kv, p, *, heads):
    """torch ``nn.MultiheadAttention`` (batch_first, packed in_proj). (B,T,C)."""
    d = q.shape[-1]
    w, b = p["in_proj_weight"], p["in_proj_bias"]
    qp = q @ w[:d].T + b[:d]
    kp = kv @ w[d : 2 * d].T + b[d : 2 * d]
    vp = kv @ w[2 * d :].T + b[2 * d :]
    head_dim = d // heads

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], heads, head_dim)

    scores = jnp.einsum("bqhd,bkhd->bhqk", split(qp), split(kp)) / jnp.sqrt(
        jnp.asarray(head_dim, dtype=q.dtype)
    )
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, split(vp))
    out = out.reshape(q.shape[0], q.shape[1], d)
    return out @ p["out_proj"]["weight"].T + p["out_proj"]["bias"]


def _ff_block(x, p):
    return _gelu(x @ p["linear1"]["weight"].T + p["linear1"]["bias"]) @ p[
        "linear2"
    ]["weight"].T + p["linear2"]["bias"]


def _channel_groupnorm_last(x, p):
    """``MyGroupNorm(1, C)`` on (B, T, C): joint (T, C) stats, per-C affine."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5) * p["weight"] + p["bias"]


def _self_layer(x, p, *, heads):
    """``MyTransformerEncoderLayer`` (norm_first, layer-scaled)."""
    y = x + p["gamma_1"] * _mha(
        _layer_norm(x, p["norm1"]), _layer_norm(x, p["norm1"]), p["self_attn"], heads=heads
    )
    y = y + p["gamma_2"] * _ff_block(_layer_norm(y, p["norm2"]), p)
    if "norm_out" in p:
        y = _channel_groupnorm_last(y, p["norm_out"])
    return y


def _cross_layer(q, kv, p, *, heads):
    """``CrossTransformerEncoderLayer`` (norm_first, layer-scaled)."""
    k = _layer_norm(kv, p["norm2"])
    y = q + p["gamma_1"] * _mha(_layer_norm(q, p["norm1"]), k, p["cross_attn"], heads=heads)
    y = y + p["gamma_2"] * _ff_block(_layer_norm(y, p["norm3"]), p)
    if "norm_out" in p:
        y = _channel_groupnorm_last(y, p["norm_out"])
    return y


def _sin_embedding_1d(length: int, dim: int, max_period: float) -> np.ndarray:
    """Published ``create_sin_embedding``: cos | sin halves, (T, dim)."""
    pos = np.arange(length)[:, None]
    half = dim // 2
    adim = np.arange(half)[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)], axis=1).astype(np.float32)


def _sin_embedding_2d(dim: int, height: int, width: int, max_period: float) -> np.ndarray:
    """Published ``create_2d_sin_embedding``: (dim, H, W), interleaved halves."""
    if dim % 4 != 0:
        raise ValueError("2D sinusoidal embedding needs dim % 4 == 0.")
    pe = np.zeros((dim, height, width), dtype=np.float32)
    half = dim // 2
    div = np.exp(np.arange(0.0, half, 2) * -(np.log(max_period) / half))
    pos_w = np.arange(width)[:, None]
    pos_h = np.arange(height)[:, None]
    sin_w = np.sin(pos_w * div).T[:, None, :]  # (half/2, 1, W)
    cos_w = np.cos(pos_w * div).T[:, None, :]
    pe[0:half:2] = np.repeat(sin_w, height, axis=1)
    pe[1:half:2] = np.repeat(cos_w, height, axis=1)
    sin_h = np.sin(pos_h * div).T[:, :, None]  # (half/2, H, 1)
    cos_h = np.cos(pos_h * div).T[:, :, None]
    pe[half::2] = np.repeat(sin_h, width, axis=2)
    pe[half + 1 :: 2] = np.repeat(cos_h, width, axis=2)
    return pe


def _crosstransformer(x, xt, p, cfg: DemucsV4Config):
    """(B, C, Fr, T) spectral + (B, C, T) temporal token streams.

    Published wiring (``classic_parity=1``): even layers are CROSS
    (each branch attends the other's pre-update tokens), odd layers are
    SELF, applied branchwise.
    """
    b, c, fr, t1 = x.shape
    # (b, c, fr, t1) -> tokens ordered (t1, fr) as in the published rearrange.
    tokens = x.transpose(0, 3, 2, 1).reshape(b, t1 * fr, c)
    pos2d = (
        jnp.asarray(_sin_embedding_2d(c, fr, t1, cfg.max_period))
        .transpose(2, 1, 0)
        .reshape(t1 * fr, c)
    )
    tokens = _layer_norm(tokens, p["norm_in"]) + pos2d[None]

    t2 = xt.shape[-1]
    tokens_t = xt.transpose(0, 2, 1)
    pos1d = jnp.asarray(_sin_embedding_1d(t2, c, cfg.max_period))
    tokens_t = _layer_norm(tokens_t, p["norm_in_t"]) + pos1d[None]

    for index in range(cfg.t_layers):
        lp, lpt = p["layers"][index], p["layers_t"][index]
        if index % 2 == 1:
            tokens = _self_layer(tokens, lp, heads=cfg.t_heads)
            tokens_t = _self_layer(tokens_t, lpt, heads=cfg.t_heads)
        else:
            old = tokens
            tokens = _cross_layer(tokens, tokens_t, lp, heads=cfg.t_heads)
            tokens_t = _cross_layer(tokens_t, old, lpt, heads=cfg.t_heads)

    x = tokens.reshape(b, t1, fr, c).transpose(0, 3, 2, 1)
    xt = tokens_t.transpose(0, 2, 1)
    return x, xt


# --------------------------------------------------------------------------- #
# Spectrogram path (published _spec / _magnitude / _mask / _ispec)
# --------------------------------------------------------------------------- #


def _hann_periodic(n: int) -> np.ndarray:
    return np.hanning(n + 1)[:-1].astype(np.float32)


def _stft(x: jax.Array, nfft: int, hop: int) -> jax.Array:
    """torch.stft(center=True, reflect, normalized=True): (B, T) → (B, F, frames)."""
    window = jnp.asarray(_hann_periodic(nfft))
    pad = nfft // 2
    padded = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (padded.shape[-1] - nfft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]
    frames = padded[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1) * (nfft**-0.5)
    return spec.transpose(0, 2, 1)  # (B, F, frames)


def _istft(z: jax.Array, nfft: int, hop: int, length: int) -> jax.Array:
    """Inverse of :func:`_stft` (torch.istft semantics): (B, F, frames) → (B, T)."""
    window = _hann_periodic(nfft)
    frames = jnp.fft.irfft(z.transpose(0, 2, 1) * (nfft**0.5), n=nfft, axis=-1)
    frames = frames * jnp.asarray(window)[None, None, :]
    b, n_frames, _ = frames.shape
    total = (n_frames - 1) * hop + nfft
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]).reshape(-1)
    signal = jnp.zeros((b, total), dtype=frames.dtype)
    signal = signal.at[:, idx].add(frames.reshape(b, -1))
    weight = np.zeros(total)
    np.add.at(weight, idx, np.tile(window * window, n_frames))
    signal = signal / jnp.asarray(np.maximum(weight, 1e-10), dtype=signal.dtype)
    pad = nfft // 2
    return signal[:, pad : pad + length]


def _spec(mix: jax.Array, cfg: DemucsV4Config) -> jax.Array:
    """(B, C, L) → complex (B, C, freq_bins, le) per the published ``_spec``."""
    b, c, length = mix.shape
    hop = cfg.hop
    le = int(np.ceil(length / hop))
    pad = hop // 2 * 3
    flat = mix.reshape(b * c, length)
    flat = jnp.pad(flat, ((0, 0), (pad, pad + le * hop - length)), mode="reflect")
    z = _stft(flat, cfg.nfft, hop)
    z = z[:, : cfg.freq_bins, 2 : 2 + le]  # drop Nyquist row + edge frames
    return z.reshape(b, c, cfg.freq_bins, le)


def _ispec(z: jax.Array, cfg: DemucsV4Config, length: int) -> jax.Array:
    """Inverse of :func:`_spec`: complex (..., freq_bins, le) → (..., length)."""
    *lead, freqs, le = z.shape
    hop = cfg.hop
    z = jnp.pad(z.reshape(-1, freqs, le), ((0, 0), (0, 1), (2, 2)))
    pad = hop // 2 * 3
    total = hop * int(np.ceil(length / hop)) + 2 * pad
    x = _istft(z, cfg.nfft, hop, total)
    x = x[:, pad : pad + length]
    return x.reshape(*lead, length)


# --------------------------------------------------------------------------- #
# Full forward
# --------------------------------------------------------------------------- #


def demucs_forward(params: dict, mix: jax.Array, config: DemucsV4Config) -> jax.Array:
    """One segment through htdemucs: (B, C, L) → (B, sources, C, L).

    Faithful restatement of the published ``HTDemucs.forward`` (eval mode):
    cac spectrogram + std normalization, dual encoders with the frequency
    embedding after layer 0, bottom channel up/down-samplers around the
    cross-domain transformer, skip decoders, complex-as-channels output
    recombined with the waveform branch.
    """
    cfg = config
    b, _, length = mix.shape
    n_sources = len(cfg.sources)

    z = _spec(mix, cfg)
    # cac: (B, C, F, T) complex → (B, 2C, F, T) channels [re, im] per channel.
    mag = jnp.stack([z.real, z.imag], axis=2).reshape(
        b, 2 * cfg.audio_channels, cfg.freq_bins, z.shape[-1]
    )
    mean = mag.mean(axis=(1, 2, 3), keepdims=True)
    # ddof=1: torch .std() is the UNBIASED estimator — the constant cancels
    # in the spec-output rescale but shifts the network's input scale.
    std = mag.std(axis=(1, 2, 3), keepdims=True, ddof=1)
    x = (mag - mean) / (_EPS + std)

    meant = mix.mean(axis=(1, 2), keepdims=True)
    stdt = mix.std(axis=(1, 2), keepdims=True, ddof=1)
    xt = (mix - meant) / (_EPS + stdt)

    saved, saved_t, lengths_t = [], [], []
    for idx in range(cfg.depth):
        lengths_t.append(xt.shape[-1])
        xt = _henc_layer(xt, params["tencoder"][idx], cfg, freq=False)
        saved_t.append(xt)
        x = _henc_layer(x, params["encoder"][idx], cfg, freq=True)
        if idx == 0:
            frs = x.shape[2]
            emb = (params["freq_emb"]["weight"][:frs] * cfg.emb_scale).T
            x = x + cfg.freq_emb_scale * emb[None, :, :, None]
        saved.append(x)

    bb, cc, fr, t1 = x.shape
    flat = x.reshape(bb, cc, fr * t1)
    flat = _conv1d(flat, params["channel_upsampler"])
    x = flat.reshape(bb, -1, fr, t1)
    xt = _conv1d(xt, params["channel_upsampler_t"])

    x, xt = _crosstransformer(x, xt, params["crosstransformer"], cfg)

    flat = x.reshape(bb, x.shape[1], fr * t1)
    flat = _conv1d(flat, params["channel_downsampler"])
    x = flat.reshape(bb, -1, fr, t1)
    xt = _conv1d(xt, params["channel_downsampler_t"])

    for idx in range(cfg.depth):
        last = idx == cfg.depth - 1
        x = _hdec_layer(
            x, saved.pop(), params["decoder"][idx], cfg, freq=True, last=last, length=0
        )
        xt = _hdec_layer(
            xt,
            saved_t.pop(),
            params["tdecoder"][idx],
            cfg,
            freq=False,
            last=last,
            length=lengths_t.pop(),
        )

    # Complex-as-channels output → per-source complex masks applied as spec.
    x = x.reshape(b, n_sources, 2 * cfg.audio_channels, cfg.freq_bins, -1)
    x = x * std[:, None] + mean[:, None]
    x = x.reshape(b, n_sources, cfg.audio_channels, 2, cfg.freq_bins, x.shape[-1])
    zout = jax.lax.complex(x[:, :, :, 0], x[:, :, :, 1])
    spec_out = _ispec(zout, cfg, length)

    xt = xt.reshape(b, n_sources, cfg.audio_channels, length)
    xt = xt * stdt[:, None] + meant[:, None]
    return spec_out + xt


_compiled_forward = jax.jit(demucs_forward, static_argnums=(2,))


@partial(jax.jit, static_argnums=(2, 3))
def _compiled_vocals_forward(params, mix, config, vocals_index):
    """Forward + on-device stem select/downmix: (B, C, T) → vocals (B, T).

    The separation lane consumes ONLY the mono vocals stem; fetching the
    full (B, sources, C, T) stem tensor moves 8x the bytes (88 MB per
    8-segment dispatch at 44.1 kHz — seconds over a remote link).
    """
    out = demucs_forward(params, mix, config)
    return out[:, vocals_index].mean(axis=1)


# --------------------------------------------------------------------------- #
# Checkpoint conversion (published torch layout → nested tree → .npz)
# --------------------------------------------------------------------------- #


def _take(state, name: str) -> np.ndarray:
    if name not in state:
        raise KeyError(f"Missing demucs weight {name!r}.")
    return np.asarray(state.take(name), dtype=np.float32)


def _conv_entry(state, base) -> dict:
    # Every conv/linear in the published htdemucs layout carries a bias; a
    # missing one is a doctored/truncated checkpoint, not a variant.
    return {
        "weight": _take(state, f"{base}.weight"),
        "bias": _take(state, f"{base}.bias"),
    }


def _norm_entry(state, base) -> dict:
    return {
        "weight": _take(state, f"{base}.weight"),
        "bias": _take(state, f"{base}.bias"),
    }


def _dconv_entries(state, base, depth) -> list[dict]:
    blocks = []
    for j in range(depth):
        # Published Sequential indices: 0=conv 1=norm 2=GELU 3=conv 4=norm
        # 5=GLU 6=LayerScale; dilation (2**j) is implied by position.
        blocks.append(
            {
                "conv1": _conv_entry(state, f"{base}.layers.{j}.0"),
                "norm1": _norm_entry(state, f"{base}.layers.{j}.1"),
                "conv2": _conv_entry(state, f"{base}.layers.{j}.3"),
                "norm2": _norm_entry(state, f"{base}.layers.{j}.4"),
                "scale": _take(state, f"{base}.layers.{j}.6.scale"),
            }
        )
    return blocks


def _transformer_layer_entry(state, base, *, cross: bool) -> dict:
    attn = "cross_attn" if cross else "self_attn"
    entry = {
        attn: {
            "in_proj_weight": _take(state, f"{base}.{attn}.in_proj_weight"),
            "in_proj_bias": _take(state, f"{base}.{attn}.in_proj_bias"),
            "out_proj": _conv_entry(state, f"{base}.{attn}.out_proj"),
        },
        "linear1": _conv_entry(state, f"{base}.linear1"),
        "linear2": _conv_entry(state, f"{base}.linear2"),
        "norm1": _norm_entry(state, f"{base}.norm1"),
        "norm2": _norm_entry(state, f"{base}.norm2"),
        "gamma_1": _take(state, f"{base}.gamma_1.scale"),
        "gamma_2": _take(state, f"{base}.gamma_2.scale"),
    }
    if cross:
        entry["norm3"] = _norm_entry(state, f"{base}.norm3")
    if f"{base}.norm_out.weight" in state:
        entry["norm_out"] = _norm_entry(state, f"{base}.norm_out")
    return entry


def convert_demucs_state_dict(state: dict, config: DemucsV4Config) -> dict:
    """Published htdemucs ``state_dict`` → the functional param tree above.

    Accepts numpy arrays or torch tensors as values (tensors are detached via
    ``np.asarray``); raises ``KeyError`` naming the first missing weight. A
    checkpoint variant whose extra submodules only ADD keys (dconv attn/lstm
    branches, non-Identity norms) refuses the load instead of converting into
    a forward that omits those weights (consumed-key audit, mirroring the
    reference's load-info validation ``hf_whisper.py:444-485``).
    """
    from ser_tpu.models.checkpoint_audit import AuditedState, unconsumed_key_error

    state = AuditedState(state)
    cfg = config
    params: dict = {
        "freq_emb": {"weight": _take(state, "freq_emb.embedding.weight")},
        "channel_upsampler": _conv_entry(state, "channel_upsampler"),
        "channel_downsampler": _conv_entry(state, "channel_downsampler"),
        "channel_upsampler_t": _conv_entry(state, "channel_upsampler_t"),
        "channel_downsampler_t": _conv_entry(state, "channel_downsampler_t"),
        "encoder": [],
        "tencoder": [],
        "decoder": [],
        "tdecoder": [],
    }
    for idx in range(cfg.depth):
        for branch, tree in (("encoder", "encoder"), ("tencoder", "tencoder")):
            base = f"{branch}.{idx}"
            params[tree].append(
                {
                    "conv": _conv_entry(state, f"{base}.conv"),
                    "rewrite": _conv_entry(state, f"{base}.rewrite"),
                    "dconv": _dconv_entries(state, f"{base}.dconv", cfg.dconv_depth),
                }
            )
        for branch in ("decoder", "tdecoder"):
            # Published decoders run deepest-first: decoder.0 consumes the
            # transformer output, decoder.{depth-1} emits the output heads.
            base = f"{branch}.{idx}"
            params[branch].append(
                {
                    "rewrite": _conv_entry(state, f"{base}.rewrite"),
                    "conv_tr": _conv_entry(state, f"{base}.conv_tr"),
                }
            )
    transformer: dict = {
        "norm_in": _norm_entry(state, "crosstransformer.norm_in"),
        "norm_in_t": _norm_entry(state, "crosstransformer.norm_in_t"),
        "layers": [],
        "layers_t": [],
    }
    for index in range(cfg.t_layers):
        cross = index % 2 == 0
        transformer["layers"].append(
            _transformer_layer_entry(
                state, f"crosstransformer.layers.{index}", cross=cross
            )
        )
        transformer["layers_t"].append(
            _transformer_layer_entry(
                state, f"crosstransformer.layers_t.{index}", cross=cross
            )
        )
    params["crosstransformer"] = transformer
    leftovers = state.unconsumed()
    if leftovers:
        raise unconsumed_key_error(leftovers, model="demucs v4")
    return params


#: Structural constructor kwargs whose values the JAX forward hardcodes.
#: htdemucs ships with exactly these (Identity norms below ``norm_starts``,
#: encoder-only DConv, GLU rewrites, 3-context decoder rewrite, cac output,
#: pre-norm sin-embedding dense transformer); a checkpoint recording a
#: DIFFERENT value would need forward-path branches this port does not
#: implement, so conversion must refuse it rather than produce wrong audio.
_ASSUMED_STRUCTURAL_KWARGS: dict[str, tuple] = {
    "cac": (True,),
    "rewrite": (True,),
    "multi_freqs": ((), [], None),
    "norm_groups": (4,),
    "dconv_mode": (1,),
    "context": (1,),
    "context_enc": (0,),
    "channels_time": (None,),
    "wiener_iters": (0,),
    "end_iters": (0,),
    "wiener_residual": (False,),
    "t_gelu": (True,),
    "t_norm_first": (True,),
    "t_norm_out": (True,),
    "t_emb": ("sin",),
    "t_cross_first": (False,),
    "t_layer_scale": (True,),
    "t_sparse_self_attn": (False,),
    "t_sparse_cross_attn": (False,),
    "t_max_period": (10000.0, 10000),
    "t_weight_pos_embed": (1.0, 1),
    "time_stride": (2,),
}

#: Kwargs consumed by :func:`config_from_checkpoint_kwargs` below.
_CONSUMED_KWARGS = frozenset(
    {
        "sources",
        "audio_channels",
        "channels",
        "growth",
        "depth",
        "nfft",
        "bottom_channels",
        "t_layers",
        "t_heads",
        "t_hidden_scale",
        "kernel_size",
        "stride",
        "dconv_depth",
        "dconv_comp",
        "freq_emb",
        "emb_scale",
        "samplerate",
        "segment",
    }
)

#: Training-/init-time kwargs with no effect on the trained forward pass
#: (dropout is inactive at eval, rescale/emb_smooth/dconv_init only shape
#: initialization, cape/sparse knobs are dead when their modes are off).
_BENIGN_KWARGS = frozenset(
    {
        "rescale",
        "emb_smooth",
        "use_train_segment",
        "t_dropout",
        "t_weight_decay",
        "t_lr",
        "t_cape_mean_normalize",
        "t_cape_augment",
        "t_cape_glob_loc_scale",
        "t_sin_random_shift",
        "t_max_positions",
        "t_mask_type",
        "t_mask_random_seed",
        "t_sparse_attn_window",
        "t_global_window",
        "t_sparsity",
        "t_auto_sparsity",
        "multi_freqs_depth",
        "dconv_init",
        "norm_starts",
    }
)


def config_from_checkpoint_kwargs(kwargs: dict) -> DemucsV4Config:
    """Builds a config from a checkpoint's recorded constructor kwargs.

    Structural kwargs the forward hardcodes are cross-checked: a variant
    recording e.g. ``dconv_mode=3`` or ``cac=False`` raises instead of
    silently converting into a different architecture. ``norm_starts`` is
    validated against ``depth`` (Identity norms assume no enc/dec layer ever
    reaches the GroupNorm regime); wholly unknown kwargs log a warning.
    """
    for name, accepted in _ASSUMED_STRUCTURAL_KWARGS.items():
        if name in kwargs and kwargs[name] not in accepted:
            raise ValueError(
                f"Checkpoint kwarg {name}={kwargs[name]!r} differs from the "
                f"structure this port implements (expected one of {accepted}); "
                "refusing to convert into a mismatched architecture."
            )
    depth = int(kwargs.get("depth", 4))
    norm_starts = int(kwargs.get("norm_starts", 4))
    if norm_starts < depth:
        raise ValueError(
            f"Checkpoint kwarg norm_starts={norm_starts} < depth={depth}: "
            "layers past norm_starts use GroupNorm, which this port's "
            "Identity-norm encoder/decoder stack does not implement."
        )
    unknown = sorted(
        name
        for name in kwargs
        if name not in _CONSUMED_KWARGS
        and name not in _BENIGN_KWARGS
        and name not in _ASSUMED_STRUCTURAL_KWARGS
    )
    if unknown:
        from ser_tpu._internal.utils.logger import get_logger

        get_logger(__name__).warning(
            "Unrecognized demucs checkpoint kwargs %s ignored; verify the "
            "converted output against the source model.",
            ", ".join(unknown),
        )
    mapping = {
        "sources": tuple(kwargs.get("sources", DemucsV4Config.sources)),
        "audio_channels": kwargs.get("audio_channels", 2),
        "channels": kwargs.get("channels", 48),
        "growth": int(kwargs.get("growth", 2)),
        "depth": kwargs.get("depth", 4),
        "nfft": kwargs.get("nfft", 4096),
        "bottom_channels": kwargs.get("bottom_channels", 512),
        "t_layers": kwargs.get("t_layers", 5),
        "t_heads": kwargs.get("t_heads", 8),
        "t_hidden_scale": kwargs.get("t_hidden_scale", 4.0),
        "kernel_size": kwargs.get("kernel_size", 8),
        "stride": kwargs.get("stride", 4),
        "dconv_depth": kwargs.get("dconv_depth", 2),
        "dconv_comp": kwargs.get("dconv_comp", 4),
        "freq_emb_scale": kwargs.get("freq_emb", 0.2),
        "emb_scale": kwargs.get("emb_scale", 10.0),
        "sample_rate": kwargs.get("samplerate", 44100),
        "segment_seconds": float(kwargs.get("segment", 7.8)),
    }
    return DemucsV4Config(**mapping)


def load_torch_checkpoint(path) -> tuple[dict, DemucsV4Config]:
    """Reads a published ``.th`` file (or raw state dict) via torch.

    The released htdemucs artifact is ``torch.save({"klass", "kwargs",
    "state"})`` with half-precision tensors; a bare ``state_dict`` converts
    with the default config.
    """
    import torch

    package = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(package, dict) and "state" in package:
        state = package["state"]
        config = config_from_checkpoint_kwargs(dict(package.get("kwargs") or {}))
    else:
        state = package
        config = DemucsV4Config()
    state = {
        key: np.asarray(value.detach().float() if hasattr(value, "detach") else value)
        for key, value in state.items()
    }
    return convert_demucs_state_dict(state, config), config


# --------------------------------------------------------------------------- #
# .npz staging (self-describing, zero-pickle — mirrors models/separation.py)
# --------------------------------------------------------------------------- #

_CONFIG_KEY = "__demucs_v4_config__"


def _flatten(tree, prefix="") -> dict:
    flat: dict = {}
    items = tree.items() if isinstance(tree, dict) else enumerate(tree)
    for key, value in items:
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, (dict, list)):
            flat.update(_flatten(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def save_demucs_npz(params: dict, path, *, config: DemucsV4Config) -> None:
    flat = _flatten(params)
    record = dataclasses.asdict(config)
    record["sources"] = list(record["sources"])
    flat[_CONFIG_KEY] = np.frombuffer(
        json.dumps(record).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **flat)


def _is_int_keyed(node: dict) -> bool:
    return bool(node) and all(key.isdigit() for key in node)


def _listify(node):
    if not isinstance(node, dict):
        return node
    if _is_int_keyed(node):
        return [_listify(node[str(i)]) for i in range(len(node))]
    return {key: _listify(value) for key, value in node.items()}


def load_demucs_npz(path) -> tuple[dict, DemucsV4Config]:
    nested: dict = {}
    config: DemucsV4Config | None = None
    with np.load(path) as archive:
        for flat_key in archive.files:
            if flat_key == _CONFIG_KEY:
                record = json.loads(bytes(archive[flat_key]).decode("utf-8"))
                record["sources"] = tuple(record["sources"])
                config = DemucsV4Config(**record)
                continue
            node = nested
            *parents, leaf = [part for part in flat_key.split("/") if part]
            for parent in parents:
                node = node.setdefault(parent, {})
            node[leaf] = jnp.asarray(archive[flat_key])
    if config is None:
        raise ValueError(f"{path} carries no bundled demucs config record.")
    return _listify(nested), config


def is_demucs_npz(path) -> bool:
    """True when a staged ``.npz`` is a converted htdemucs checkpoint."""
    try:
        with np.load(path) as archive:
            return _CONFIG_KEY in archive.files
    except (OSError, ValueError):
        return False


def convert_demucs_checkpoint(source_path, target_path) -> DemucsV4Config:
    """One-call converter: published ``.th`` → staged in-house ``.npz``."""
    params, config = load_torch_checkpoint(source_path)
    save_demucs_npz(params, target_path, config=config)
    return config


# --------------------------------------------------------------------------- #
# Vocal-separation entry point (16 kHz mono SER lane)
# --------------------------------------------------------------------------- #


def init_demucs_params(config: DemucsV4Config, *, seed: int = 0) -> dict:
    """Random-init tree via a synthetic state dict (tests / smoke)."""
    from ser_tpu.models._demucs_synthetic import synthetic_state_dict

    return convert_demucs_state_dict(synthetic_state_dict(config, seed=seed), config)


def separate_vocals_demucs(
    audio: np.ndarray,
    sample_rate: int,
    *,
    params: dict,
    config: DemucsV4Config,
) -> np.ndarray:
    """Mono waveform → vocals stem at the input rate.

    The published inference recipe around one forward: resample to the
    model's rate, mono → stereo, cut ``segment_seconds`` windows at
    ``overlap`` fractional overlap, run the windows in bounded fixed-shape
    device batches (``SER_DEMUCS_MAX_DEVICE_ROWS`` per dispatch), blend with
    the published triangular weight, take the ``vocals`` stem, downmix,
    resample back.
    """
    from math import gcd

    from scipy.signal import resample_poly

    audio = np.asarray(audio, dtype=np.float32)
    if audio.size == 0:
        return audio
    cfg = config
    # Commit the param tree to device ONCE per call: host-numpy leaves would
    # re-upload the full ~320 MB tree on EVERY chunk dispatch (the dominant
    # cost of the lane over a remote link — SEPARATION_BENCH_r05). Loaders
    # that cache device-resident trees (separate_vocals_auto) make this a
    # no-op.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    if sample_rate != cfg.sample_rate:
        g = gcd(cfg.sample_rate, sample_rate)
        up, down = cfg.sample_rate // g, sample_rate // g
        work = resample_poly(audio, up, down).astype(np.float32)
    else:
        work = audio
    length = work.size
    segment = cfg.segment_samples
    stride = max(1, int(segment * (1.0 - cfg.overlap)))
    starts = list(range(0, max(length - segment, 0) + 1, stride))
    if not starts or starts[-1] + segment < length:
        starts.append(max(0, length - segment))
    padded = np.pad(work, (0, max(0, starts[-1] + segment - length)))

    # Bounded per-dispatch batch: device memory must stay flat in clip
    # duration (an hour of 44.1 kHz audio is ~600 overlapped segments — one
    # batched forward over all of them would OOM a single chip on the first
    # encoder activation alone), and the jitted forward must see ONE row
    # count for long clips so new durations never recompile the full model
    # (remote-tunnel compiles take minutes; the persistent cache is
    # disabled). Short clips still round up pow2 below the cap, so at most
    # log2(cap)+1 shapes ever compile per process. Padded rows are all-zero
    # and discarded after each call.
    max_rows = max(1, int(os.environ.get("SER_DEMUCS_MAX_DEVICE_ROWS", "8")))
    chunk_rows = min(max_rows, 1 << max(0, (len(starts) - 1).bit_length()))

    vocals_index = cfg.sources.index("vocals")
    # Published triangular transition weight.
    weight = np.concatenate(
        [np.arange(1, segment // 2 + 1), np.arange(segment - segment // 2, 0, -1)]
    ).astype(np.float32)
    weight = weight / weight.max()
    acc = np.zeros(padded.size, dtype=np.float64)
    norm = np.zeros(padded.size, dtype=np.float64)
    for chunk_base in range(0, len(starts), chunk_rows):
        chunk = starts[chunk_base : chunk_base + chunk_rows]
        batch = np.stack([padded[s : s + segment] for s in chunk])
        if len(chunk) < chunk_rows:
            batch = np.pad(batch, ((0, chunk_rows - len(chunk)), (0, 0)))
        stereo = np.repeat(batch[:, None, :], cfg.audio_channels, axis=1)
        vocal = np.asarray(
            _compiled_vocals_forward(params, jnp.asarray(stereo), cfg, vocals_index)
        )[: len(chunk)]
        for row, start in enumerate(chunk):
            acc[start : start + segment] += vocal[row] * weight
            norm[start : start + segment] += weight
    blended = (acc / np.maximum(norm, 1e-8))[:length].astype(np.float32)

    if sample_rate != cfg.sample_rate:
        g = gcd(cfg.sample_rate, sample_rate)
        blended = resample_poly(blended, sample_rate // g, cfg.sample_rate // g)
        blended = np.asarray(blended, dtype=np.float32)[: audio.size]
        if blended.size < audio.size:
            blended = np.pad(blended, (0, audio.size - blended.size))
    return blended


__all__ = [
    "DemucsV4Config",
    "convert_demucs_checkpoint",
    "convert_demucs_state_dict",
    "config_from_checkpoint_kwargs",
    "demucs_forward",
    "init_demucs_params",
    "is_demucs_npz",
    "load_demucs_npz",
    "load_torch_checkpoint",
    "save_demucs_npz",
    "separate_vocals_demucs",
]
