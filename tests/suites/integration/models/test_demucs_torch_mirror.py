"""Numerical cross-validation of the demucs v4 lane against a torch mirror.

The demucs package itself is not installable here (zero egress), so the
oracle is a torch restatement of the published htdemucs module definitions
(demucs v4: ``HEncLayer``/``HDecLayer``/``DConv`` from demucs/hdemucs.py,
the cross-domain transformer from demucs/transformer.py, spec/cac plumbing
from demucs/htdemucs.py), built from torch primitives with the SAME
submodule names as the released checkpoint. Both sides load one synthetic
state dict in the published layout (``_demucs_synthetic``), so this pins:

- the converter's name→tree mapping and tensor layouts,
- every flax primitive against its torch counterpart (strided/transposed/
  dilated convs, GroupNorm, GLU ordering, MultiheadAttention packing,
  sinusoidal position embeddings, torch.stft ``normalized=True`` scaling).

What it cannot pin is drift between this mirror and the upstream source
itself — both derive from the same public architecture reading; structural
tests live in ``tests/suites/unit/models/test_demucs_convert.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ser_tpu.models import demucs_v4 as dm  # noqa: E402
from ser_tpu.models._demucs_synthetic import synthetic_state_dict  # noqa: E402

CFG = dm.DemucsV4Config.tiny()
ATOL = 2e-4


# --------------------------------------------------------------------------- #
# Torch mirror of the published modules (checkpoint-compatible names)
# --------------------------------------------------------------------------- #


class LayerScale(nn.Module):
    def __init__(self, channels: int, channel_last: bool = False):
        super().__init__()
        self.scale = nn.Parameter(torch.zeros(channels))
        self.channel_last = channel_last

    def forward(self, x):
        if self.channel_last:
            return self.scale * x
        return self.scale[:, None] * x


class DConv(nn.Module):
    def __init__(self, channels: int, compress: int, depth: int):
        super().__init__()
        hidden = max(1, channels // compress)
        self.layers = nn.ModuleList()
        for j in range(depth):
            dilation = 2**j
            self.layers.append(
                nn.Sequential(
                    nn.Conv1d(channels, hidden, 3, dilation=dilation, padding=dilation),
                    nn.GroupNorm(1, hidden),
                    nn.GELU(),
                    nn.Conv1d(hidden, 2 * channels, 1),
                    nn.GroupNorm(1, 2 * channels),
                    nn.GLU(1),
                    LayerScale(channels),
                )
            )

    def forward(self, x):
        for layer in self.layers:
            x = x + layer(x)
        return x


class HEncLayer(nn.Module):
    def __init__(self, chin, chout, cfg, freq: bool):
        super().__init__()
        self.freq, self.stride = freq, cfg.stride
        self.pad = cfg.kernel_size // 4
        if freq:
            self.conv = nn.Conv2d(
                chin, chout, (cfg.kernel_size, 1), (cfg.stride, 1), (self.pad, 0)
            )
            self.rewrite = nn.Conv2d(chout, 2 * chout, 1)
        else:
            self.conv = nn.Conv1d(chin, chout, cfg.kernel_size, cfg.stride, self.pad)
            self.rewrite = nn.Conv1d(chout, 2 * chout, 1)
        self.dconv = DConv(chout, cfg.dconv_comp, cfg.dconv_depth)

    def forward(self, x):
        if not self.freq:
            le = x.shape[-1]
            if le % self.stride != 0:
                x = F.pad(x, (0, self.stride - le % self.stride))
        y = F.gelu(self.conv(x))
        if self.freq:
            b, c, fr, t = y.shape
            y = y.permute(0, 2, 1, 3).reshape(-1, c, t)
            y = self.dconv(y)
            y = y.view(b, fr, c, t).permute(0, 2, 1, 3)
        else:
            y = self.dconv(y)
        return F.glu(self.rewrite(y), dim=1)


class HDecLayer(nn.Module):
    def __init__(self, chin, chout, cfg, freq: bool, last: bool):
        super().__init__()
        self.freq, self.last = freq, last
        self.pad = cfg.kernel_size // 4
        if freq:
            self.rewrite = nn.Conv2d(chin, 2 * chin, 3, 1, 1)
            self.conv_tr = nn.ConvTranspose2d(
                chin, chout, (cfg.kernel_size, 1), (cfg.stride, 1)
            )
        else:
            self.rewrite = nn.Conv1d(chin, 2 * chin, 3, 1, 1)
            self.conv_tr = nn.ConvTranspose1d(chin, chout, cfg.kernel_size, cfg.stride)

    def forward(self, x, skip, length):
        x = x + skip
        y = F.glu(self.rewrite(x), dim=1)
        z = self.conv_tr(y)
        if self.freq:
            z = z[..., self.pad : -self.pad, :]
        else:
            z = z[..., self.pad : self.pad + length]
        if not self.last:
            z = F.gelu(z)
        return z


class MyGroupNorm(nn.GroupNorm):
    def forward(self, x):  # (B, T, C)
        return super().forward(x.transpose(1, 2)).transpose(1, 2)


class SelfLayer(nn.Module):
    def __init__(self, d, heads, hidden):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.linear1, self.linear2 = nn.Linear(d, hidden), nn.Linear(hidden, d)
        self.norm1, self.norm2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.gamma_1, self.gamma_2 = (
            LayerScale(d, channel_last=True),
            LayerScale(d, channel_last=True),
        )
        self.norm_out = MyGroupNorm(1, d)

    def forward(self, x):
        h = self.norm1(x)
        x = x + self.gamma_1(self.self_attn(h, h, h, need_weights=False)[0])
        x = x + self.gamma_2(self.linear2(F.gelu(self.linear1(self.norm2(x)))))
        return self.norm_out(x)


class CrossLayer(nn.Module):
    def __init__(self, d, heads, hidden):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.linear1, self.linear2 = nn.Linear(d, hidden), nn.Linear(hidden, d)
        self.norm1, self.norm2, self.norm3 = (
            nn.LayerNorm(d),
            nn.LayerNorm(d),
            nn.LayerNorm(d),
        )
        self.gamma_1, self.gamma_2 = (
            LayerScale(d, channel_last=True),
            LayerScale(d, channel_last=True),
        )
        self.norm_out = MyGroupNorm(1, d)

    def forward(self, q, k):
        kk = self.norm2(k)
        x = q + self.gamma_1(
            self.cross_attn(self.norm1(q), kk, kk, need_weights=False)[0]
        )
        x = x + self.gamma_2(self.linear2(F.gelu(self.linear1(self.norm3(x)))))
        return self.norm_out(x)


class CrossTransformer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, hidden = cfg.bottom_channels, int(cfg.t_hidden_scale * cfg.bottom_channels)
        self.cfg = cfg
        self.norm_in, self.norm_in_t = nn.LayerNorm(d), nn.LayerNorm(d)
        self.layers, self.layers_t = nn.ModuleList(), nn.ModuleList()
        for index in range(cfg.t_layers):
            klass = CrossLayer if index % 2 == 0 else SelfLayer
            self.layers.append(klass(d, cfg.t_heads, hidden))
            self.layers_t.append(klass(d, cfg.t_heads, hidden))

    def forward(self, x, xt):
        b, c, fr, t1 = x.shape
        pos2d = torch.from_numpy(dm._sin_embedding_2d(c, fr, t1, self.cfg.max_period))
        tokens = x.permute(0, 3, 2, 1).reshape(b, t1 * fr, c)
        tokens = self.norm_in(tokens) + pos2d.permute(2, 1, 0).reshape(t1 * fr, c)[None]
        t2 = xt.shape[-1]
        pos1d = torch.from_numpy(dm._sin_embedding_1d(t2, c, self.cfg.max_period))
        tokens_t = self.norm_in_t(xt.transpose(1, 2)) + pos1d[None]
        for index in range(self.cfg.t_layers):
            if index % 2 == 1:
                tokens = self.layers[index](tokens)
                tokens_t = self.layers_t[index](tokens_t)
            else:
                old = tokens
                tokens = self.layers[index](tokens, tokens_t)
                tokens_t = self.layers_t[index](tokens_t, old)
        x = tokens.reshape(b, t1, fr, c).permute(0, 3, 2, 1)
        return x, tokens_t.transpose(1, 2)


class ScaledEmbedding(nn.Module):
    def __init__(self, num_embeddings, dim, scale):
        super().__init__()
        self.embedding = nn.Embedding(num_embeddings, dim)
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


class TorchHTDemucs(nn.Module):
    """Published ``HTDemucs.forward`` (eval, single segment) from primitives."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        cac = 2 * cfg.audio_channels
        self.encoder, self.tencoder = nn.ModuleList(), nn.ModuleList()
        self.decoder, self.tdecoder = nn.ModuleList(), nn.ModuleList()
        for idx in range(cfg.depth):
            chout = cfg.layer_channels(idx)
            chin_f = cac if idx == 0 else cfg.layer_channels(idx - 1)
            chin_t = cfg.audio_channels if idx == 0 else cfg.layer_channels(idx - 1)
            self.encoder.append(HEncLayer(chin_f, chout, cfg, freq=True))
            self.tencoder.append(HEncLayer(chin_t, chout, cfg, freq=False))
            dchin = cfg.layer_channels(cfg.depth - 1 - idx)
            last = idx == cfg.depth - 1
            chout_f = (
                len(cfg.sources) * cac
                if last
                else cfg.layer_channels(cfg.depth - 2 - idx)
            )
            chout_t = (
                len(cfg.sources) * cfg.audio_channels
                if last
                else cfg.layer_channels(cfg.depth - 2 - idx)
            )
            self.decoder.append(HDecLayer(dchin, chout_f, cfg, freq=True, last=last))
            self.tdecoder.append(HDecLayer(dchin, chout_t, cfg, freq=False, last=last))
        self.freq_emb = ScaledEmbedding(
            cfg.freq_bins // cfg.stride, cfg.channels, cfg.emb_scale
        )
        bottom_in = cfg.layer_channels(cfg.depth - 1)
        self.channel_upsampler = nn.Conv1d(bottom_in, cfg.bottom_channels, 1)
        self.channel_downsampler = nn.Conv1d(cfg.bottom_channels, bottom_in, 1)
        self.channel_upsampler_t = nn.Conv1d(bottom_in, cfg.bottom_channels, 1)
        self.channel_downsampler_t = nn.Conv1d(cfg.bottom_channels, bottom_in, 1)
        self.crosstransformer = CrossTransformer(cfg)

    def _spec(self, mix):
        cfg = self.cfg
        b, c, length = mix.shape
        hop = cfg.hop
        le = int(math.ceil(length / hop))
        pad = hop // 2 * 3
        x = F.pad(mix.reshape(b * c, length), (pad, pad + le * hop - length), "reflect")
        z = torch.stft(
            x,
            cfg.nfft,
            hop,
            window=torch.hann_window(cfg.nfft),
            win_length=cfg.nfft,
            normalized=True,
            center=True,
            return_complex=True,
            pad_mode="reflect",
        )
        z = z[..., :-1, 2 : 2 + le]
        return z.view(b, c, cfg.freq_bins, le)

    def _ispec(self, z, length):
        cfg = self.cfg
        hop = cfg.hop
        *lead, freqs, le = z.shape
        z = F.pad(z.reshape(-1, freqs, le), (2, 2, 0, 1))
        pad = hop // 2 * 3
        le_total = hop * int(math.ceil(length / hop)) + 2 * pad
        x = torch.istft(
            z,
            cfg.nfft,
            hop,
            window=torch.hann_window(cfg.nfft),
            win_length=cfg.nfft,
            normalized=True,
            length=le_total,
            center=True,
        )
        return x[..., pad : pad + length].reshape(*lead, length)

    def forward(self, mix):
        cfg = self.cfg
        b, _, length = mix.shape
        z = self._spec(mix)
        mag = torch.view_as_real(z).permute(0, 1, 4, 2, 3)
        mag = mag.reshape(b, 2 * cfg.audio_channels, cfg.freq_bins, -1)
        mean = mag.mean(dim=(1, 2, 3), keepdim=True)
        std = mag.std(dim=(1, 2, 3), keepdim=True)
        x = (mag - mean) / (1e-5 + std)
        meant = mix.mean(dim=(1, 2), keepdim=True)
        stdt = mix.std(dim=(1, 2), keepdim=True)
        xt = (mix - meant) / (1e-5 + stdt)

        saved, saved_t, lengths_t = [], [], []
        for idx in range(cfg.depth):
            lengths_t.append(xt.shape[-1])
            xt = self.tencoder[idx](xt)
            saved_t.append(xt)
            x = self.encoder[idx](x)
            if idx == 0:
                frs = torch.arange(x.shape[2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + cfg.freq_emb_scale * emb
            saved.append(x)

        bb, cc, fr, t1 = x.shape
        x = self.channel_upsampler(x.reshape(bb, cc, fr * t1)).reshape(bb, -1, fr, t1)
        xt = self.channel_upsampler_t(xt)
        x, xt = self.crosstransformer(x, xt)
        x = self.channel_downsampler(x.reshape(bb, x.shape[1], fr * t1)).reshape(
            bb, -1, fr, t1
        )
        xt = self.channel_downsampler_t(xt)

        for idx in range(cfg.depth):
            x = self.decoder[idx](x, saved.pop(), 0)
            xt = self.tdecoder[idx](xt, saved_t.pop(), lengths_t.pop())

        n_sources = len(cfg.sources)
        x = x.view(b, n_sources, 2 * cfg.audio_channels, cfg.freq_bins, -1)
        x = x * std[:, None] + mean[:, None]
        x = x.view(b, n_sources, cfg.audio_channels, 2, cfg.freq_bins, x.shape[-1])
        zout = torch.view_as_complex(x.permute(0, 1, 2, 4, 5, 3).contiguous())
        spec_out = self._ispec(zout, length)
        xt = xt.view(b, n_sources, cfg.audio_channels, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return spec_out + xt


# --------------------------------------------------------------------------- #
# Fixtures
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def state():
    return synthetic_state_dict(CFG, seed=3)


@pytest.fixture(scope="module")
def jax_params(state):
    return dm.convert_demucs_state_dict(state, CFG)


@pytest.fixture(scope="module")
def torch_model(state):
    model = TorchHTDemucs(CFG)
    tensors = {key: torch.from_numpy(np.asarray(value)) for key, value in state.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=True), None
    model.eval()
    return model


def test_synthetic_state_dict_loads_into_torch_mirror_strictly(torch_model):
    """The synthetic layout and the torch mirror agree name-for-name."""
    assert torch_model is not None


def test_henc_freq_layer_matches_torch(state, jax_params, torch_model):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, CFG.freq_bins, 6)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.encoder[0](torch.from_numpy(x)).numpy()
    ours = np.asarray(
        dm._henc_layer(jnp.asarray(x), jax_params["encoder"][0], CFG, freq=True)
    )
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_tenc_layer_matches_torch(state, jax_params, torch_model):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, CFG.audio_channels, 240)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.tencoder[0](torch.from_numpy(x)).numpy()
    ours = np.asarray(
        dm._henc_layer(jnp.asarray(x), jax_params["tencoder"][0], CFG, freq=False)
    )
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_hdec_layers_match_torch(state, jax_params, torch_model):
    rng = np.random.default_rng(2)
    chin = CFG.layer_channels(CFG.depth - 1)
    x = rng.standard_normal((2, chin, 2, 6)).astype(np.float32)
    skip = rng.standard_normal(x.shape).astype(np.float32)
    with torch.no_grad():
        ref = torch_model.decoder[0](
            torch.from_numpy(x), torch.from_numpy(skip), 0
        ).numpy()
    ours = np.asarray(
        dm._hdec_layer(
            jnp.asarray(x),
            jnp.asarray(skip),
            jax_params["decoder"][0],
            CFG,
            freq=True,
            last=False,
            length=0,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=ATOL)
    xt = rng.standard_normal((2, chin, 10)).astype(np.float32)
    skip_t = rng.standard_normal(xt.shape).astype(np.float32)
    with torch.no_grad():
        ref_t = torch_model.tdecoder[0](
            torch.from_numpy(xt), torch.from_numpy(skip_t), 37
        ).numpy()
    ours_t = np.asarray(
        dm._hdec_layer(
            jnp.asarray(xt),
            jnp.asarray(skip_t),
            jax_params["tdecoder"][0],
            CFG,
            freq=False,
            last=False,
            length=37,
        )
    )
    np.testing.assert_allclose(ours_t, ref_t, atol=ATOL)


def test_crosstransformer_matches_torch(state, jax_params, torch_model):
    rng = np.random.default_rng(4)
    d = CFG.bottom_channels
    x = rng.standard_normal((2, d, 2, 6)).astype(np.float32)
    xt = rng.standard_normal((2, d, 10)).astype(np.float32)
    with torch.no_grad():
        ref_x, ref_t = torch_model.crosstransformer(
            torch.from_numpy(x), torch.from_numpy(xt)
        )
    ours_x, ours_t = dm._crosstransformer(
        jnp.asarray(x), jnp.asarray(xt), jax_params["crosstransformer"], CFG
    )
    np.testing.assert_allclose(np.asarray(ours_x), ref_x.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(ours_t), ref_t.numpy(), atol=ATOL)


def test_spec_roundtrip_matches_torch_stft(state):
    rng = np.random.default_rng(5)
    mix = (0.2 * rng.standard_normal((1, 2, CFG.segment_samples))).astype(np.float32)
    model = TorchHTDemucs(CFG)
    with torch.no_grad():
        ref = model._spec(torch.from_numpy(mix))
    ours = dm._spec(jnp.asarray(mix), CFG)
    np.testing.assert_allclose(np.asarray(ours.real), ref.real.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.imag), ref.imag.numpy(), atol=1e-5)
    with torch.no_grad():
        back = model._ispec(ref, CFG.segment_samples).numpy()
    ours_back = np.asarray(dm._ispec(ours, CFG, CFG.segment_samples))
    np.testing.assert_allclose(ours_back, back, atol=1e-5)


def test_full_forward_matches_torch(state, jax_params, torch_model):
    """End-to-end single-segment agreement — the converter's numerics bar."""
    rng = np.random.default_rng(6)
    mix = (0.2 * rng.standard_normal((2, CFG.audio_channels, CFG.segment_samples)))
    mix = mix.astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(mix)).numpy()
    ours = np.asarray(dm.demucs_forward(jax_params, jnp.asarray(mix), CFG))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=ATOL)
