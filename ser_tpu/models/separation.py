"""Demucs-class neural vocal separator in flax (transcription denoise lane).

TPU-native counterpart of the model class behind the reference's
``use_demucs`` path (reference
``ser/_internal/transcript/backends/stable_whisper.py:272-478`` runs the
demucs v4 hybrid separator over the input before transcription). The design
follows the public hybrid-demucs frequency branch: a spectrogram U-Net —
strided convolutions down the frequency axis with GLU gating, a small
pre-norm transformer bottleneck over time, and a mirrored transposed-conv
decoder with skip connections — producing a soft vocal mask applied to the
complex mixture STFT. Masking (rather than direct spectrogram synthesis)
keeps phase untouched, which is the right trade for an ASR front-end: no
phase artifacts, bounded worst case (mask→1 degenerates to the mixture).

Everything is static-shape: fixed ``n_fft``/segment length, convs and
attention tiled by XLA onto the MXU, segments batched in one device call
with triangular overlap-add on the host. Weights load from a locally staged
``.npz`` checkpoint (zero-egress: no downloads); without staged weights the
transcription lane keeps the weight-free REPET-SIM separator
(``_internal/utils/source_separation.py``).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.ops.activations import gelu_erf as _gelu

_EPS = 1e-8


@dataclass(frozen=True)
class SeparatorConfig:
    """Architecture + inference hyperparameters."""

    n_fft: int = 1024
    hop: int = 256
    #: Encoder channel ladder; depth = len(channels). Frequency axis is
    #: divided by ``freq_stride`` per layer (512 → 8 at the default depth).
    channels: tuple[int, ...] = (32, 64, 128, 256)
    freq_kernel: int = 8
    freq_stride: int = 4
    time_kernel: int = 3
    bottleneck_layers: int = 2
    bottleneck_heads: int = 8
    sample_rate: int = 16000
    segment_seconds: float = 10.0
    overlap: float = 0.25

    @property
    def freq_bins(self) -> int:
        # The Nyquist bin is dropped so the frequency axis stays a power of
        # two through the stride ladder (the hybrid-demucs convention).
        return self.n_fft // 2

    @property
    def segment_samples(self) -> int:
        return int(self.segment_seconds * self.sample_rate)

    @classmethod
    def tiny(cls) -> "SeparatorConfig":
        """Small config for tests: fast init, sub-second apply on CPU."""
        return cls(
            n_fft=256,
            hop=64,
            channels=(8, 16),
            bottleneck_layers=1,
            bottleneck_heads=2,
            segment_seconds=1.0,
        )


class _GLUConv(nn.Module):
    """Conv2D (time × freq) with GLU gating — the demucs encoder block shape."""

    features: int
    time_kernel: int
    freq_kernel: int
    freq_stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, F, C)
        x = nn.Conv(
            features=2 * self.features,
            kernel_size=(self.time_kernel, self.freq_kernel),
            strides=(1, self.freq_stride),
            padding=((self.time_kernel // 2,) * 2, (self.freq_kernel // 2 - 1, self.freq_kernel // 2)),
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=4, name="norm")(x)
        gate, value = jnp.split(x, 2, axis=-1)
        return value * jax.nn.sigmoid(gate)


class _BottleneckLayer(nn.Module):
    """Pre-norm transformer layer over the time axis (MXU matmuls)."""

    heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, D)
        dim = x.shape[-1]
        attn_in = nn.LayerNorm(name="attn_norm")(x)
        x = x + nn.MultiHeadDotProductAttention(num_heads=self.heads, name="attn")(
            attn_in
        )
        ffn_in = nn.LayerNorm(name="ffn_norm")(x)
        hidden = _gelu(nn.Dense(4 * dim, name="ffn_up")(ffn_in))
        return x + nn.Dense(dim, name="ffn_down")(hidden)


class SpecUNetSeparator(nn.Module):
    """Spectrogram-masking U-Net: mixture magnitude → vocal mask in [0, 1]."""

    config: SeparatorConfig

    @nn.compact
    def __call__(self, magnitude: jax.Array) -> jax.Array:  # (B, T, F)
        cfg = self.config
        # Per-sample scale normalization (demucs normalizes by mixture std so
        # the mask is level-invariant).
        scale = jnp.std(magnitude, axis=(1, 2), keepdims=True) + _EPS
        x = (magnitude / scale)[..., None]  # (B, T, F, 1)

        skips = []
        for index, features in enumerate(cfg.channels):
            x = _GLUConv(
                features=features,
                time_kernel=cfg.time_kernel,
                freq_kernel=cfg.freq_kernel,
                freq_stride=cfg.freq_stride,
                name=f"enc{index}",
            )(x)
            skips.append(x)

        batch, frames, freq, ch = x.shape
        tokens = x.reshape(batch, frames, freq * ch)
        tokens = nn.Dense(cfg.channels[-1], name="bottleneck_in")(tokens)
        for index in range(cfg.bottleneck_layers):
            tokens = _BottleneckLayer(
                heads=cfg.bottleneck_heads, name=f"bottleneck{index}"
            )(tokens)
        x = x + nn.Dense(freq * ch, name="bottleneck_out")(tokens).reshape(
            batch, frames, freq, ch
        )

        for index, features in reversed(list(enumerate(cfg.channels))):
            x = x + skips[index]
            out_features = 1 if index == 0 else cfg.channels[index - 1]
            x = nn.ConvTranspose(
                features=out_features,
                kernel_size=(cfg.time_kernel, cfg.freq_kernel),
                strides=(1, cfg.freq_stride),
                padding="SAME",
                name=f"dec{index}",
            )(x)
            if index > 0:
                x = nn.GroupNorm(num_groups=4, name=f"dec{index}_norm")(x)
                x = _gelu(x)

        return jax.nn.sigmoid(x[..., 0])  # (B, T, F) mask


def _stft(segments: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Complex STFT over batched fixed-length segments: (B, S) → (B, T, F)."""
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], dtype=segments.dtype)
    pad = n_fft // 2
    padded = jnp.pad(segments, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (padded.shape[1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = padded[:, idx] * window[None, None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def _istft(spectrum: jax.Array, n_fft: int, hop: int, length: int) -> jax.Array:
    """Weighted overlap-add inverse of :func:`_stft`: (B, T, F) → (B, S)."""
    window = np.hanning(n_fft + 1)[:-1]
    frames = jnp.fft.irfft(spectrum, n=n_fft, axis=-1) * jnp.asarray(
        window[None, None, :], dtype=jnp.float32
    )
    batch, n_frames, _ = frames.shape
    total = (n_frames - 1) * hop + n_fft
    # Static scatter-add overlap-add: duplicate indices accumulate.
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    ).reshape(-1)
    signal = jnp.zeros((batch, total), dtype=jnp.float32)
    signal = signal.at[:, idx].add(frames.reshape(batch, -1))
    weight = np.zeros(total)
    np.add.at(weight, idx, np.tile(window * window, n_frames))
    signal = signal / jnp.asarray(
        np.maximum(weight, _EPS)[None, :], dtype=jnp.float32
    )
    pad = n_fft // 2
    return signal[:, pad : pad + length]


def init_separator_params(config: SeparatorConfig, *, seed: int = 0) -> dict:
    """Random-init parameter tree (tests / training from scratch)."""
    model = SpecUNetSeparator(config)
    frames = 1 + config.segment_samples // config.hop
    dummy = jnp.zeros((1, frames, config.freq_bins), dtype=jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]


def _flatten(params: dict, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(_flatten(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


_CONFIG_KEY = "__separator_config__"


def save_separator_params(
    params: dict, path, *, config: SeparatorConfig | None = None
) -> None:
    """Persists the parameter tree as a flat ``.npz`` (portable, no pickle).

    The architecture config is bundled so a staged checkpoint is
    self-describing — the loader never guesses hyperparameters.
    """
    import dataclasses
    import json

    flat = _flatten(params)
    if config is not None:
        record = dataclasses.asdict(config)
        record["channels"] = list(record["channels"])
        flat[_CONFIG_KEY] = np.frombuffer(
            json.dumps(record).encode("utf-8"), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_separator_params(path) -> tuple[dict, SeparatorConfig | None]:
    """Loads a flat ``.npz`` checkpoint: (param tree, bundled config or None)."""
    import json

    archive = np.load(path)
    params: dict = {}
    config: SeparatorConfig | None = None
    for flat_key in archive.files:
        if flat_key == _CONFIG_KEY:
            record = json.loads(bytes(archive[flat_key]).decode("utf-8"))
            record["channels"] = tuple(record["channels"])
            config = SeparatorConfig(**record)
            continue
        node = params
        *parents, leaf = [part for part in flat_key.split("/") if part]
        for parent in parents:
            node = node.setdefault(parent, {})
        node[leaf] = jnp.asarray(archive[flat_key])
    return params, config


def separate_segments(
    params: dict, segments: jax.Array, config: SeparatorConfig
) -> jax.Array:
    """Masks one batch of fixed-length segments: (B, S) → vocal (B, S)."""
    spec = _stft(segments, config.n_fft, config.hop)[..., : config.freq_bins]
    mask = SpecUNetSeparator(config).apply({"params": params}, jnp.abs(spec))
    vocal = spec * mask.astype(spec.dtype)
    # Restore the dropped Nyquist bin as zero for the inverse transform.
    vocal = jnp.pad(vocal, ((0, 0), (0, 0), (0, 1)))
    return _istft(vocal, config.n_fft, config.hop, segments.shape[1])


#: One module-level jit so repeat calls reuse the compiled executable.
_compiled_separate = jax.jit(separate_segments, static_argnums=(2,))


def separate_vocals_neural(
    audio: np.ndarray,
    sample_rate: int,
    *,
    params: dict,
    config: SeparatorConfig | None = None,
) -> np.ndarray:
    """Full-file separation: overlapping segments, batched, blended.

    Demucs-style segmented inference: the file is cut into
    ``segment_seconds`` windows with ``overlap`` fractional overlap, every
    window is masked in ONE batched device call, and windows are blended
    with triangular weights so segment boundaries are seamless.
    """
    config = config or SeparatorConfig()
    if sample_rate != config.sample_rate:
        raise ValueError(
            f"Separator expects {config.sample_rate} Hz audio, got {sample_rate}."
        )
    audio = np.asarray(audio, dtype=np.float32)
    length = audio.size
    segment = config.segment_samples
    if length == 0:
        return audio
    stride = max(1, int(segment * (1.0 - config.overlap)))
    starts = list(range(0, max(length - segment, 0) + 1, stride))
    if not starts or starts[-1] + segment < length:
        starts.append(max(0, length - segment))
    padded = np.pad(audio, (0, max(0, starts[-1] + segment - length)))
    batch = np.stack([padded[s : s + segment] for s in starts])
    # Bucket the batch dimension to the next power of two so arbitrary file
    # lengths reuse a handful of compiled executables instead of one per
    # distinct segment count (zero rows are masked out after the call).
    bucket = 1 << (len(starts) - 1).bit_length()
    if bucket > len(starts):
        batch = np.pad(batch, ((0, bucket - len(starts)), (0, 0)))

    vocal_segments = np.asarray(
        _compiled_separate(params, jnp.asarray(batch), config)
    )[: len(starts)]

    ramp = min(segment - 1, max(1, segment - stride))
    weight = np.ones(segment)
    weight[:ramp] = np.linspace(1.0 / ramp, 1.0, ramp)
    weight[-ramp:] = np.linspace(1.0, 1.0 / ramp, ramp)
    output = np.zeros(padded.size)
    norm = np.zeros(padded.size)
    for row, start in enumerate(starts):
        output[start : start + segment] += vocal_segments[row] * weight
        norm[start : start + segment] += weight
    return (output / np.maximum(norm, _EPS))[:length].astype(np.float32)


def separation_loss(
    params: dict,
    mixture_segments: jax.Array,
    vocal_targets: jax.Array,
    config: SeparatorConfig,
) -> jax.Array:
    """L1 spectral + L1 time-domain training objective (demucs's loss family)."""
    estimate = separate_segments(params, mixture_segments, config)
    time_l1 = jnp.mean(jnp.abs(estimate - vocal_targets))
    est_spec = jnp.abs(_stft(estimate, config.n_fft, config.hop))
    ref_spec = jnp.abs(_stft(vocal_targets, config.n_fft, config.hop))
    return time_l1 + jnp.mean(jnp.abs(est_spec - ref_spec))


__all__ = [
    "SeparatorConfig",
    "SpecUNetSeparator",
    "init_separator_params",
    "load_separator_params",
    "save_separator_params",
    "separate_segments",
    "separate_vocals_neural",
    "separation_loss",
]
