"""Whisper encoder-decoder in flax: embeddings backend + transcription decode.

TPU-native replacement for BOTH reference transcription backends
(``stable_whisper`` / ``faster_whisper``, reference §2.8) and the accurate
profile's ``hf_whisper`` encoder-only embedding extractor (reference
``ser/_internal/repr/hf_whisper.py``): one flax model serves encoder-only
feature extraction and full greedy KV-cache decoding.

Components:
- log-mel frontend with Whisper's normalization (clamp → log10 → dynamic-range
  → affine), computed in-graph so the whole encode is one XLA program;
- pre-norm encoder (conv ×2 stride-2 frontend + sinusoidal positions);
- decoder with causal self-attention over a fixed-size KV cache and
  cross-attention onto encoder states, stepped by a jitted decode kernel
  (``whisper_decode.greedy_decode_kv_cache``: per-step cost independent of
  position, all 30 s windows decode as one batch);
- word timestamps from cross-attention DTW alignment over designated
  alignment heads (``word_timing.py``; stable-ts-class semantics), with
  timestamp-token interpolation as the capture-off fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu.models.quant import QuantDense
from ser_tpu.ops import filters as ops_filters
from ser_tpu.ops.activations import gelu_erf as _gelu

N_FFT = 400
HOP_LENGTH = 160
SAMPLE_RATE = 16000
CHUNK_SECONDS = 30
CHUNK_SAMPLES = CHUNK_SECONDS * SAMPLE_RATE
CHUNK_FRAMES = CHUNK_SAMPLES // HOP_LENGTH  # 3000 mel frames per 30 s window


@dataclass(frozen=True)
class WhisperConfig:
    """Whisper architecture hyperparameters (defaults = large-v3)."""

    n_mels: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 32
    n_heads: int = 20
    vocab_size: int = 51866
    max_target_positions: int = 448
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls) -> "WhisperConfig":
        return cls(
            n_mels=80,
            d_model=64,
            encoder_layers=2,
            decoder_layers=2,
            n_heads=4,
            vocab_size=256,
            max_target_positions=64,
        )


# --------------------------------------------------------------------------- #
# Log-mel frontend
# --------------------------------------------------------------------------- #


def log_mel_spectrogram(waveform: jax.Array, n_mels: int) -> jax.Array:
    """Whisper's log-mel features. (B, CHUNK_SAMPLES) → (B, CHUNK_FRAMES, n_mels).

    Matches the published preprocessing: hann window, 400-FFT/160-hop
    magnitude², slaney mel, log10 clamp at 1e-10, dynamic-range floor at
    max-8, then (x+4)/4.

    On TPU this dispatches to the conv-STFT + fused Pallas power→mel→log
    kernel (``ser_tpu/ops/pallas_kernels.py``); on CPU it stays on the rfft
    reference path (identical numerics, verified to ~1e-6).
    """
    if jax.default_backend() != "cpu":
        from ser_tpu.ops.pallas_kernels import fused_log_mel_raw

        log_spec = fused_log_mel_raw(
            waveform,
            sr=SAMPLE_RATE,
            n_fft=N_FFT,
            hop_length=HOP_LENGTH,
            n_mels=n_mels,
            n_frames_out=CHUNK_FRAMES,
        )
        floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
        return (jnp.maximum(log_spec, floor) + 4.0) / 4.0

    window = jnp.asarray(ops_filters.hann_window(N_FFT))
    pad = N_FFT // 2
    padded = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    starts = np.arange(CHUNK_FRAMES) * HOP_LENGTH
    idx = starts[:, None] + np.arange(N_FFT)[None, :]
    frames = padded[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    power = jnp.abs(spec) ** 2  # (B, frames, n_fft//2+1)
    mel_fb = jnp.asarray(ops_filters.mel_filterbank(SAMPLE_RATE, N_FFT, n_mels))
    mel = jnp.einsum("mf,btf->btm", mel_fb, power)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal position table (sin | cos concatenation)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# --------------------------------------------------------------------------- #
# Attention blocks
# --------------------------------------------------------------------------- #


class MultiHeadAttention(nn.Module):
    config: WhisperConfig
    compute_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # encoder self-attention routes to the Pallas kernel
    #: W8A8 int8 projections (QuantDense) — opt-in inference lane; the int8
    #: MXU path runs the projection stream 1.42x faster than bf16
    #: (INT8_MATMUL_r03.json). Attention core / softmax unchanged.
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x, kv, *, bias=None):
        cfg = self.config
        heads = cfg.n_heads
        head_dim = cfg.d_model // heads
        # dtype=compute_dtype keeps the matmuls in bf16 on TPU (f32 params are
        # cast per-op); softmax stays f32 for stability.
        dense_cls = QuantDense if self.quant_int8 else nn.Dense
        dense = partial(dense_cls, dtype=self.compute_dtype)
        q = dense(cfg.d_model, name="q")(x)
        k = dense(cfg.d_model, use_bias=False, name="k")(kv)
        v = dense(cfg.d_model, name="v")(kv)

        def split(t):
            return t.reshape(*t.shape[:-1], heads, head_dim)

        if self.use_flash and bias is None:
            from ser_tpu.models.attention import multi_head_attention

            out = multi_head_attention(
                split(q), split(k), split(v), compute_dtype=self.compute_dtype
            )
        else:
            scores = jnp.einsum(
                "...qhd,...khd->...hqk", split(q), split(k)
            ) / jnp.sqrt(jnp.asarray(head_dim, dtype=self.compute_dtype))
            if bias is not None:
                scores = scores + bias.astype(scores.dtype)
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
                self.compute_dtype
            )
            out = jnp.einsum("...hqk,...khd->...qhd", weights, split(v))
        out = out.reshape(*x.shape[:-1], cfg.d_model)
        return dense(cfg.d_model, name="out")(out)


class EncoderBlock(nn.Module):
    config: WhisperConfig
    compute_dtype: jnp.dtype = jnp.float32
    ln_dtype: jnp.dtype = jnp.float32  # bf16 halves residual/LN HBM traffic
    quant_int8: bool = False  # W8A8 projections (see MultiHeadAttention)

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        norm = partial(nn.LayerNorm, epsilon=cfg.layer_norm_eps, dtype=self.ln_dtype)
        dense_cls = QuantDense if self.quant_int8 else nn.Dense
        h = norm(name="attn_ln")(x)
        x = x + MultiHeadAttention(
            cfg,
            compute_dtype=self.compute_dtype,
            use_flash=True,
            quant_int8=self.quant_int8,
            name="attn",
        )(h, h)
        h = norm(name="mlp_ln")(x)
        h = dense_cls(4 * cfg.d_model, dtype=self.compute_dtype, name="mlp_in")(h)
        h = _gelu(h)
        return x + dense_cls(cfg.d_model, dtype=self.compute_dtype, name="mlp_out")(h)


class WhisperEncoder(nn.Module):
    """Mel frames → contextual states. (B, CHUNK_FRAMES, n_mels) → (B, T/2, d)."""

    config: WhisperConfig
    compute_dtype: jnp.dtype = jnp.float32
    ln_dtype: jnp.dtype = jnp.float32
    #: Rematerialize each block on the backward pass (training only): storing
    #: every layer's intermediates at large-v3 dims OOMs a 16 GB chip next to
    #: Adam state; remat keeps only the 2*B*T*d residual stream and re-runs
    #: the forward per block. Inference paths never take a gradient, so the
    #: flag costs them nothing.
    remat: bool = False
    #: Remat policy: "full" recomputes everything (minimum memory);
    #: "dots" saves dot_general outputs with no batch dims (every nn.Dense —
    #: QKV/out/MLP projections) and recomputes only the cheap elementwise and
    #: attention ops, trading ~2 GB of bf16 activations per (batch=4,
    #: large-v3) step for skipping the matmul half of the recompute pass.
    remat_policy: str = "full"
    #: W8A8 int8 projection matmuls (inference-only opt-in). The projection
    #: stream is 84 of the 187 ms bf16 encode budget at batch 8
    #: (ENCODER_BUDGET_r03.json) and the int8 MXU path runs it 1.42x faster
    #: (INT8_MATMUL_r03.json); attention, LN, softmax, and the residual
    #: stream are untouched. Training lanes never set this.
    quant_int8: bool = False

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        cfg = self.config
        if self.remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if self.remat_policy == "dots"
                else None
            )
            block_cls = nn.remat(EncoderBlock, policy=policy)
        else:
            block_cls = EncoderBlock
        x = nn.Conv(cfg.d_model, kernel_size=(3,), padding=1, dtype=self.compute_dtype, name="conv1")(mel)
        x = _gelu(x)
        x = nn.Conv(cfg.d_model, kernel_size=(3,), strides=(2,), padding=1, dtype=self.compute_dtype, name="conv2")(x)
        x = _gelu(x)
        x = x.astype(self.compute_dtype)
        positions = jnp.asarray(_sinusoids(x.shape[1], cfg.d_model))
        x = x + positions[None].astype(x.dtype)
        for i in range(cfg.encoder_layers):
            x = block_cls(
                cfg,
                compute_dtype=self.compute_dtype,
                ln_dtype=self.ln_dtype,
                quant_int8=self.quant_int8,
                name=f"layer_{i}",
            )(x)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_ln")(x).astype(
            jnp.float32
        )


class DecoderBlock(nn.Module):
    config: WhisperConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_states, *, self_bias):
        cfg = self.config
        attn = partial(MultiHeadAttention, cfg, compute_dtype=self.compute_dtype)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_ln")(x)
        x = x + attn(name="attn")(h, h, bias=self_bias)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="cross_ln")(x)
        x = x + attn(name="cross")(h, encoder_states)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="mlp_ln")(x)
        h = nn.Dense(4 * cfg.d_model, dtype=self.compute_dtype, name="mlp_in")(h)
        h = _gelu(h)
        return x + nn.Dense(cfg.d_model, dtype=self.compute_dtype, name="mlp_out")(h)


class WhisperDecoder(nn.Module):
    """Teacher-forced decoder over full token prefixes.

    Used for parameter init/shape contracts and as the reference numerics
    for the production decode path: greedy generation runs through
    ``whisper_decode.greedy_decode_kv_cache``, which reads this module's
    param tree directly and matches its op-for-op numerics (pinned by the
    cached-vs-full equivalence test). ``greedy_decode_on_device`` below keeps
    the full-prefix re-forward alive as that test's baseline.
    """

    config: WhisperConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, encoder_states: jax.Array) -> jax.Array:
        cfg = self.config
        positions = self.param(
            "pos_embed",
            lambda key: jnp.asarray(
                np.zeros((cfg.max_target_positions, cfg.d_model), dtype=np.float32)
            ),
        )
        tok_embed = self.param(
            "tok_embed",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.d_model),
        )
        seq_len = tokens.shape[-1]
        x = tok_embed[tokens] + positions[None, :seq_len]
        causal = jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool))
        self_bias = jnp.where(causal, 0.0, -1e30)[None, None]
        for i in range(cfg.decoder_layers):
            x = DecoderBlock(cfg, compute_dtype=self.compute_dtype, name=f"layer_{i}")(
                x, encoder_states, self_bias=self_bias
            )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_ln")(x)
        return jnp.einsum("btd,vd->btv", x, tok_embed)


# --------------------------------------------------------------------------- #
# Parameter init + HF conversion
# --------------------------------------------------------------------------- #


def init_whisper_encoder_params(config: WhisperConfig, *, seed: int = 0) -> dict:
    dummy = jnp.zeros((1, CHUNK_FRAMES, config.n_mels), dtype=jnp.float32)
    return WhisperEncoder(config).init(jax.random.PRNGKey(seed), dummy)["params"]


def whisper_config_from_hf_dir(model_dir) -> WhisperConfig:
    import json
    from pathlib import Path

    raw = json.loads((Path(model_dir) / "config.json").read_text(encoding="utf-8"))
    return WhisperConfig(
        n_mels=raw.get("num_mel_bins", 80),
        d_model=raw["d_model"],
        encoder_layers=raw["encoder_layers"],
        decoder_layers=raw["decoder_layers"],
        n_heads=raw["encoder_attention_heads"],
        vocab_size=raw["vocab_size"],
        max_target_positions=raw.get("max_target_positions", 448),
    )


def _read_generation_config(model_dir) -> dict:
    """Best-effort parse of a checkpoint's ``generation_config.json``.

    The file is untrusted metadata: missing or unparseable returns {} and
    callers fall back to their defaults.
    """
    import json
    from pathlib import Path

    path = Path(model_dir) / "generation_config.json"
    if not path.is_file():
        return {}
    try:
        raw = json.loads(path.read_text(encoding="utf-8"))
    except (OSError, ValueError):
        return {}
    return raw if isinstance(raw, dict) else {}


def alignment_heads_from_hf_dir(model_dir) -> tuple[tuple[int, int], ...] | None:
    """Published (layer, head) cross-attention alignment pairs, if any.

    HF Whisper checkpoints carry OpenAI's per-model alignment-head dump in
    ``generation_config.json``; absent (or unreadable) returns None and the
    caller falls back to :func:`whisper_decode.default_alignment_spec`.
    """
    pairs = _read_generation_config(model_dir).get("alignment_heads")
    if not pairs:
        return None
    return tuple((int(layer), int(head)) for layer, head in pairs)


def suppress_tokens_from_hf_dir(model_dir) -> tuple[int, ...]:
    """Published non-speech/special suppression list, if any.

    ``generation_config.json``'s ``suppress_tokens`` (symbols, sounds) are
    masked every step. ``begin_suppress_tokens`` is deliberately NOT merged:
    it contains EOT (masking it every step would make decode unstoppable),
    and timestamp rule 4 already constrains the first generated position.
    """
    tokens = _read_generation_config(model_dir).get("suppress_tokens") or []
    return tuple(sorted({int(token) for token in tokens}))


def _hf_tensors(model_dir) -> dict[str, np.ndarray]:
    from ser_tpu.models.wav2vec2 import _torch_state_dict

    return _torch_state_dict(model_dir)


def _attention_params(t, base_hf: str) -> dict:
    return {
        "q": {"kernel": t(f"{base_hf}.q_proj.weight").T, "bias": t(f"{base_hf}.q_proj.bias")},
        "k": {"kernel": t(f"{base_hf}.k_proj.weight").T},
        "v": {"kernel": t(f"{base_hf}.v_proj.weight").T, "bias": t(f"{base_hf}.v_proj.bias")},
        "out": {"kernel": t(f"{base_hf}.out_proj.weight").T, "bias": t(f"{base_hf}.out_proj.bias")},
    }


def load_hf_whisper_encoder_params(model_dir, config: WhisperConfig) -> dict:
    """Converts a local HF Whisper checkpoint's encoder weights.

    Load-info discipline mirrors the reference's checkpoint validation
    (``hf_whisper.py:444-485``): missing weights raise by name, and encoder
    tensors the conversion never consumed refuse the load instead of being
    silently dropped (:mod:`ser_tpu.models.checkpoint_audit`). The fixed
    sinusoidal position table is recomputed, not loaded.
    """
    from ser_tpu.models.checkpoint_audit import AuditedState, unconsumed_key_error

    sd = AuditedState(_hf_tensors(model_dir))

    def t(name):
        for key in (name, f"model.{name}"):
            if key in sd:
                return sd.take(key)
        raise KeyError(f"Missing weight {name!r}.")

    params: dict = {
        "conv1": {
            "kernel": t("encoder.conv1.weight").transpose(2, 1, 0),
            "bias": t("encoder.conv1.bias"),
        },
        "conv2": {
            "kernel": t("encoder.conv2.weight").transpose(2, 1, 0),
            "bias": t("encoder.conv2.bias"),
        },
        "final_ln": {
            "scale": t("encoder.layer_norm.weight"),
            "bias": t("encoder.layer_norm.bias"),
        },
    }
    for i in range(config.encoder_layers):
        base = f"encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "attn_ln": {
                "scale": t(f"{base}.self_attn_layer_norm.weight"),
                "bias": t(f"{base}.self_attn_layer_norm.bias"),
            },
            "attn": _attention_params(t, f"{base}.self_attn"),
            "mlp_ln": {
                "scale": t(f"{base}.final_layer_norm.weight"),
                "bias": t(f"{base}.final_layer_norm.bias"),
            },
            "mlp_in": {"kernel": t(f"{base}.fc1.weight").T, "bias": t(f"{base}.fc1.bias")},
            "mlp_out": {"kernel": t(f"{base}.fc2.weight").T, "bias": t(f"{base}.fc2.bias")},
        }

    leftovers = sd.unconsumed(
        scope_prefixes=("encoder.", "model.encoder."),
        ignore_exact=(
            "encoder.embed_positions.weight",
            "model.encoder.embed_positions.weight",
        ),
    )
    if leftovers:
        raise unconsumed_key_error(leftovers, model="whisper encoder")
    return params


def load_hf_whisper_decoder_params(model_dir, config: WhisperConfig) -> dict:
    """Converts a local HF Whisper checkpoint's decoder weights.

    Same consumed-key audit as the encoder loader, scoped to the decoder
    subtree (``proj_out`` is HF's tied output head — recognized, never
    loaded separately).
    """
    from ser_tpu.models.checkpoint_audit import AuditedState, unconsumed_key_error

    sd = AuditedState(_hf_tensors(model_dir))

    def t(name):
        for key in (name, f"model.{name}"):
            if key in sd:
                return sd.take(key)
        raise KeyError(f"Missing weight {name!r}.")

    params: dict = {
        "tok_embed": t("decoder.embed_tokens.weight"),
        "pos_embed": t("decoder.embed_positions.weight"),
        "final_ln": {
            "scale": t("decoder.layer_norm.weight"),
            "bias": t("decoder.layer_norm.bias"),
        },
    }
    for i in range(config.decoder_layers):
        base = f"decoder.layers.{i}"
        params[f"layer_{i}"] = {
            "attn_ln": {
                "scale": t(f"{base}.self_attn_layer_norm.weight"),
                "bias": t(f"{base}.self_attn_layer_norm.bias"),
            },
            "attn": _attention_params(t, f"{base}.self_attn"),
            "cross_ln": {
                "scale": t(f"{base}.encoder_attn_layer_norm.weight"),
                "bias": t(f"{base}.encoder_attn_layer_norm.bias"),
            },
            "cross": _attention_params(t, f"{base}.encoder_attn"),
            "mlp_ln": {
                "scale": t(f"{base}.final_layer_norm.weight"),
                "bias": t(f"{base}.final_layer_norm.bias"),
            },
            "mlp_in": {"kernel": t(f"{base}.fc1.weight").T, "bias": t(f"{base}.fc1.bias")},
            "mlp_out": {"kernel": t(f"{base}.fc2.weight").T, "bias": t(f"{base}.fc2.bias")},
        }

    leftovers = sd.unconsumed(scope_prefixes=("decoder.", "model.decoder."))
    if leftovers:
        raise unconsumed_key_error(leftovers, model="whisper decoder")
    return params


# --------------------------------------------------------------------------- #
# Transcription driver
# --------------------------------------------------------------------------- #


@partial(jax.jit, static_argnames=("encoder",))
def encode_mel_chunks(encoder: WhisperEncoder, params, chunks: jax.Array) -> jax.Array:
    """(B, CHUNK_SAMPLES) waveform chunks → (B, 1500, d) encoder states."""
    mel = log_mel_spectrogram(chunks, encoder.config.n_mels)
    return encoder.apply({"params": params}, mel)


@partial(jax.jit, static_argnames=("decoder",))
def decoder_logits(
    decoder: WhisperDecoder, params, tokens: jax.Array, encoder_states: jax.Array
) -> jax.Array:
    return decoder.apply({"params": params}, tokens, encoder_states)


@partial(jax.jit, static_argnames=("decoder", "prefix_len"))
def greedy_decode_on_device(
    decoder: WhisperDecoder,
    params,
    encoder_states: jax.Array,
    prefix: jax.Array,
    eot: int,
    prefix_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Device-side greedy decode: ONE dispatch per 30 s window.

    Runs a ``lax.while_loop`` over decode positions (full-prefix forward per
    step under the causal mask — fixed shapes, one cached executable) and
    stops at end-of-text. Returns ``(tokens (1, max_len), emitted_count)``
    where ``tokens[0, prefix_len : prefix_len + emitted_count]`` are the
    emitted ids. Replaces a per-token host round-trip loop (~dispatch-latency
    × max_target_positions) with a single device program.
    """
    max_len = decoder.config.max_target_positions
    tokens = jnp.full((1, max_len), eot, dtype=jnp.int32)
    tokens = tokens.at[0, :prefix_len].set(prefix[:prefix_len])

    def cond(state):
        position, _, done = state
        return jnp.logical_and(position < max_len, jnp.logical_not(done))

    def body(state):
        position, tokens, _ = state
        logits = decoder.apply({"params": params}, tokens, encoder_states)
        next_token = jnp.argmax(logits[0, position - 1]).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_index_in_dim(
            tokens, next_token[None], position, axis=1
        )
        return position + 1, tokens, next_token == eot

    final_position, tokens, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(prefix_len, dtype=jnp.int32), tokens, jnp.asarray(False))
    )
    emitted = final_position - prefix_len
    # The loop writes EOT as its last token when it stops on EOT; exclude it.
    last_index = jnp.clip(final_position - 1, 0, max_len - 1)
    wrote_eot = tokens[0, last_index] == eot
    emitted = jnp.where(wrote_eot, jnp.maximum(emitted - 1, 0), emitted)
    return tokens, emitted


class WhisperForTranscription:
    """Greedy KV-cache transcription with DTW-aligned word timestamps."""

    PREFIX_LEN = 3  # <|startoftranscript|> <|lang|> <|transcribe|>

    def __init__(
        self,
        config: WhisperConfig,
        encoder_params: dict,
        decoder_params: dict,
        tokenizer,
        *,
        compute_dtype: str = "float32",
        alignment_heads: tuple[tuple[int, int], ...] | None = None,
        word_timestamps: str = "align",
        suppress_tokens: tuple[int, ...] = (),
        apply_timestamp_rules: bool = True,
        decode_strategy: str = "greedy",
        beam_size: int = 5,
        length_penalty: float = 1.0,
        decode_int8: bool | None = None,
    ) -> None:
        from ser_tpu.models.whisper_decode import default_alignment_spec

        if decode_strategy not in ("greedy", "beam"):
            raise ValueError(f"Unknown decode strategy {decode_strategy!r}")
        # Opt-in int8 decode weight stream (SER_DECODE_INT8=1): the decode
        # step is weight-bandwidth-bound, and pre-quantized int8 weights
        # halve its ~1.5 GB/token HBM stream (whisper_decode.
        # quantize_decode_weights). Never a default — W8A8 perturbs logits
        # (~token-level changes possible); measured lane, ADR 0005 policy.
        if decode_int8 is None:
            import os

            decode_int8 = os.environ.get("SER_DECODE_INT8", "") == "1"
        self.decode_int8 = bool(decode_int8)

        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        self.config = config
        self.encoder = WhisperEncoder(config, compute_dtype=dtype)
        self.decoder = WhisperDecoder(config, compute_dtype=dtype)
        self.compute_dtype = dtype
        if dtype == jnp.bfloat16:
            # Inference-only: bf16 storage halves the HBM footprint (see
            # param_utils.cast_params_bf16 for the hoisted-cast rationale).
            from ser_tpu.models.param_utils import cast_params_bf16

            encoder_params = cast_params_bf16(encoder_params)
            decoder_params = cast_params_bf16(decoder_params)
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        self.tokenizer = tokenizer
        self.word_timestamps = word_timestamps
        if alignment_heads is None:
            alignment_heads = default_alignment_spec(
                config.decoder_layers, config.n_heads
            )
        # Checkpoint metadata is untrusted: a generation_config.json from a
        # different model size can name heads this decoder does not have.
        # Out-of-range pairs drop here (decode would reject them at trace
        # time); if none survive, fall back to the default spec.
        valid = tuple(
            (int(layer), int(head))
            for layer, head in alignment_heads
            if 0 <= int(layer) < config.decoder_layers and 0 <= int(head) < config.n_heads
        )
        if len(valid) < len(tuple(alignment_heads)):
            import warnings

            warnings.warn(
                "Dropping out-of-range alignment head(s) from checkpoint "
                f"metadata ({len(tuple(alignment_heads)) - len(valid)} of "
                f"{len(tuple(alignment_heads))}).",
                stacklevel=2,
            )
        if not valid:
            valid = default_alignment_spec(config.decoder_layers, config.n_heads)
        self.alignment_heads = valid
        self.suppress_tokens = tuple(int(t) for t in suppress_tokens)
        self.apply_timestamp_rules = apply_timestamp_rules
        self.decode_strategy = decode_strategy
        self.beam_size = int(beam_size)
        self.length_penalty = float(length_penalty)
        self._qkv_fused_cache = None

    def _fused_qkv(self):
        """Per-layer fused self-attention Q|K|V kernels, computed ONCE.

        Fusing inside the jitted decode re-concatenated every attention
        projection per dispatch (~300 MB of HBM copies at large-v3, repeated
        on every window batch and temperature retry); the params are fixed
        for the model's lifetime, so the fusion is too.
        """
        if self._qkv_fused_cache is None:
            from ser_tpu.models.whisper_decode import _fuse_qkv_params

            self._qkv_fused_cache = _fuse_qkv_params(
                self.decoder_params,
                self.config.decoder_layers,
                self.config.d_model,
            )
        return self._qkv_fused_cache

    @classmethod
    def from_pretrained_dir(
        cls,
        model_dir,
        *,
        compute_dtype: str = "float32",
        decode_strategy: str = "greedy",
        beam_size: int = 5,
        length_penalty: float = 1.0,
    ):
        """Loads config + weights + tokenizer from a local HF checkpoint dir."""
        from transformers import WhisperTokenizer

        config = whisper_config_from_hf_dir(model_dir)
        return cls(
            config,
            load_hf_whisper_encoder_params(model_dir, config),
            load_hf_whisper_decoder_params(model_dir, config),
            WhisperTokenizer.from_pretrained(str(model_dir)),
            compute_dtype=compute_dtype,
            alignment_heads=alignment_heads_from_hf_dir(model_dir),
            suppress_tokens=suppress_tokens_from_hf_dir(model_dir),
            decode_strategy=decode_strategy,
            beam_size=beam_size,
            length_penalty=length_penalty,
        )

    def _special(self, token: str) -> int:
        ids = self.tokenizer.convert_tokens_to_ids([token])
        # Mapping to unk means "missing" — EXCEPT when the requested token IS
        # the unk token: real Whisper tokenizers alias unk to <|endoftext|>
        # (HF tokenizer_config.json), so EOT legitimately resolves to unk_id.
        unk_matches = ids[0] == self.tokenizer.unk_token_id and token != str(
            getattr(self.tokenizer, "unk_token", "")
        )
        if ids[0] is None or unk_matches:
            raise ValueError(f"Tokenizer lacks special token {token}")
        return int(ids[0])

    def _decode_chunk_batch(
        self,
        encoder_states: jax.Array,
        language: str,
        num_frames: np.ndarray,
        *,
        temperature: float = 0.0,
        rng_seed: int = 0,
    ) -> tuple[list[list[int]], np.ndarray | None]:
        """KV-cache decode (greedy or beam) of a batch of 30 s windows.

        Returns per-window emitted token ids and, when alignment capture is
        on, the per-window DTW matrix ``(B, max_len, S)`` — alignment heads
        reduce ON DEVICE (head-average after standardize+medfilt) so only
        the small matrix crosses the host link, not the per-head buffer.
        ``num_frames`` gives each window's audio-covered encoder frames.

        Beam mode (``decode_strategy="beam"``) matches the reference quality
        lane (faster-whisper decodes at beam_size=5); its alignment comes
        from a teacher-forced second pass over the winning tokens since the
        beam loop carries no capture buffers. Temperature retries always
        sample through the greedy kernel (the ctranslate2 stack likewise
        switches from beam to sampling above temperature 0).
        """
        from ser_tpu.models.whisper_decode import (
            alignment_forward,
            beam_decode_kv_cache,
            greedy_decode_kv_cache,
            reduce_alignment_matrix,
        )

        sot = self._special("<|startoftranscript|>")
        eot = self._special("<|endoftext|>")
        lang_token = self._special(f"<|{language}|>")
        task = self._special("<|transcribe|>")
        prefix = jnp.asarray([sot, lang_token, task], dtype=jnp.int32)
        align_spec = (
            self.alignment_heads if self.word_timestamps == "align" else ()
        )
        timestamp_begin = (
            self._special("<|0.00|>") if self.apply_timestamp_rules else None
        )
        qkv_fused = self._fused_qkv()
        use_beam = self.decode_strategy == "beam" and temperature == 0.0
        if use_beam:
            tokens, lengths = beam_decode_kv_cache(
                self.decoder_params,
                self.config,
                encoder_states,
                prefix,
                jnp.asarray(eot, dtype=jnp.int32),
                prefix_len=self.PREFIX_LEN,
                beam_size=self.beam_size,
                length_penalty=self.length_penalty,
                compute_dtype=self.compute_dtype,
                suppress_tokens=self.suppress_tokens,
                timestamp_begin=timestamp_begin,
                quant_int8=self.decode_int8,
                qkv_fused=qkv_fused,
            )
            align = None
            if align_spec:
                align = alignment_forward(
                    self.decoder_params,
                    self.config,
                    encoder_states,
                    tokens,
                    align_spec=align_spec,
                    compute_dtype=self.compute_dtype,
                )
        else:
            tokens, lengths, align = greedy_decode_kv_cache(
                self.decoder_params,
                self.config,
                encoder_states,
                prefix,
                jnp.asarray(eot, dtype=jnp.int32),
                prefix_len=self.PREFIX_LEN,
                align_spec=align_spec,
                compute_dtype=self.compute_dtype,
                temperature=temperature,
                rng_seed=rng_seed,
                suppress_tokens=self.suppress_tokens,
                timestamp_begin=timestamp_begin,
                quant_int8=self.decode_int8,
                qkv_fused=qkv_fused,
            )
        matrix = None
        if align_spec:
            matrix = np.asarray(
                reduce_alignment_matrix(
                    align,
                    self.PREFIX_LEN + lengths,
                    jnp.asarray(num_frames, dtype=jnp.int32),
                    prefix_len=self.PREFIX_LEN,
                )
            )
        tokens_np = np.asarray(tokens)
        lengths_np = np.asarray(lengths)
        emitted = [
            tokens_np[row, self.PREFIX_LEN : self.PREFIX_LEN + int(lengths_np[row])].tolist()
            for row in range(tokens_np.shape[0])
        ]
        return emitted, matrix

    def _segments_from_tokens(
        self, tokens: list[int], timestamp_begin: int, chunk_duration: float
    ) -> list[tuple[float, float, list[int]]]:
        """Groups emitted ids into (start, end, text-token) segments."""
        segments: list[tuple[float, float, list[int]]] = []
        current_start, current_tokens = 0.0, []
        for token in tokens:
            if token >= timestamp_begin:
                stamp = (token - timestamp_begin) * 0.02
                if current_tokens:
                    segments.append((current_start, stamp, current_tokens))
                    current_tokens = []
                current_start = stamp
            else:
                current_tokens.append(token)
        if current_tokens:
            segments.append((current_start, chunk_duration, current_tokens))
        return segments

    def _interpolated_words(
        self, segments, chunk_offset_s: float, chunk_duration: float
    ):
        """Even within-segment interpolation (fallback when alignment is off)."""
        from ser_tpu.domain import TranscriptWord

        words: list[TranscriptWord] = []
        for seg_start, seg_end, seg_tokens in segments:
            text = self.tokenizer.decode(seg_tokens).strip()
            if not text:
                continue
            parts = text.split()
            seg_start = min(seg_start, chunk_duration)
            seg_end = min(max(seg_end, seg_start + 0.02), chunk_duration)
            step = (seg_end - seg_start) / len(parts)
            for i, word in enumerate(parts):
                words.append(
                    TranscriptWord(
                        word=word,
                        start_seconds=chunk_offset_s + seg_start + i * step,
                        end_seconds=chunk_offset_s + seg_start + (i + 1) * step,
                    )
                )
        return words

    def _aligned_words(
        self,
        tokens: list[int],
        matrix: np.ndarray,
        timestamp_begin: int,
        chunk_offset_s: float,
        chunk_duration: float,
        num_frames: int,
    ):
        """DTW word timing from the device-reduced matrix (one chunk).

        ``num_frames`` is the chunk's audio-covered encoder frame count —
        the same value the device-side reduction already masked with.
        """
        from ser_tpu.domain import TranscriptWord
        from ser_tpu.models.word_timing import word_timings_from_matrix

        rows = matrix[
            self.PREFIX_LEN : self.PREFIX_LEN + len(tokens), :num_frames
        ]
        timed = word_timings_from_matrix(
            rows,
            tokens,
            self.tokenizer,
            timestamp_begin=timestamp_begin,
        )
        return [
            TranscriptWord(
                word=entry.word,
                start_seconds=chunk_offset_s + min(entry.start, chunk_duration),
                end_seconds=chunk_offset_s + min(entry.end, chunk_duration),
            )
            for entry in timed
        ]

    #: Escalation schedule for degenerate (repetitive) chunk transcripts
    #: (reference stable-ts temperature fallback semantics).
    RETRY_TEMPERATURES = (0.2, 0.5, 0.8)

    def _chunk_text(self, tokens: list[int], timestamp_begin: int) -> str:
        return self.tokenizer.decode(
            [token for token in tokens if token < timestamp_begin]
        ).strip()

    def _retry_degenerate_chunks(
        self,
        states: jax.Array,
        language: str,
        num_frames: np.ndarray,
        emitted: list[list[int]],
        matrices: np.ndarray | None,
    ) -> tuple[list[list[int]], np.ndarray | None]:
        """Re-decodes repetitive chunks with escalating sampling temperature.

        A greedy decode stuck in a repetition loop compresses extremely well;
        such chunks re-run with temperature sampling until the output stops
        looking degenerate or the schedule is exhausted (keeping the least
        degenerate candidate).
        """
        timestamp_begin = self._special("<|0.00|>")

        def ratio(tokens: list[int]) -> float:
            return transcript_compression_ratio(
                self._chunk_text(tokens, timestamp_begin)
            )

        bad = [
            index
            for index, tokens in enumerate(emitted)
            if transcript_is_degenerate(self._chunk_text(tokens, timestamp_begin))
        ]
        if not bad:
            return emitted, matrices
        if matrices is not None:
            matrices = np.array(matrices)  # jax-backed views are read-only
        best_ratio = {index: ratio(emitted[index]) for index in bad}
        for retry, temperature in enumerate(self.RETRY_TEMPERATURES):
            # Gather the bad rows ON DEVICE — pulling the whole states
            # buffer through the host link costs more than the retry itself
            # on a remote-attached chip.
            retry_states = jnp.take(states, jnp.asarray(bad), axis=0)
            retry_emitted, retry_matrices = self._decode_chunk_batch(
                retry_states,
                language,
                num_frames[bad],
                temperature=temperature,
                rng_seed=retry + 1,
            )
            still_bad = []
            for slot, chunk_index in enumerate(bad):
                candidate_ratio = ratio(retry_emitted[slot])
                # Keep the LEAST degenerate candidate seen so far; a hotter
                # sample may be worse than what we already have.
                if candidate_ratio < best_ratio[chunk_index]:
                    best_ratio[chunk_index] = candidate_ratio
                    emitted[chunk_index] = retry_emitted[slot]
                    if matrices is not None and retry_matrices is not None:
                        matrices[chunk_index] = retry_matrices[slot]
                if transcript_is_degenerate(
                    self._chunk_text(emitted[chunk_index], timestamp_begin)
                ):
                    still_bad.append(chunk_index)
            bad = still_bad
            if not bad:
                break
        return emitted, matrices

    def transcribe_words(
        self, audio16k: np.ndarray, *, language: str = "en", use_vad: bool = True
    ):
        """Transcribes mono 16 kHz audio into word-level ``TranscriptWord``s.

        All 30 s windows encode and decode as ONE batched device program
        (chunk-as-batch, SURVEY §5 long-context rule). Word timings come from
        cross-attention DTW alignment (reference ``stable_whisper.py:272-478``
        semantics); timestamp-token interpolation remains as the fallback when
        alignment capture is disabled or yields nothing.
        """
        from ser_tpu.domain import TranscriptWord

        vad_offset_s = 0.0
        if use_vad:
            audio16k, trimmed_samples = _trim_silence(audio16k)
            vad_offset_s = trimmed_samples / SAMPLE_RATE
        if audio16k.size == 0:
            return []

        timestamp_begin = self._special("<|0.00|>")
        n_chunks = int(np.ceil(audio16k.size / CHUNK_SAMPLES))
        batch = np.zeros((n_chunks, CHUNK_SAMPLES), dtype=np.float32)
        durations = []
        for chunk_index in range(n_chunks):
            chunk = audio16k[
                chunk_index * CHUNK_SAMPLES : (chunk_index + 1) * CHUNK_SAMPLES
            ]
            batch[chunk_index, : chunk.size] = chunk
            durations.append(chunk.size / SAMPLE_RATE)

        states = encode_mel_chunks(self.encoder, self.encoder_params, jnp.asarray(batch))
        num_frames = np.asarray(
            [
                max(1, int(duration * SAMPLE_RATE) // (HOP_LENGTH * 2))
                for duration in durations
            ],
            dtype=np.int32,
        )
        emitted, matrices = self._decode_chunk_batch(states, language, num_frames)
        emitted, matrices = self._retry_degenerate_chunks(
            states, language, num_frames, emitted, matrices
        )

        words: list[TranscriptWord] = []
        for chunk_index, tokens in enumerate(emitted):
            chunk_offset_s = chunk_index * CHUNK_SECONDS
            chunk_duration = durations[chunk_index]
            aligned: list[TranscriptWord] = []
            if matrices is not None and tokens:
                aligned = self._aligned_words(
                    tokens,
                    matrices[chunk_index],
                    timestamp_begin,
                    chunk_offset_s,
                    chunk_duration,
                    int(num_frames[chunk_index]),
                )
            if aligned:
                words.extend(aligned)
            else:
                segments = self._segments_from_tokens(
                    tokens, timestamp_begin, chunk_duration
                )
                words.extend(
                    self._interpolated_words(segments, chunk_offset_s, chunk_duration)
                )
        if vad_offset_s:
            # Decoded times live on the VAD-trimmed timeline; shift back to
            # original-audio coordinates so the emotion-timeline join holds.
            words = [
                word._replace(
                    start_seconds=word.start_seconds + vad_offset_s,
                    end_seconds=word.end_seconds + vad_offset_s,
                )
                for word in words
            ]
        return words


def transcript_compression_ratio(text: str) -> float:
    """gzip compression ratio of the text — the published repetition signal."""
    stripped = text.strip()
    if not stripped:
        return 0.0
    import zlib

    raw = stripped.encode("utf-8")
    return len(raw) / max(1, len(zlib.compress(raw)))


def transcript_is_degenerate(
    text: str, *, max_compression_ratio: float = 2.4
) -> bool:
    """Repetition detector: degenerate decode loops compress extremely well.

    The 2.4 gzip-ratio threshold is Whisper's published decode-quality gate
    (the same signal the reference's stable-ts lane uses to trigger its
    temperature fallback).
    """
    if len(text.strip()) < 16:
        return False
    return transcript_compression_ratio(text) > max_compression_ratio


def _trim_silence(
    audio: np.ndarray, *, frame: int = 512, threshold_db: float = -40.0
) -> tuple[np.ndarray, int]:
    """Energy-gate VAD: trims leading/trailing silence below the threshold.

    Returns the trimmed audio AND the number of leading samples removed —
    decoded timestamps live on the trimmed timeline and must shift back by
    this offset to stay in original-audio coordinates (the reference's VAD
    lanes likewise map timestamps back; the emotion timeline joins by
    original-audio time).
    """
    if audio.size < frame:
        return audio, 0
    n = audio.size // frame
    energy = (audio[: n * frame].reshape(n, frame) ** 2).mean(axis=1)
    ref = float(energy.max())
    if ref <= 0:
        return audio[:0], 0  # pure silence: nothing to transcribe
    active = 10.0 * np.log10(energy / ref + 1e-12) > threshold_db
    if not active.any():
        return audio[:0], 0
    first, last = np.flatnonzero(active)[[0, -1]]
    return audio[first * frame : (last + 1) * frame], int(first * frame)


__all__ = [
    "CHUNK_FRAMES",
    "CHUNK_SAMPLES",
    "WhisperConfig",
    "WhisperEncoder",
    "WhisperForTranscription",
    "alignment_heads_from_hf_dir",
    "encode_mel_chunks",
    "init_whisper_encoder_params",
    "load_hf_whisper_decoder_params",
    "load_hf_whisper_encoder_params",
    "log_mel_spectrogram",
    "suppress_tokens_from_hf_dir",
    "transcript_is_degenerate",
    "whisper_config_from_hf_dir",
]
