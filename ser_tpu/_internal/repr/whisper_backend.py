"""Whisper-encoder feature backend — the accurate profile's compute core.

Parity surface: reference ``ser/_internal/repr/hf_whisper.py`` — encoder-only
embedding extraction from a Whisper checkpoint (``:383-386``), hidden size
taken from the model config (``:495-503``), load-info validation, chunked
encode with per-chunk timestamp interpolation. The encoder runs as one jitted
program per 30 s window (mel frontend in-graph, ``models/whisper.py``).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ser_tpu._internal.repr.backend import (
    EncodedSequence,
    FeatureMatrix,
    PoolingWindow,
    overlap_frame_mask,
)
from ser_tpu._internal.repr.encoder_backend import (
    random_init_seed,
    resolve_local_model_dir,
)
from ser_tpu._internal.runtime.errors import RuntimeDependencyError
from ser_tpu._internal.utils.audio_io import resample_audio
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models import whisper as whisper_model

logger = get_logger(__name__)


class WhisperEncoderBackend:
    """Whisper encoder embeddings backend (backend_id ``jax_whisper_encoder``)."""

    def __init__(
        self,
        *,
        model_id: str,
        cache_root: Path,
        dtype: str = "float32",
        init: str = "auto",
        config: whisper_model.WhisperConfig | None = None,
        params: dict | None = None,
    ) -> None:
        self._model_id = model_id
        self._dtype = dtype
        if params is not None and config is not None:
            self._config, self._params = config, params
        else:
            self._config, self._params = self._resolve_weights(cache_root, model_id, init, config)
        # "int8" = W8A8 projection matmuls (models/quant.py), bf16 everywhere
        # else — measured 1.42x on the projection stream (INT8_MATMUL_r03.json).
        quant_int8 = dtype == "int8"
        compute = jnp.bfloat16 if dtype in ("bfloat16", "int8") else jnp.float32
        if compute == jnp.bfloat16:
            # Inference-only: bf16 STORAGE halves HBM residency (XLA hoists
            # the per-op casts either way — identical computed values).
            from ser_tpu.models.param_utils import cast_params_bf16

            self._params = cast_params_bf16(self._params)
        self._encoder = whisper_model.WhisperEncoder(
            self._config, compute_dtype=compute, quant_int8=quant_int8
        )

    def _resolve_weights(self, cache_root, model_id, init, config):
        model_dir = resolve_local_model_dir(Path(cache_root), model_id)
        allow_random = init == "random" or (
            init == "auto" and os.environ.get("SER_ALLOW_RANDOM_INIT", "") == "1"
        )
        if model_dir is not None:
            cfg = whisper_model.whisper_config_from_hf_dir(model_dir)
            params = whisper_model.load_hf_whisper_encoder_params(model_dir, cfg)
            logger.info("Loaded %s encoder weights from %s", model_id, model_dir)
            return cfg, params
        if allow_random:
            if config is not None:
                cfg = config
            elif os.environ.get("SER_RANDOM_INIT_SIZE", "tiny") == "full":
                # Bench mode: full production dims with deterministic random
                # weights — throughput/latency are weight-agnostic, so this
                # measures the REAL model cost without staged checkpoints.
                cfg = whisper_model.WhisperConfig()
            else:
                cfg = whisper_model.WhisperConfig.tiny()
            logger.warning(
                "No local weights for %s; deterministic random init (test mode).", model_id
            )
            return cfg, whisper_model.init_whisper_encoder_params(
                cfg, seed=random_init_seed("jax_whisper_encoder", model_id)
            )
        raise RuntimeDependencyError(
            f"No local weights for {model_id!r} under {cache_root}. Pre-download the "
            "HF checkpoint there, or set SER_ALLOW_RANDOM_INIT=1 for test mode."
        )

    @property
    def backend_id(self) -> str:
        return "jax_whisper_encoder"

    @property
    def feature_dim(self) -> int:
        return self._config.d_model

    def prepare_runtime(self) -> None:
        """Warms the 30 s-window jit cache."""
        whisper_model.encode_mel_chunks(
            self._encoder,
            self._params,
            jnp.zeros((1, whisper_model.CHUNK_SAMPLES), dtype=jnp.float32),
        )

    def encode_sequence(self, audio: np.ndarray, sample_rate: int) -> EncodedSequence:
        """Encodes audio: all 30 s windows in one batched call, frames at 20 ms."""
        if audio.ndim != 1 or audio.size == 0:
            raise ValueError("audio must be non-empty mono.")
        audio16k = resample_audio(
            np.asarray(audio, dtype=np.float32), sample_rate, whisper_model.SAMPLE_RATE
        )
        chunk = whisper_model.CHUNK_SAMPLES
        n_chunks = max(1, int(np.ceil(audio16k.size / chunk)))
        batch = np.zeros((n_chunks, chunk), dtype=np.float32)
        for row in range(n_chunks):
            piece = audio16k[row * chunk : (row + 1) * chunk]
            batch[row, : piece.size] = piece

        states = np.asarray(
            whisper_model.encode_mel_chunks(self._encoder, self._params, jnp.asarray(batch))
        )
        if not np.all(np.isfinite(states)):
            raise ValueError("Whisper encoder produced non-finite embeddings.")

        n_states = states.shape[1]  # 1500 per 30 s window
        embeddings, starts, ends = [], [], []
        for row in range(n_chunks):
            chunk_samples = min(chunk, audio16k.size - row * chunk)
            duration = chunk_samples / whisper_model.SAMPLE_RATE
            n_valid = max(1, int(round(n_states * duration / whisper_model.CHUNK_SECONDS)))
            frame_duration = duration / n_valid
            base = row * chunk / whisper_model.SAMPLE_RATE
            frame_starts = base + frame_duration * np.arange(n_valid)
            embeddings.append(states[row, :n_valid])
            starts.append(frame_starts)
            ends.append(frame_starts + frame_duration)

        return EncodedSequence(
            embeddings=np.concatenate(embeddings).astype(np.float32),
            frame_start_seconds=np.concatenate(starts).astype(np.float64),
            frame_end_seconds=np.concatenate(ends).astype(np.float64),
            backend_id=self.backend_id,
        )

    def pool(
        self, encoded: EncodedSequence, windows: Sequence[PoolingWindow]
    ) -> FeatureMatrix:
        from ser_tpu._internal.repr.backend import window_mean_pool

        return window_mean_pool(encoded, windows)


__all__ = ["WhisperEncoderBackend"]
