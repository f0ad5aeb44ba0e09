"""XLS-R (wav2vec2) feature backend — the medium profile's compute core.

Parity surface: reference ``ser/_internal/repr/hf_xlsr.py`` — same contract
(chunked encode, last-hidden-state embeddings, mean+std pooling downstream,
``model_id`` pinning) over the flax encoder in ``ser_tpu/models/wav2vec2.py``.

Weight policy: local HF checkpoint when present; otherwise either a typed
runtime-dependency error or (``init="random"`` / ``SER_ALLOW_RANDOM_INIT=1``)
deterministic random weights for tests and benchmarks.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu._internal.repr.backend import (
    EncodedSequence,
    FeatureMatrix,
    PoolingWindow,
)
from ser_tpu._internal.repr.encoder_backend import (
    chunked_encode,
    random_init_seed,
    resolve_local_model_dir,
)
from ser_tpu._internal.runtime.errors import RuntimeDependencyError
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models import wav2vec2

logger = get_logger(__name__)


class XlsrBackend:
    """wav2vec2/XLS-R encoder backend (backend_id ``jax_xlsr``)."""

    def __init__(
        self,
        *,
        model_id: str,
        cache_root: Path,
        dtype: str = "float32",
        init: str = "auto",
        config: wav2vec2.Wav2Vec2Config | None = None,
        params: dict | None = None,
    ) -> None:
        self._model_id = model_id
        self._dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        if params is not None and config is not None:
            self._config, self._params = config, params
        else:
            self._config, self._params = self._resolve_weights(
                cache_root, model_id, init, config
            )
        if self._dtype == jnp.bfloat16:
            # Inference-only backend: bf16 storage halves HBM residency; the
            # compute path casts to bf16 per op regardless (identical values).
            from ser_tpu.models.param_utils import cast_params_bf16

            self._params = cast_params_bf16(self._params)
        self._model = wav2vec2.Wav2Vec2Encoder(self._config, compute_dtype=self._dtype)

    def _resolve_weights(self, cache_root, model_id, init, config):
        model_dir = resolve_local_model_dir(Path(cache_root), model_id)
        allow_random = init == "random" or (
            init == "auto" and os.environ.get("SER_ALLOW_RANDOM_INIT", "") == "1"
        )
        if model_dir is not None:
            cfg = wav2vec2.config_from_hf_dir(model_dir)
            params = wav2vec2.load_hf_wav2vec2_params(model_dir, cfg)
            logger.info("Loaded %s weights from %s", model_id, model_dir)
            return cfg, params
        if allow_random:
            if config is not None:
                cfg = config
            elif os.environ.get("SER_RANDOM_INIT_SIZE", "tiny") == "full":
                # Bench mode: XLS-R-300M production dims, random weights —
                # honest throughput/latency without staged checkpoints.
                cfg = wav2vec2.Wav2Vec2Config()
            else:
                cfg = wav2vec2.Wav2Vec2Config.tiny()
            logger.warning(
                "No local weights for %s; using deterministic random init "
                "(benchmark/test mode).",
                model_id,
            )
            return cfg, wav2vec2.init_wav2vec2_params(
                cfg, seed=random_init_seed("jax_xlsr", model_id)
            )
        raise RuntimeDependencyError(
            f"No local weights for {model_id!r} under {cache_root}. Pre-download the "
            "HF checkpoint there, or set SER_ALLOW_RANDOM_INIT=1 for test mode."
        )

    @property
    def backend_id(self) -> str:
        return "jax_xlsr"

    @property
    def model_id(self) -> str:
        return self._model_id

    @property
    def feature_dim(self) -> int:
        return self._config.hidden_size

    def prepare_runtime(self) -> None:
        """Warms the jit cache on a 1 s chunk."""
        _encode_chunks(
            self._model, self._params, jnp.zeros((1, 16000), dtype=jnp.float32),
            jnp.asarray([16000]),
        )

    def _frames_for_length(self, samples: int) -> int:
        cfg = self._config
        return max(0, (samples - cfg.frame_receptive_samples) // cfg.frame_stride_samples + 1)

    def _switch_to_float32(self):
        """Permanently resets the runtime to float32 (reference hf_xlsr
        semantics after a non-finite result: the retry AND every later encode
        run full-precision)."""
        if self._dtype == jnp.float32:
            return
        logger.warning("%s: resetting runtime to float32 after non-finite output.", self.backend_id)
        self._params = jax.tree.map(
            lambda leaf: leaf.astype(jnp.float32)
            if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
            else leaf,
            self._params,
        )
        self._dtype = jnp.float32
        self._model = wav2vec2.Wav2Vec2Encoder(self._config, compute_dtype=jnp.float32)

    def _encode_batch(self, batch, lengths):
        return _encode_chunks(
            self._model, self._params, jnp.asarray(batch), jnp.asarray(lengths)
        )

    def _float32_encode_batch(self):
        self._switch_to_float32()
        return self._encode_batch

    def encode_sequence(
        self, audio: np.ndarray, sample_rate: int
    ) -> EncodedSequence:
        """Encodes audio into 20 ms-resolution embeddings in one batched call."""
        return chunked_encode(
            audio,
            sample_rate,
            encode_batch=self._encode_batch,
            frames_for_length=self._frames_for_length,
            backend_id=self.backend_id,
            float32_encode_batch=self._float32_encode_batch,
        )

    def encode_sequences(
        self, clips: list[tuple[np.ndarray, int]]
    ) -> list[EncodedSequence]:
        """Encodes many clips with cross-clip chunk batching (training path)."""
        from ser_tpu._internal.repr.encoder_backend import chunked_encode_many

        return chunked_encode_many(
            clips,
            encode_batch=self._encode_batch,
            frames_for_length=self._frames_for_length,
            backend_id=self.backend_id,
            float32_encode_batch=self._float32_encode_batch,
        )

    def pool(
        self, encoded: EncodedSequence, windows: Sequence[PoolingWindow]
    ) -> FeatureMatrix:
        """Mean pooling per window (mean+std is applied by the execution pass)."""
        from ser_tpu._internal.repr.backend import window_mean_pool

        return window_mean_pool(encoded, windows)


@partial(jax.jit, static_argnames=("model",))
def _encode_chunks(
    model: wav2vec2.Wav2Vec2Encoder,
    params: dict,
    chunks: jax.Array,
    lengths: jax.Array,
) -> jax.Array:
    """Batched masked encode; params are traced (donated weights stay in HBM)."""
    cfg = model.config
    n_frames_total = max(
        1, (chunks.shape[1] - cfg.frame_receptive_samples) // cfg.frame_stride_samples + 1
    )
    valid = (lengths - cfg.frame_receptive_samples) // cfg.frame_stride_samples + 1
    mask = jnp.arange(n_frames_total)[None, :] < valid[:, None]
    hidden = model.apply({"params": params}, chunks, frame_mask=mask)
    return hidden.astype(jnp.float32)


__all__ = ["XlsrBackend"]
