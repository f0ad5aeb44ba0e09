"""Emotion2vec-class feature backend — the accurate-research profile.

Parity surface: reference ``ser/_internal/repr/emotion2vec.py`` — frame-level
embedding extraction from the ``iic/emotion2vec_plus_large`` family behind the
restricted-backend license gate (reference ``license_check.py``). The model
class is a data2vec-2.0 audio encoder; the flax implementation reuses
``models/wav2vec2.py`` with emotion2vec's structural switches (stacked conv
positional encoder, prenet+trunk blocks). Weights convert from the REAL
checkpoint layout the reference consumes — FunASR/ModelScope ``model.pt``
(fairseq data2vec-2.0 naming, reference ``emotion2vec.py:275-300``) via
``models/emotion2vec_convert.py`` — with the HF wav2vec2 layout accepted as
a fallback for re-exported checkpoints.
"""

from __future__ import annotations

import os
from pathlib import Path

from ser_tpu._internal.repr.encoder_backend import resolve_local_model_dir
from ser_tpu._internal.repr.wav2vec2_backend import XlsrBackend
from ser_tpu._internal.runtime.errors import RuntimeDependencyError
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models import wav2vec2

logger = get_logger(__name__)

#: emotion2vec_plus_large dimensions (data2vec 2.0 audio, ~300M).
_EMOTION2VEC_LARGE = wav2vec2.Wav2Vec2Config(
    hidden_size=1024,
    num_hidden_layers=24,
    num_attention_heads=16,
    intermediate_size=4096,
)


class Emotion2VecBackend(XlsrBackend):
    """Emotion2vec-class encoder backend (backend_id ``emotion2vec``)."""

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
        super().__init__(
            model_id=model_id,
            cache_root=cache_root,
            dtype=dtype,
            init=init,
            config=config,
            params=params,
        )

    def _resolve_weights(self, cache_root, model_id, init, config):
        model_dir = resolve_local_model_dir(Path(cache_root), model_id)
        allow_random = init == "random" or (
            init == "auto" and os.environ.get("SER_ALLOW_RANDOM_INIT", "") == "1"
        )
        if model_dir is not None:
            if (Path(model_dir) / "model.pt").is_file():
                from ser_tpu.models.emotion2vec_convert import (
                    load_funasr_emotion2vec_params,
                )

                cfg, params = load_funasr_emotion2vec_params(model_dir)
                logger.info(
                    "Loaded %s FunASR/data2vec2 weights from %s", model_id, model_dir
                )
                return cfg, params
            cfg = wav2vec2.config_from_hf_dir(model_dir)
            params = wav2vec2.load_hf_wav2vec2_params(model_dir, cfg)
            logger.info("Loaded %s weights from %s", model_id, model_dir)
            return cfg, params
        if allow_random:
            if config is not None:
                cfg = config
            elif os.environ.get("SER_RANDOM_INIT_SIZE", "tiny") == "full":
                # Bench mode: production dims with random weights (see
                # wav2vec2_backend._resolve_weights for rationale).
                cfg = wav2vec2.Wav2Vec2Config()
            else:
                cfg = wav2vec2.Wav2Vec2Config.tiny()
            logger.warning(
                "No local weights for %s; deterministic random init (test mode).", model_id
            )
            return cfg, wav2vec2.init_wav2vec2_params(cfg)
        raise RuntimeDependencyError(
            f"No local weights for restricted backend {model_id!r} under {cache_root}. "
            "Stage the checkpoint locally after accepting its license "
            "(`ser configure --enable-backend emotion2vec`)."
        )

    @property
    def backend_id(self) -> str:
        return "emotion2vec"


__all__ = ["Emotion2VecBackend"]
