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

from ser_tpu._internal.repr.encoder_backend import (
    random_init_seed,
    resolve_local_model_dir,
)
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
        modelscope_cache_root: Path | None = None,
        hub: str | None = None,
        dtype: str = "float32",
        init: str = "auto",
        config: wav2vec2.Wav2Vec2Config | None = None,
        params: dict | None = None,
    ) -> None:
        # Set before super().__init__: the base constructor resolves weights.
        self._modelscope_cache_root = (
            Path(modelscope_cache_root) if modelscope_cache_root is not None else None
        )
        self._hub = resolve_hub(model_id=model_id, hub=hub)
        super().__init__(
            model_id=model_id,
            cache_root=cache_root,
            dtype=dtype,
            init=init,
            config=config,
            params=params,
        )

    def _resolve_weights(self, cache_root, model_id, init, config):
        # Hub-ordered staging roots (reference ``emotion2vec.py:491-504``:
        # `iic/*` ids live on ModelScope, others on HF). Zero-egress runtime:
        # "hub" selects which LOCAL cache root is searched first; the other
        # stays as fallback for re-staged checkpoints.
        roots = [Path(cache_root)]
        if self._modelscope_cache_root is not None:
            if self._hub == "ms":
                roots.insert(0, self._modelscope_cache_root)
            else:
                roots.append(self._modelscope_cache_root)
        model_dir = next(
            (
                found
                for root in roots
                if (found := resolve_local_model_dir(root, model_id)) is not None
            ),
            None,
        )
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
            return cfg, wav2vec2.init_wav2vec2_params(
                cfg, seed=random_init_seed("emotion2vec", model_id)
            )
        raise RuntimeDependencyError(
            f"No local weights for restricted backend {model_id!r} under "
            f"{[str(r) for r in roots]}. Stage the checkpoint locally after "
            "accepting its license (`ser configure --enable-backend emotion2vec`)."
        )

    @property
    def backend_id(self) -> str:
        return "emotion2vec"

    @property
    def hub(self) -> str:
        """Selected hub for staging-root search order (``ms`` or ``hf``)."""
        return self._hub


def resolve_hub(*, model_id: str, hub: str | None) -> str:
    """Normalizes hub selection (reference ``emotion2vec.py:491-504``).

    ``iic/*`` model ids default to ModelScope (where the emotion2vec family
    is published); everything else defaults to Hugging Face.
    """
    if hub is not None:
        normalized = hub.strip().lower()
        if normalized in {"ms", "modelscope"}:
            return "ms"
        if normalized in {"hf", "huggingface"}:
            return "hf"
        raise ValueError("hub must be one of: ms, modelscope, hf, huggingface.")
    return "ms" if model_id.strip().lower().startswith("iic/") else "hf"


__all__ = ["Emotion2VecBackend", "resolve_hub"]
