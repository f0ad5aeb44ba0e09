"""JAX Whisper transcription backend.

Parity surface: reference ``transcript/backends/stable_whisper.py`` /
``faster_whisper.py`` — one JAX encoder-decoder replaces both torch backends
(SURVEY.md §7 step 6). Greedy KV-cache decode with word-level timestamps comes
from ``ser_tpu/models/whisper.py``; this adapter handles asset resolution,
optional VAD gating, and the transcribe contract.

Zero-egress: weights must already be present under the configured cache root
(HF format); otherwise a typed availability error is raised.
"""

from __future__ import annotations

from pathlib import Path

from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.domain import TranscriptWord

logger = get_logger(__name__)


class JaxWhisperTranscriber:
    """Whisper transcription over the JAX encoder-decoder."""

    def __init__(
        self,
        *,
        model_name: str,
        cache_root: Path,
        use_vad: bool = True,
        use_demucs: bool = False,
        decode_strategy: str = "greedy",
        beam_size: int = 5,
        length_penalty: float = 1.0,
        separation_model_path: Path | None = None,
    ) -> None:
        self._model_name = model_name
        self._cache_root = Path(cache_root)
        self._use_vad = use_vad
        self._use_demucs = use_demucs
        self._decode_strategy = decode_strategy
        self._beam_size = beam_size
        self._length_penalty = length_penalty
        self._separation_model_path = separation_model_path
        self._model = None

    def _assets_dir(self) -> Path | None:
        """Locates local HF-format Whisper weights for the configured model."""
        candidates = [
            self._cache_root / self._model_name,
            self._cache_root / self._model_name.replace("/", "--"),
        ]
        for candidate in candidates:
            if candidate.is_dir() and any(candidate.iterdir()):
                return candidate
        return None

    def assets_available(self) -> bool:
        return self._assets_dir() is not None

    # ------------------------------------------------------------------ #
    # TranscriptionBackendAdapter contract (transcript/base.py)
    # ------------------------------------------------------------------ #

    @property
    def backend_id(self) -> str:
        return "jax_whisper"

    def check_compatibility(self):
        from ser_tpu._internal.transcript.base import (
            CompatibilityIssue,
            CompatibilityReport,
        )

        issues = []
        if not self.assets_available():
            issues.append(
                CompatibilityIssue(
                    kind="functional",
                    message=(
                        f"Whisper assets for {self._model_name!r} missing under "
                        f"{self._cache_root}."
                    ),
                    blocking=True,
                )
            )
        if self._use_demucs:
            issues.append(
                CompatibilityIssue(
                    kind="noise",
                    message=(
                        "Separation runs the staged demucs-class neural "
                        "separator when SER_SEPARATION_MODEL_PATH points at a "
                        "checkpoint; otherwise the built-in REPET-SIM vocal "
                        "separator + spectral gate take the lane."
                    ),
                )
            )
        return CompatibilityReport(issues=tuple(issues))

    def setup_required(self) -> bool:
        return self._model is None

    def prepare_assets(self) -> None:
        if not self.assets_available():
            from ser_tpu._internal.transcript.extractor import TranscriptionUnavailableError

            raise TranscriptionUnavailableError(
                f"Whisper assets for {self._model_name!r} must be staged locally."
            )

    def load_model(self, request=None) -> None:
        assets = self._assets_dir()
        if assets is None:
            self.prepare_assets()
            # prepare_assets returning (instead of raising) means assets
            # appeared between the two checks (concurrent staging) —
            # re-resolve rather than calling from_pretrained_dir(None).
            assets = self._assets_dir()
            if assets is None:
                from ser_tpu._internal.transcript.extractor import (
                    TranscriptionUnavailableError,
                )

                raise TranscriptionUnavailableError(
                    f"Whisper assets for {self._model_name!r} must be staged locally."
                )
        if self._model is None:
            from ser_tpu.models.whisper import WhisperForTranscription

            dtype = "bfloat16" if request is None else request.precision_candidates[0]
            self._model = WhisperForTranscription.from_pretrained_dir(
                assets,
                compute_dtype=dtype if dtype in ("bfloat16", "float32") else "float32",
                decode_strategy=self._decode_strategy,
                beam_size=self._beam_size,
                length_penalty=self._length_penalty,
            )

    def transcribe(self, file_path: str, *, language: str = "en") -> list[TranscriptWord]:
        """Transcribes one audio file to word-level timestamps.

        The separation hook fills the reference's demucs lane
        (``stable_whisper.py:272-478`` runs demucs + VAD before transcribing):
        with ``use_demucs`` on, audio routes through vocal separation — the
        demucs-class flax U-Net when a checkpoint is staged
        (``SER_SEPARATION_MODEL_PATH``), else the weight-free REPET-SIM
        separator — followed by the spectral gate (residual stationary
        noise) before VAD/decoding.
        """
        if self._model is None:
            self.load_model()
        from ser_tpu._internal.utils.audio_io import read_audio_file, resample_audio

        audio, sr = read_audio_file(file_path)
        audio16k = resample_audio(audio, sr, 16000)
        if self._use_demucs:
            from ser_tpu._internal.utils.denoise import spectral_gate_denoise
            from ser_tpu._internal.utils.source_separation import (
                separate_vocals_auto,
            )

            audio16k = spectral_gate_denoise(
                separate_vocals_auto(
                    audio16k, 16000, model_path=self._separation_model_path
                )
            )
        return self._model.transcribe_words(
            audio16k, language=language, use_vad=self._use_vad
        )


__all__ = ["JaxWhisperTranscriber"]
