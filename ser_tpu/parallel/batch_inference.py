"""Batch inference: many clips through one profile with mesh data parallelism.

Production serving path (SURVEY §7 step 8: "pjit meshes for accurate-profile
batch inference over ICI/DCN"): clips are decoded on host threads, their 30 s
chunks pooled into large cross-clip device batches sharded over the mesh's
data axis, and the deterministic window→pool→predict→postprocess pass runs per
clip on host. The reference has no batch API (one process per request); this
is the TPU-native throughput surface.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.models import artifacts
from ser_tpu._internal.models.emotion_model import load_model
from ser_tpu._internal.runtime.postprocessing import build_segment_postprocessing_config
from ser_tpu._internal.runtime.profile_execution import run_windowed_inference_once
from ser_tpu._internal.utils.audio_io import read_audio_file
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.profiles import ProfileName, get_profile_catalog
from ser_tpu.runtime.schema import InferenceResult

logger = get_logger(__name__)


@dataclass(frozen=True)
class BatchInferenceResult:
    """Per-file outcome of one batch run."""

    file_path: str
    result: InferenceResult | None
    error: str | None = None


def infer_many(
    file_paths: list[str],
    *,
    profile: ProfileName = "accurate",
    settings: AppConfig | None = None,
    decode_workers: int = 8,
) -> list[BatchInferenceResult]:
    """Runs one profile over many files with batched encoding.

    Per-file decode failures are contained (reported in the result row);
    encode/predict failures raise, since they indicate a systemic problem.
    """
    settings = settings if settings is not None else reload_settings()
    spec = get_profile_catalog()[profile]
    if profile == "fast":
        raise ValueError("Batch inference targets encoder profiles; use api.infer for fast.")

    # Same gates as the serving path (backend_hooks.build_backend_hooks):
    # batch inference must not become a side door around profile enable
    # flags or restricted-backend license consent.
    from ser_tpu._internal.runtime import restricted_backends
    from ser_tpu._internal.runtime.backend_hooks import (
        _profile_enabled,
        build_profile_spec,
    )

    if not _profile_enabled(profile, settings):
        raise ValueError(
            f"Profile {profile!r} is disabled (enable it via its runtime flag)."
        )
    if spec.backend_id in restricted_backends.RESTRICTED_BACKEND_POLICIES:
        restricted_backends.ensure_backend_access(spec.backend_id, settings=settings)

    from ser_tpu._internal.repr.encoders import build_encoder_backend, resolved_model_id
    from ser_tpu._internal.repr.encode_util import encode_clips

    boundary_spec = build_profile_spec(profile, settings)
    backend = build_encoder_backend(profile, settings=settings)
    loaded = artifacts.load_model_artifact(
        settings.models.folder / boundary_spec.artifact_file_name,
        expected_backend_id=boundary_spec.backend_id,
        expected_profile=profile,
        expected_model_id=resolved_model_id(profile, settings) or None,
    )
    runtime = settings.profile_runtime(profile)  # type: ignore[arg-type]
    postprocessing = build_segment_postprocessing_config(runtime)

    rows: list[BatchInferenceResult | None] = [None] * len(file_paths)
    decoded: list[tuple[int, np.ndarray, int]] = []

    def decode(indexed):
        index, path = indexed
        try:
            audio, sr = read_audio_file(path, audio_read_config=settings.audio_read)
            return (index, audio, sr)
        except Exception as err:  # noqa: BLE001 - contained per file
            rows[index] = BatchInferenceResult(path, None, error=f"{type(err).__name__}: {err}")
            return None

    with ThreadPoolExecutor(max_workers=max(1, decode_workers)) as pool:
        for item in pool.map(decode, enumerate(file_paths)):
            if item is not None:
                decoded.append(item)
    if not decoded:
        return [row or BatchInferenceResult(p, None, "not decoded") for row, p in zip(rows, file_paths)]

    clips = [(audio, sr) for _, audio, sr in decoded]
    sequences = encode_clips(backend, clips)
    if len(sequences) != len(decoded):
        raise RuntimeError(
            f"Backend returned {len(sequences)} encoded sequences for "
            f"{len(decoded)} clips; refusing to silently drop files."
        )

    for (index, audio, sr), encoded in zip(decoded, sequences):
        result = run_windowed_inference_once(
            audio=audio,
            sample_rate=sr,
            backend=backend,
            model=loaded.model,
            pool_window_size_seconds=runtime.pool_window_size_seconds,
            pool_window_stride_seconds=runtime.pool_window_stride_seconds,
            pooling_strategy=boundary_spec.pooling_strategy,
            postprocessing_config=postprocessing,
            output_schema_version=settings.schema.output_schema_version,
            expected_feature_size=loaded.expected_feature_size,
            encode_fn=lambda *_args, _encoded=encoded: _encoded,
        )
        rows[index] = BatchInferenceResult(file_paths[index], result)
    return [row for row in rows if row is not None]


__all__ = ["BatchInferenceResult", "infer_many"]
