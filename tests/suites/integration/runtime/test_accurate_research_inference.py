"""Gated accurate-research inference through the real runtime seams.

Behavioral counterpart of the reference's accurate-research integration suite
(``tests/suites/integration/runtime/test_accurate_research_inference.py``):
the configured research model id reaches the emotion2vec backend (staged under
the ModelScope hub cache, reference ``emotion2vec.py:117-131``), and with the
restricted-backend gates satisfied the hook runs the full windowed pass —
train → artifact → encode → pool → predict → postprocess.
"""

import dataclasses
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[4] / "scripts"))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "unit" / "models"))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402
from test_emotion2vec_convert import build_synthetic_checkpoint  # noqa: E402

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.runtime.backend_hooks import build_backend_hooks
from ser_tpu.runtime.contracts import InferenceRequest

MODEL_ID = "iic/test-emotion2vec-tiny"


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("acc_research")
    # 1.9 s clips stay in the 2 s chunk bucket: XLA CPU's conv-frontend
    # lowering is ~quadratic-per-bucket in wall clock (42 s steady for one
    # 8 s-bucket encode), so corpus length directly gates this suite's budget.
    build_dataset(root / "ds", actors=2, repetitions=2, seconds=1.9)
    built = build_synthetic_checkpoint(root / "staging")
    model_dir = root / "cache" / "modelscope" / "hub" / MODEL_ID
    model_dir.mkdir(parents=True)
    (model_dir / "model.pt").write_bytes((built / "model.pt").read_bytes())
    return root


def _settings(root):
    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(root / "ds"),
                "SER_MODELS_FOLDER": str(root / "models"),
                "SER_TMP_FOLDER": str(root / "tmp"),
                "SER_MODEL_CACHE_DIR": str(root / "cache"),
                "SER_ENABLE_ACCURATE_RESEARCH_PROFILE": "1",
                "SER_ENABLE_RESTRICTED_BACKENDS": "1",
                "SER_ALLOWED_RESTRICTED_BACKENDS": "emotion2vec",
                "SER_ACCURATE_RESEARCH_MODEL_ID": MODEL_ID,
            }
        )
    )
    return dataclasses.replace(
        settings,
        nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(16,), max_iter=60),
    )


def test_configured_model_id_reaches_backend_via_modelscope_staging(env):
    """The spec factory builds the backend from the CONFIGURED research id,
    resolved through the ModelScope hub cache (no HF staging exists here)."""
    from ser_tpu._internal.repr.encoders import build_encoder_backend

    backend = build_encoder_backend("accurate-research", settings=_settings(env))
    assert backend.backend_id == "emotion2vec"
    assert backend.hub == "ms"
    assert backend.model_id == MODEL_ID


def test_gated_hook_runs_full_windowed_inference(env, monkeypatch):
    # Process-env knob (readiness reads os.environ, not settings): the
    # harness's 8 virtual CPU devices split compute threads and first-compile
    # latency counts toward the smoke deadline.
    monkeypatch.setenv("SER_TRAINING_SMOKE_TIMEOUT_SECONDS", "600")
    settings = _settings(env)

    # Gates satisfied → the emotion2vec hook exists.
    hooks = build_backend_hooks(settings)
    assert "emotion2vec" in hooks

    from ser_tpu._internal.models.encoder_training import train_encoder_profile_model

    report = train_encoder_profile_model(profile="accurate-research", settings=settings)
    assert report["backend_id"] == "emotion2vec"
    assert Path(report["model_path"]).exists()

    clip = next((env / "ds" / "Actor_01").glob("*.wav"))
    result = hooks["emotion2vec"](InferenceRequest(file_path=str(clip), language="en"))
    assert result.segments, "gated accurate-research inference produced no segments"
    assert all(s.end_seconds > s.start_seconds for s in result.segments)
    assert all(0.0 <= s.confidence <= 1.0 for s in result.segments)
