"""CLI medium-profile smoke with STAGED checkpoint weights (no random-init).

The encoder-profile workflows elsewhere run under SER_ALLOW_RANDOM_INIT or
with fake backends; this module stages a tiny synthetic HF wav2vec2
checkpoint as the medium model and exercises the reference's production
medium flow end to end in real subprocesses: enable flag → encoder training
(readiness, chunked encode, artifact v3) → windowed inference → timeline.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[3] / "scripts"
REPR_SUITE = Path(__file__).resolve().parents[1] / "unit" / "repr"
HELPERS = Path(__file__).resolve().parents[3] / "tests" / "utils" / "helpers"
sys.path.insert(0, str(SCRIPTS))
sys.path.insert(0, str(REPR_SUITE))
sys.path.insert(0, str(HELPERS))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402
from subprocess_env import local_cpu_env  # noqa: E402
from test_backend_weight_resolution import build_hf_checkpoint  # noqa: E402

MODEL_ID = "synthetic/tiny-xlsr"


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_medium")
    # Smallest corpus the split ladder accepts; 1.9 s clips stay in the 2 s
    # chunk bucket (XLA CPU's conv-frontend lowering is ~quadratic-per-bucket
    # in wall clock, so clip length directly gates this smoke's budget).
    build_dataset(root / "dataset", actors=2, repetitions=1, seconds=1.9)
    build_hf_checkpoint(root / "cache" / "huggingface" / MODEL_ID)
    # local_cpu_env: a child inheriting the remote-compile TPU plugin pays
    # minutes per XLA compile (the readiness smoke's SIGALRM budget cannot
    # absorb that); scrubbing it keeps every compile a local CPU compile.
    env = local_cpu_env()
    env.pop("SER_ALLOW_RANDOM_INIT", None)
    env.update(
        SER_DATASET_FOLDER=str(root / "dataset"),
        SER_MODELS_FOLDER=str(root / "models"),
        SER_TRANSCRIPTS_FOLDER=str(root / "transcripts"),
        SER_TMP_FOLDER=str(root / "tmp"),
        SER_MODEL_CACHE_DIR=str(root / "cache"),
        SER_ENABLE_MEDIUM_PROFILE="1",
        SER_MEDIUM_MODEL_ID=MODEL_ID,
        # Readiness's SIGALRM backend smoke counts first-compile latency
        # toward its deadline; CI-class single-core hosts need headroom.
        SER_TRAINING_SMOKE_TIMEOUT_SECONDS="600",  # validation caps at 600
    )
    return root, env


def _run(args, env, timeout=1800):
    return subprocess.run(
        [sys.executable, "-m", "ser_tpu", *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_medium_train_then_infer_with_staged_weights(env):
    root, env_vars = env

    result = _run(["--train", "--profile", "medium"], env_vars)
    assert result.returncode == 0, result.stderr
    report_path = root / "models" / "training_report_medium.json"
    if not report_path.exists():  # report name is profile-scoped; fall back
        candidates = sorted((root / "models").glob("*report*medium*.json")) or sorted(
            (root / "models").glob("*.json")
        )
        assert candidates, f"no training report in {list((root / 'models').iterdir())}"
        report_path = candidates[0]
    report = json.loads(report_path.read_text())
    assert report, "empty training report"

    clip = next((root / "dataset" / "Actor_01").glob("03-01-04*.wav"))
    result = _run(
        ["--file", str(clip), "--profile", "medium", "--no-transcript"], env_vars
    )
    assert result.returncode == 0, result.stderr
    assert "Time" in result.stdout, result.stdout
