"""CLI workflow smoke: train + infer + doctor + data through the real CLI.

Mirrors the reference smoke suite (``tests/suites/smoke/
test_cli_runtime_workflows.py``): synthetic RAVDESS corpus, real subprocesses,
real artifacts.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[3] / "scripts"
HELPERS = Path(__file__).resolve().parents[3] / "tests" / "utils" / "helpers"
sys.path.insert(0, str(SCRIPTS))
sys.path.insert(0, str(HELPERS))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402
from subprocess_env import local_cpu_env  # noqa: E402


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_smoke")
    build_dataset(root / "dataset", actors=2, repetitions=2, seconds=3.2)
    # local_cpu_env scrubs the remote-compile TPU plugin so CLI subprocesses
    # compile locally regardless of tunnel state.
    env = local_cpu_env()
    env.update(
        SER_DATASET_FOLDER=str(root / "dataset"),
        SER_MODELS_FOLDER=str(root / "models"),
        SER_TRANSCRIPTS_FOLDER=str(root / "transcripts"),
        SER_TMP_FOLDER=str(root / "tmp"),
    )
    return root, env


def _run(args, env, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "ser_tpu", *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_cli_train_infer_doctor_flow(env):
    root, env_vars = env
    # Keep CLI training snappy in smoke: the fit converges long before 500.
    result = _run(["--train", "--dry-run"], env_vars)
    assert result.returncode == 0, result.stderr
    assert "usable=32" in result.stdout

    result = _run(["--train"], env_vars)
    assert result.returncode == 0, result.stderr
    report_path = root / "models" / "training_report.json"
    assert report_path.exists()
    report = json.loads(report_path.read_text())
    assert report["accuracy"] >= 0.5

    clip = next((root / "dataset" / "Actor_01").glob("03-01-03*.wav"))
    result = _run(
        ["--file", str(clip), "--no-transcript", "--save_transcript"], env_vars
    )
    assert result.returncode == 0, result.stderr
    assert "Timeline CSV:" in result.stdout

    result = _run(["doctor", "--style", "json", "--no-transcription-checks"], env_vars)
    assert result.returncode == 0, result.stderr
    payload = json.loads(result.stdout[result.stdout.index("{") :])
    assert any(f["code"] == "profile.fast" for f in payload["findings"])
    assert "counts" in payload["summary"]


def test_cli_validation_exit_codes(env):
    _, env_vars = env
    # Missing file → validation error exit code 2.
    result = _run(["--file", "/nonexistent.wav", "--no-transcript", "--preflight", "off"], env_vars)
    assert result.returncode == 2, (result.returncode, result.stderr)


def test_cli_data_surface(env):
    root, env_vars = env
    result = _run(["data", "list"], env_vars)
    assert result.returncode == 0
    assert "ravdess" in result.stdout
    result = _run(["data", "prepare", "ravdess", "--accept-license"], env_vars)
    assert result.returncode == 0, result.stderr
    assert "32 utterances" in result.stdout


def test_cli_configure_dataset_consent_flow(env):
    # Reference `ser configure` semantics (data/cli.py:108-154): show prints
    # the persisted record; accepting without --persist refuses with exit 2.
    root, env_vars = env
    # The store rides the models folder (shared across this module's env
    # fixture, where an earlier `--accept-license` may have persisted);
    # isolate with the reference's own override (dataset_consents.py:23).
    consent_env = dict(
        env_vars,
        SER_DATASET_CONSENTS_FILE=str(root / "isolated" / "dataset_consents.json"),
    )
    result = _run(["configure", "--show"], consent_env)
    assert result.returncode == 0
    assert "Persisted dataset policy consents: (none)" in result.stdout

    result = _run(["configure", "--accept-dataset-policy", "noncommercial"], consent_env)
    assert result.returncode == 2
    assert "Refusing to modify local config without --persist." in result.stdout

    result = _run(
        [
            "configure",
            "--accept-dataset-policy", "noncommercial",
            "--accept-dataset-license", "cc-by-nc-sa-4.0",
            "--persist",
        ],
        consent_env,
    )
    assert result.returncode == 0
    result = _run(["configure", "--show"], consent_env)
    assert "noncommercial" in result.stdout
    assert "cc-by-nc-sa-4.0" in result.stdout
