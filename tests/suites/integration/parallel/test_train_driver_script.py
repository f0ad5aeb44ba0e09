"""Smoke for the scale-out training driver (`scripts/train_encoder_scaled.py`).

Runs the real script in a subprocess on the 8-device virtual mesh: train two
dispatches with checkpointing, then resume and confirm the step counter
carried across the process boundary.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[4]
SCRIPT = REPO / "scripts" / "train_encoder_scaled.py"


def _run(args, tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, str(SCRIPT), *args],
        capture_output=True,
        text=True,
        timeout=480,
        env=env,
        cwd=str(tmp_path),
    )
    assert result.returncode == 0, result.stdout + result.stderr
    return result.stdout


def test_train_then_resume_across_processes(tmp_path):
    ckpt = tmp_path / "ck"
    base = [
        "--synthetic",
        "--model",
        "tiny",
        "--batch",
        "8",
        "--steps-per-dispatch",
        "1",
        "--checkpoint",
        str(ckpt),
    ]
    first = _run([*base, "--steps", "1"], tmp_path)
    assert "step     1" in first and "done" in first
    resumed = _run([*base, "--steps", "2", "--resume"], tmp_path)
    assert "resumed at step 1" in resumed
    assert "step     2" in resumed and "done" in resumed
