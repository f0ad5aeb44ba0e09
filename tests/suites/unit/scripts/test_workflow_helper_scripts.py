"""Contracts for the shell helpers CI workflow lanes invoke.

Parity surface: reference ``tests/suites/unit/scripts/test_workflow_helper_scripts.py``
(bash-syntax gate + invocation-contract pins) extended with behavioral runs:
the reference only greps script text; these tests execute the helpers against
temp directories and a recording fake interpreter, which is the stronger
contract the zero-egress environment allows.
"""

from __future__ import annotations

import os
import stat
import subprocess
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[4]
WORKFLOWS = REPO_ROOT / "scripts" / "workflows"


def _run(script: Path, *args: str, env: dict[str, str] | None = None, cwd: Path | None = None):
    merged = dict(os.environ)
    if env is not None:
        merged.update(env)
    return subprocess.run(
        ["bash", str(script), *args],
        capture_output=True,
        text=True,
        env=merged,
        cwd=cwd or REPO_ROOT,
    )


def test_all_shell_helpers_have_valid_bash_syntax():
    """Every shell helper parses before CI spends an expensive lane on it."""
    scripts = sorted((REPO_ROOT / "scripts").rglob("*.sh"))
    assert scripts, "expected shell helpers under scripts/"
    for script in scripts:
        subprocess.run(["bash", "-n", str(script)], check=True)


class TestConfigureRuntimeDirs:
    SCRIPT = WORKFLOWS / "configure_runtime_dirs.sh"

    def test_requires_github_env(self, tmp_path):
        env = {"RUNNER_TEMP": str(tmp_path)}
        env_clear = dict(os.environ)
        env_clear.pop("GITHUB_ENV", None)
        env_clear.update(env)
        result = subprocess.run(
            ["bash", str(self.SCRIPT)], capture_output=True, text=True, env=env_clear
        )
        assert result.returncode == 2
        assert "GITHUB_ENV must be set" in result.stderr

    def test_exports_default_layout_and_creates_directories(self, tmp_path):
        github_env = tmp_path / "github.env"
        github_env.touch()
        result = _run(
            self.SCRIPT,
            env={"GITHUB_ENV": str(github_env), "RUNNER_TEMP": str(tmp_path)},
        )
        assert result.returncode == 0, result.stderr
        exported = github_env.read_text(encoding="utf-8")
        assert f"SER_MAX_WORKERS=1" in exported
        for name in ("models", "data", "cache", "transcripts"):
            path = tmp_path / f"ser-{name}"
            assert path.is_dir(), f"{path} was not created"
            assert str(path) in exported

    def test_honors_explicit_directories_and_worker_count(self, tmp_path):
        github_env = tmp_path / "github.env"
        github_env.touch()
        models = tmp_path / "custom" / "models"
        result = _run(
            self.SCRIPT,
            "--max-workers",
            "4",
            "--models-dir",
            str(models),
            env={"GITHUB_ENV": str(github_env), "RUNNER_TEMP": str(tmp_path)},
        )
        assert result.returncode == 0, result.stderr
        exported = github_env.read_text(encoding="utf-8")
        assert "SER_MAX_WORKERS=4" in exported
        assert f"SER_MODELS_DIR={models}" in exported
        assert models.is_dir()

    def test_rejects_unknown_option(self, tmp_path):
        github_env = tmp_path / "github.env"
        github_env.touch()
        result = _run(
            self.SCRIPT,
            "--bogus",
            env={"GITHUB_ENV": str(github_env), "RUNNER_TEMP": str(tmp_path)},
        )
        assert result.returncode == 2
        assert "Unknown option" in result.stderr


class TestRunProfileSmoke:
    SCRIPT = WORKFLOWS / "run_profile_smoke.sh"

    def test_requires_profile(self):
        result = _run(self.SCRIPT)
        assert result.returncode == 2
        assert "Missing required --profile option." in result.stderr

    def test_rejects_unknown_option(self):
        result = _run(self.SCRIPT, "--frozen")
        assert result.returncode == 2
        assert "Unknown option" in result.stderr

    def test_invokes_train_then_predict_with_profile(self, tmp_path):
        """The smoke lane is exactly `--train --profile P` then `--file F --profile P`."""
        log = tmp_path / "calls.log"
        fake = tmp_path / "fake-python"
        fake.write_text(
            "#!/usr/bin/env bash\n"
            f'printf \'%s\\n\' "$*" >> "{log}"\n',
            encoding="utf-8",
        )
        fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
        result = _run(
            self.SCRIPT,
            "--profile",
            "fast",
            "--python",
            str(fake),
            "--sample-file",
            "clip.wav",
            "--extra-arg",
            "--no-transcript",
        )
        assert result.returncode == 0, result.stderr
        calls = log.read_text(encoding="utf-8").splitlines()
        assert calls == [
            "-m ser_tpu --train --profile fast --no-transcript",
            "-m ser_tpu --file clip.wav --profile fast --no-transcript",
        ]

    def test_stops_at_first_failure(self, tmp_path):
        """A failing train must not be followed by a predict call."""
        log = tmp_path / "calls.log"
        fake = tmp_path / "fake-python"
        fake.write_text(
            "#!/usr/bin/env bash\n"
            f'printf \'%s\\n\' "$*" >> "{log}"\n'
            "exit 3\n",
            encoding="utf-8",
        )
        fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
        result = _run(self.SCRIPT, "--profile", "fast", "--python", str(fake))
        assert result.returncode == 3
        assert len(log.read_text(encoding="utf-8").splitlines()) == 1


class TestSmokeTestWheelInstall:
    SCRIPT = WORKFLOWS / "smoke_test_wheel_install.sh"

    def test_exits_2_when_no_wheel_matches(self, tmp_path):
        result = _run(self.SCRIPT, str(tmp_path / "dist" / "*.whl"), cwd=tmp_path)
        assert result.returncode == 2
        assert "No wheels matched" in result.stderr

    def test_installs_offline_only(self):
        """Zero-egress contract: the install must never consult an index."""
        text = self.SCRIPT.read_text(encoding="utf-8")
        assert "--no-index" in text
        assert "--no-deps" in text
        assert "pip install --upgrade" not in text

    @pytest.mark.slow
    def test_full_wheel_build_install_and_import(self, tmp_path):
        """Build the wheel, install it into a fresh venv, import-smoke it."""
        build = subprocess.run(
            [
                "python",
                "-m",
                "pip",
                "wheel",
                str(REPO_ROOT),
                "--no-deps",
                "--no-build-isolation",
                "-w",
                str(tmp_path),
            ],
            capture_output=True,
            text=True,
        )
        assert build.returncode == 0, build.stderr
        result = _run(
            self.SCRIPT,
            str(tmp_path / "*.whl"),
            env={"SER_PKG_SMOKE_DIR": str(tmp_path / ".pkg-smoke")},
            cwd=tmp_path,
        )
        assert result.returncode == 0, result.stderr + result.stdout
        assert "Installed ser-tpu version:" in result.stdout
        assert f"{tmp_path}/.pkg-smoke" in result.stdout  # not the repo checkout
        assert "Alias ser resolves to:" in result.stdout
        assert "Exports:" in result.stdout
