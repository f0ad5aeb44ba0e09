"""CLI transcript-lane smoke: staged Whisper assets drive the FULL flow.

The other CLI smokes run ``--no-transcript``; this module stages a tiny
synthetic HF Whisper checkpoint (the builder from the integration suite) as
the configured transcription model and exercises the production path the
reference ships by default: fast inference + transcription + subtitle
rendering + persisted transcript, through real subprocesses.
"""

import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[3] / "scripts"
TRANSCRIPT_SUITE = (
    Path(__file__).resolve().parents[1] / "integration" / "transcript"
)
HELPERS = Path(__file__).resolve().parents[3] / "tests" / "utils" / "helpers"
sys.path.insert(0, str(SCRIPTS))
sys.path.insert(0, str(TRANSCRIPT_SUITE))
sys.path.insert(0, str(HELPERS))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402
from subprocess_env import local_cpu_env  # noqa: E402
from test_whisper_checkpoint_loading import build_whisper_checkpoint  # noqa: E402


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_transcript")
    build_dataset(root / "dataset", actors=2, repetitions=2, seconds=3.2)
    build_whisper_checkpoint(root / "cache" / "OpenAI" / "whisper" / "test-tiny")
    # local_cpu_env scrubs the remote-compile TPU plugin so CLI subprocesses
    # compile locally regardless of tunnel state.
    env = local_cpu_env()
    env.update(
        SER_DATASET_FOLDER=str(root / "dataset"),
        SER_MODELS_FOLDER=str(root / "models"),
        SER_TRANSCRIPTS_FOLDER=str(root / "transcripts"),
        SER_TMP_FOLDER=str(root / "tmp"),
        SER_MODEL_CACHE_DIR=str(root / "cache"),
        WHISPER_MODEL="test-tiny",
    )
    result = _run(["--train"], env)
    assert result.returncode == 0, result.stderr
    return root, env


def _run(args, env, timeout=900):
    return subprocess.run(
        [sys.executable, "-m", "ser_tpu", *args],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_infer_with_transcription_and_subtitles(env):
    root, env_vars = env
    clip = next((root / "dataset" / "Actor_01").glob("03-01-05*.wav"))
    subtitle_path = root / "out" / "clip.srt"
    result = _run(
        [
            "--file",
            str(clip),
            "--profile",
            "fast",
            "--save_transcript",
            "--subtitle-path",
            str(subtitle_path),
            "--subtitle-format",
            "srt",
        ],
        env_vars,
    )
    assert result.returncode == 0, result.stderr
    # Subtitle file rendered at the requested path in the requested format.
    assert subtitle_path.is_file(), result.stdout
    rendered = subtitle_path.read_text(encoding="utf-8-sig")
    assert rendered.strip(), "empty subtitle render"
    assert rendered.lstrip().startswith("1"), rendered[:80]  # srt cue numbering
    assert "-->" in rendered
    # Transcript persisted under SER_TRANSCRIPTS_FOLDER.
    saved = list((root / "transcripts").rglob("*"))
    assert any(path.is_file() for path in saved), result.stdout


@pytest.mark.slow
def test_infer_subtitle_format_vtt(env):
    root, env_vars = env
    clip = next((root / "dataset" / "Actor_02").glob("03-01-03*.wav"))
    subtitle_path = root / "out" / "clip.vtt"
    result = _run(
        [
            "--file",
            str(clip),
            "--subtitle-path",
            str(subtitle_path),
            "--subtitle-format",
            "vtt",
        ],
        env_vars,
    )
    assert result.returncode == 0, result.stderr
    assert subtitle_path.is_file()
    assert subtitle_path.read_text(encoding="utf-8-sig").lstrip().startswith("WEBVTT")
