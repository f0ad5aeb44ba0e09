"""Architecture contract: the CI change-scope classifier.

Parity surface: reference ``tests/suites/integration/architecture/
test_ci_change_classifier.py`` + ``scripts/ci_classify_changes.sh`` — the
classifier appends ``run_full`` / ``docs_only`` / ``reason`` to the GitHub
output file, always runs full CI for non-PR events, skips heavy tiers only
for documentation-only pull requests, and exits 2 when its required
environment is missing. Exercised against throwaway fixture git repos.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[4]
CLASSIFIER = REPO_ROOT / "scripts" / "ci_classify_changes.sh"


def _git(repo: Path, *args: str) -> str:
    result = subprocess.run(
        ["git", *args], cwd=repo, capture_output=True, text=True, check=True
    )
    return result.stdout.strip()


def _commit_all(repo: Path, message: str) -> str:
    _git(repo, "add", "-A")
    _git(repo, "commit", "-m", message, "--quiet")
    return _git(repo, "rev-parse", "HEAD")


@pytest.fixture()
def fixture_repo(tmp_path: Path) -> Path:
    repo = tmp_path / "fixture"
    repo.mkdir()
    _git(repo, "init", "--quiet")
    _git(repo, "config", "user.email", "contracts@example.invalid")
    _git(repo, "config", "user.name", "Contracts")
    (repo / "README.md").write_text("initial\n", encoding="utf-8")
    _commit_all(repo, "initial")
    return repo


def _classify(
    repo: Path,
    tmp_path: Path,
    *,
    event: str,
    base: str = "",
    head: str = "",
) -> tuple[int, dict[str, str], str]:
    output_file = tmp_path / "github_output"
    output_file.touch()
    env = {
        "PATH": "/usr/bin:/bin",
        "CI_EVENT_NAME": event,
        "CI_BASE_SHA": base,
        "CI_HEAD_SHA": head,
    }
    result = subprocess.run(
        ["bash", str(CLASSIFIER), str(output_file)],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
    )
    outputs = dict(
        line.split("=", 1)
        for line in output_file.read_text(encoding="utf-8").splitlines()
        if "=" in line
    )
    return result.returncode, outputs, result.stderr


def test_non_pull_request_events_run_full_ci(fixture_repo: Path, tmp_path: Path) -> None:
    code, outputs, _ = _classify(fixture_repo, tmp_path, event="push")
    assert code == 0
    assert outputs == {
        "run_full": "true",
        "docs_only": "false",
        "reason": "non_pull_request",
    }


def test_missing_event_name_exits_two(fixture_repo: Path, tmp_path: Path) -> None:
    code, _, stderr = _classify(fixture_repo, tmp_path, event="")
    assert code == 2
    assert "CI_EVENT_NAME" in stderr


def test_missing_shas_exit_two(fixture_repo: Path, tmp_path: Path) -> None:
    code, _, stderr = _classify(fixture_repo, tmp_path, event="pull_request")
    assert code == 2
    assert "CI_BASE_SHA" in stderr


def test_docs_only_pull_request_skips_heavy_tiers(
    fixture_repo: Path, tmp_path: Path
) -> None:
    base = _git(fixture_repo, "rev-parse", "HEAD")
    docs = fixture_repo / "docs"
    docs.mkdir()
    (docs / "guide.md").write_text("docs change\n", encoding="utf-8")
    head = _commit_all(fixture_repo, "docs only")
    code, outputs, _ = _classify(
        fixture_repo, tmp_path, event="pull_request", base=base, head=head
    )
    assert code == 0
    assert outputs == {
        "run_full": "false",
        "docs_only": "true",
        "reason": "docs_only_pull_request",
    }


def test_source_pull_request_requires_full_ci(
    fixture_repo: Path, tmp_path: Path
) -> None:
    base = _git(fixture_repo, "rev-parse", "HEAD")
    source = fixture_repo / "ser_tpu"
    source.mkdir()
    (source / "module.py").write_text("VALUE = 1\n", encoding="utf-8")
    head = _commit_all(fixture_repo, "source change")
    code, outputs, _ = _classify(
        fixture_repo, tmp_path, event="pull_request", base=base, head=head
    )
    assert code == 0
    assert outputs == {
        "run_full": "true",
        "docs_only": "false",
        "reason": "full_ci_required",
    }


def test_mixed_docs_and_bench_artifact_changes_stay_docs_only(
    fixture_repo: Path, tmp_path: Path
) -> None:
    """Recorded bench/eval artifacts are documentation, not runtime code."""
    base = _git(fixture_repo, "rev-parse", "HEAD")
    (fixture_repo / "BENCH_r03.json").write_text("{}\n", encoding="utf-8")
    (fixture_repo / "notes.md").write_text("notes\n", encoding="utf-8")
    head = _commit_all(fixture_repo, "artifacts")
    code, outputs, _ = _classify(
        fixture_repo, tmp_path, event="pull_request", base=base, head=head
    )
    assert code == 0
    assert outputs["docs_only"] == "true"


def test_empty_diff_runs_full_ci(fixture_repo: Path, tmp_path: Path) -> None:
    head = _git(fixture_repo, "rev-parse", "HEAD")
    code, outputs, _ = _classify(
        fixture_repo, tmp_path, event="pull_request", base=head, head=head
    )
    assert code == 0
    assert outputs["reason"] == "empty_diff"
    assert outputs["run_full"] == "true"


def test_classifier_is_wired_into_default_ci() -> None:
    """The default CI workflow consults the classifier before heavy tiers."""
    workflow = (REPO_ROOT / ".github" / "workflows" / "ci.yml").read_text(
        encoding="utf-8"
    )
    assert "scripts/ci_classify_changes.sh" in workflow
    assert "run_full" in workflow
