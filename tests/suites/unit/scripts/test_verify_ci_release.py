"""Contract for the release CI-verification gate.

Parity surface: reference ``scripts/workflows/verify_ci_release.py`` — the
required env vars, the ci.yml workflow-runs query, the success criterion and
the SystemExit failure mode. The transport is injected so the contract runs
in the zero-egress environment.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[4]
SCRIPT = REPO_ROOT / "scripts" / "workflows" / "verify_ci_release.py"

spec = importlib.util.spec_from_file_location("verify_ci_release", SCRIPT)
verify_ci_release = importlib.util.module_from_spec(spec)
sys.modules.setdefault("verify_ci_release", verify_ci_release)
spec.loader.exec_module(verify_ci_release)

BASE_ENV = {
    "GITHUB_REPOSITORY": "example/ser-tpu",
    "GITHUB_TOKEN": "tok",
    "CI_HEAD_SHA": "abc123",
}


@pytest.mark.parametrize("missing", sorted(BASE_ENV))
def test_missing_required_env_fails_with_named_variable(missing):
    env = {k: v for k, v in BASE_ENV.items() if k != missing}
    with pytest.raises(SystemExit, match=missing):
        verify_ci_release.verify_release(env=env, fetch_json=lambda url, token: {})


def test_queries_ci_workflow_runs_for_the_head_sha():
    seen = {}

    def fetch(url, token):
        seen["url"] = url
        seen["token"] = token
        return {"workflow_runs": [{"conclusion": "success", "run_number": 7}]}

    message = verify_ci_release.verify_release(env=dict(BASE_ENV), fetch_json=fetch)
    assert seen["token"] == "tok"
    assert "/repos/example/ser-tpu/actions/workflows/ci.yml/runs?" in seen["url"]
    assert "head_sha=abc123" in seen["url"]
    assert seen["url"].startswith("https://api.github.com/")
    assert message == "CI verified for commit abc123 via run #7."


def test_honors_github_api_url_override():
    seen = {}

    def fetch(url, token):
        seen["url"] = url
        return {"workflow_runs": [{"conclusion": "success"}]}

    env = dict(BASE_ENV, GITHUB_API_URL="https://ghe.example.com/api/v3")
    message = verify_ci_release.verify_release(env=env, fetch_json=fetch)
    assert seen["url"].startswith("https://ghe.example.com/api/v3/repos/")
    assert message == "CI verified for commit abc123 via run #unknown."


@pytest.mark.parametrize(
    "payload",
    [
        {},
        {"workflow_runs": []},
        {"workflow_runs": [{"conclusion": "failure"}, {"conclusion": None}]},
    ],
)
def test_no_successful_run_fails_the_gate(payload):
    with pytest.raises(SystemExit, match="No successful CI workflow run found for commit abc123"):
        verify_ci_release.verify_release(env=dict(BASE_ENV), fetch_json=lambda u, t: payload)


def test_first_successful_run_wins_over_later_entries():
    payload = {
        "workflow_runs": [
            {"conclusion": "failure", "run_number": 1},
            {"conclusion": "success", "run_number": 2},
            {"conclusion": "success", "run_number": 3},
        ]
    }
    message = verify_ci_release.verify_release(env=dict(BASE_ENV), fetch_json=lambda u, t: payload)
    assert message.endswith("via run #2.")
