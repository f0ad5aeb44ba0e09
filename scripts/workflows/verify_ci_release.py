"""Gate a release on a successful CI run for the release commit.

Parity surface: reference ``scripts/workflows/verify_ci_release.py`` — same
required environment variables (``GITHUB_REPOSITORY``, ``GITHUB_TOKEN``,
``CI_HEAD_SHA``; ``GITHUB_API_URL`` optional), same query against the
``ci.yml`` workflow-runs endpoint filtered by head SHA, same pass criterion
(at least one run with conclusion ``success``) and the same failure mode
(``SystemExit`` with a readable message — release lanes surface stderr, not
tracebacks).

The HTTP call is injected (``fetch_json``) so the contract is testable in the
zero-egress environment with a stub transport; the default transport is
stdlib ``urllib``.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Callable

_API_VERSION_HEADER = "2022-11-28"


def _env_or_die(name: str, env: dict[str, str]) -> str:
    value = env.get(name)
    if not value:
        raise SystemExit(f"Missing required environment variable: {name}")
    return value


def _default_fetch_json(url: str, token: str) -> dict[str, Any]:
    request = urllib.request.Request(
        url,
        headers={
            "Accept": "application/vnd.github+json",
            "Authorization": f"Bearer {token}",
            "X-GitHub-Api-Version": _API_VERSION_HEADER,
        },
    )
    try:
        with urllib.request.urlopen(request) as response:
            return json.load(response)
    except urllib.error.HTTPError as exc:
        raise SystemExit(f"Failed to query GitHub Actions API: {exc}") from exc


def ci_runs_url(api_url: str, repository: str, head_sha: str) -> str:
    """The workflow-runs query for ci.yml limited to one head commit."""
    query = urllib.parse.urlencode({"head_sha": head_sha, "per_page": 20})
    return f"{api_url}/repos/{repository}/actions/workflows/ci.yml/runs?{query}"


def verify_release(
    env: dict[str, str] | None = None,
    fetch_json: Callable[[str, str], dict[str, Any]] | None = None,
) -> str:
    """Returns a human-readable confirmation line or raises SystemExit."""
    env = dict(os.environ) if env is None else env
    fetch = _default_fetch_json if fetch_json is None else fetch_json

    api_url = env.get("GITHUB_API_URL", "https://api.github.com")
    repository = _env_or_die("GITHUB_REPOSITORY", env)
    token = _env_or_die("GITHUB_TOKEN", env)
    head_sha = _env_or_die("CI_HEAD_SHA", env)

    payload = fetch(ci_runs_url(api_url, repository, head_sha), token)
    for run in payload.get("workflow_runs", []):
        if run.get("conclusion") == "success":
            run_number = run.get("run_number", "unknown")
            return f"CI verified for commit {head_sha} via run #{run_number}."
    raise SystemExit(f"No successful CI workflow run found for commit {head_sha}.")


def main() -> int:
    print(verify_release())
    return 0


if __name__ == "__main__":
    sys.exit(main())
