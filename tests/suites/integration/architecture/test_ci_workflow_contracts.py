"""CI workflow contracts (reference test strategy: CI workflow contract tests).

Pins that the committed workflow files stay parseable and keep the job graph
the docs promise; a broken lane should fail here, not on the forge.
"""

from pathlib import Path

import yaml

WORKFLOWS = Path(__file__).resolve().parents[4] / ".github" / "workflows"


def _load(name: str) -> dict:
    payload = yaml.safe_load((WORKFLOWS / name).read_text(encoding="utf-8"))
    assert isinstance(payload, dict)
    return payload


def test_ci_workflow_job_graph():
    ci = _load("ci.yml")
    jobs = ci["jobs"]
    assert set(jobs) == {"classify", "code-quality", "tests", "contract-gates", "build"}
    assert jobs["tests"]["needs"] == ["classify", "code-quality"]
    # Heavy tiers are gated on the change classifier (docs-only PRs skip).
    assert jobs["tests"]["if"] == "needs.classify.outputs.run_full == 'true'"
    assert set(jobs["build"]["needs"]) == {"tests", "contract-gates"}
    # The test lane must force the CPU backend with the virtual mesh.
    assert ci["env"]["JAX_PLATFORMS"] == "cpu"
    assert "host_platform_device_count=8" in ci["env"]["XLA_FLAGS"]


def test_ci_runs_the_real_gates():
    ci = _load("ci.yml")
    rendered = (WORKFLOWS / "ci.yml").read_text(encoding="utf-8")
    assert "check_public_internal_imports.py" in rendered
    assert "pytest tests/" in rendered
    assert "dryrun_multichip(8)" in rendered
    assert ci["jobs"]["tests"]["strategy"]["matrix"]["python-version"] == ["3.12", "3.13"]


def test_tpu_validation_lane_targets_self_hosted_tpu():
    tpu = _load("tpu-validation.yml")
    for job in tpu["jobs"].values():
        assert job["runs-on"] == ["self-hosted", "tpu"]
    rendered = (WORKFLOWS / "tpu-validation.yml").read_text(encoding="utf-8")
    assert "bench.py" in rendered
    assert "gate --candidate" in rendered


def test_publish_workflow_gates_before_upload():
    """Release publish parity (reference python-publish[-testpypi].yml).

    CI verification of the release commit must precede the build; the build
    must twine-check and wheel-smoke before any upload; uploads use OIDC
    (id-token) with prereleases routed to TestPyPI and releases to PyPI.
    """
    publish = _load("python-publish.yml")
    jobs = publish["jobs"]
    assert set(jobs) == {"verify-ci", "build", "publish-testpypi", "publish-pypi"}
    assert jobs["build"]["needs"] == "verify-ci"
    assert jobs["publish-pypi"]["needs"] == "build"
    assert jobs["publish-testpypi"]["needs"] == "build"
    assert "prerelease == true" in jobs["publish-testpypi"]["if"]
    assert "prerelease == false" in jobs["publish-pypi"]["if"]
    for job in ("publish-testpypi", "publish-pypi"):
        assert jobs[job]["permissions"] == {"id-token": "write"}
    rendered = (WORKFLOWS / "python-publish.yml").read_text(encoding="utf-8")
    assert "verify_ci_release.py" in rendered
    assert "twine check --strict" in rendered
    assert "smoke_test_wheel_install.sh" in rendered


def test_codeql_workflow_analyzes_python():
    """Security-scan parity (reference codeql.yml): code-touching PRs, main
    pushes, a weekly schedule, and security-events write permission."""
    codeql = _load("codeql.yml")
    triggers = codeql[True] if True in codeql else codeql["on"]
    assert "push" in triggers and "schedule" in triggers
    assert "ser_tpu/**" in triggers["pull_request"]["paths"]
    assert codeql["permissions"]["security-events"] == "write"
    rendered = (WORKFLOWS / "codeql.yml").read_text(encoding="utf-8")
    assert "github/codeql-action/init" in rendered
    assert "languages: python" in rendered


def test_scorecard_workflow_is_scheduled_advisory():
    """Reference scorecard.yml: weekly scheduled advisory, SARIF archived,
    no credential persistence on checkout."""
    scorecard = _load("scorecard.yml")
    triggers = scorecard[True] if True in scorecard else scorecard["on"]
    assert "schedule" in triggers and "workflow_dispatch" in triggers
    assert scorecard["permissions"] == {"contents": "read"}
    rendered = (WORKFLOWS / "scorecard.yml").read_text(encoding="utf-8")
    assert "ossf/scorecard-action" in rendered
    assert "persist-credentials: false" in rendered
    assert "results_format: sarif" in rendered


def test_dependency_review_workflow_targets_manifests():
    """Reference dependency-review.yml: manifest/workflow PRs, advisory
    (continue-on-error), critical severity floor."""
    review = _load("dependency-review.yml")
    triggers = review[True] if True in review else review["on"]
    assert "pyproject.toml" in triggers["pull_request"]["paths"]
    job = review["jobs"]["dependency-review"]
    steps = {step.get("name"): step for step in job["steps"]}
    advisory = steps["Run dependency review advisory"]
    assert advisory["continue-on-error"] is True
    assert advisory["with"]["fail-on-severity"] == "critical"


def test_full_dataset_gate_workflow_runs_the_gate_script():
    """Reference full-dataset-quality-gate-regression.yml: dispatchable +
    scheduled lane invoking scripts/run_full_dataset_quality_gate.sh with
    the SER_FULL_GATE_* knob surface and an archived report."""
    gate = _load("full-dataset-quality-gate.yml")
    triggers = gate[True] if True in gate else gate["on"]
    assert "workflow_dispatch" in triggers and "schedule" in triggers
    inputs = triggers["workflow_dispatch"]["inputs"]
    assert {"candidate", "run_training", "require_pass", "folds"} <= set(inputs)
    rendered = (WORKFLOWS / "full-dataset-quality-gate.yml").read_text(encoding="utf-8")
    assert "run_full_dataset_quality_gate.sh" in rendered
    assert "SER_FULL_GATE_CANDIDATE" in rendered
    assert "build_synthetic_ravdess_dataset.py" in rendered
    assert gate["env"]["JAX_PLATFORMS"] == "cpu"
