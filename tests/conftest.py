"""Test harness configuration.

Mirrors the reference test strategy (SURVEY.md §4): markers are derived from
directory layout, and every integration/smoke test gets an ambient-settings
reset. TPU-specific: tests run on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware
(``xla_force_host_platform_device_count``).
"""

import os

# Force CPU with 8 virtual devices for multi-chip sharding tests. The axon TPU
# plugin registers itself at interpreter start (sitecustomize) and pins
# jax_platforms="axon,cpu", so overriding the env var alone is not enough —
# the config must be updated after import, before backends initialize.
os.environ["JAX_PLATFORMS"] = "cpu"

# Isolate the persisted dataset registry: without this, every test run that
# prepares datasets pollutes the developer's global XDG registry with
# tmp-path records.
import tempfile as _tempfile

os.environ.setdefault(
    "SER_DATASET_REGISTRY_ROOT", _tempfile.mkdtemp(prefix="ser-test-registry-")
)

# Isolate every cache-derived path (model cache, whisper download root,
# huggingface/orbax roots): tests that build settings without re-homing the
# cache root must never touch the developer's real ~/.cache/ser tree.
os.environ.setdefault("SER_CACHE_DIR", _tempfile.mkdtemp(prefix="ser-test-cache-"))
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Expected-skip contract (VERDICT r03 weak #6): a green suite must not hide
# unexplained skips. Every skip reason observed during a run must match one
# of these prefixes — a new skip (typo'd import, silently missing dep,
# misconfigured environment) FAILS the session instead of shrinking it.
# ---------------------------------------------------------------------------
_EXPECTED_SKIP_REASON_PREFIXES = (
    # tests/suites/unit/models/test_readiness_resource_findings.py: chmod
    # mode-bit probes are meaningless for euid 0 (root bypasses permission
    # checks); the production code path is still covered by the writable-
    # directory and finding-taxonomy tests that do run.
    "root ignores mode bits",
    # tests/suites/unit/models/test_training_readiness.py: symlink-free
    # platforms (exotic CI filesystems) skip the symlink-escape probes.
    "platform without symlink support",
    # tests/suites/parity/conftest.py: the differential suite needs the
    # reference checkout, absent on public CI runners.
    "reference checkout not available",
    # tests/suites/unit/ops + unit/models/test_word_timing.py: environments
    # without a C++ toolchain skip the native fast-path builds.
    "native toolchain unavailable",
    # pytest.importorskip wording (torch/transformers/jax are baked into
    # THIS image, but the suite must stay runnable where they are not).
    "could not import",
)

_OBSERVED_SKIPS: list[tuple[str, str]] = []


def _record_skip(report) -> None:
    reason = ""
    if isinstance(report.longrepr, tuple):
        reason = str(report.longrepr[2])
    elif report.longrepr is not None:
        reason = str(report.longrepr)
    reason = reason.removeprefix("Skipped: ")
    _OBSERVED_SKIPS.append((report.nodeid, reason))


def pytest_runtest_logreport(report):
    if report.skipped and not hasattr(report, "wasxfail"):
        _record_skip(report)


def pytest_collectreport(report):
    # Collection-time skips (module-level pytest.importorskip /
    # pytest.skip(allow_module_level=True)) never reach
    # pytest_runtest_logreport — exactly the silently-missing-dependency
    # case the contract exists to catch — so they go through the same gate.
    if report.skipped:
        _record_skip(report)


def _unexpected_skips() -> list[tuple[str, str]]:
    return [
        (nodeid, reason)
        for nodeid, reason in _OBSERVED_SKIPS
        if not any(reason.startswith(prefix) for prefix in _EXPECTED_SKIP_REASON_PREFIXES)
    ]


def pytest_sessionfinish(session, exitstatus):
    # No raise here: an exception in sessionfinish would abort the OTHER
    # sessionfinish hookimpls (terminal summary, junitxml, cacheprovider).
    # Flipping exitstatus is enough — wrap_session reads it afterwards.
    if _unexpected_skips() and session.exitstatus == 0:
        session.exitstatus = 1


def pytest_terminal_summary(terminalreporter):
    unexpected = _unexpected_skips()
    if unexpected:
        terminalreporter.section("unexpected skips", sep="=", red=True)
        terminalreporter.write_line(
            "Unexpected skip reasons (extend the expected-skip contract in "
            "tests/conftest.py deliberately, or fix the skip):"
        )
        for nodeid, reason in unexpected:
            terminalreporter.write_line(f"  {nodeid}: {reason!r}")


def _enable_persistent_compile_cache() -> None:
    """Caches XLA compilations on disk so reruns skip the expensive compiles.

    Skipped under remote-compile plugins: they compile even CPU executables on
    a foreign machine, and caching those locally risks SIGILL on replay.
    """
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1" or os.environ.get(
        "PALLAS_AXON_POOL_IPS"
    ):
        return
    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_persistent_compile_cache()

_SUITE_MARKERS = ("unit", "integration", "smoke")


def pytest_collection_modifyitems(config, items):
    """Applies suite markers from directory layout (reference tests/conftest.py:29-60)."""
    for item in items:
        path = str(item.fspath)
        for marker in _SUITE_MARKERS:
            if f"/suites/{marker}/" in path:
                item.add_marker(getattr(pytest.mark, marker))


@pytest.fixture
def reset_ambient_settings():
    """Reloads ambient settings before and after one test."""
    from ser_tpu.config import reload_settings

    reload_settings()
    yield
    reload_settings()


@pytest.fixture(autouse=True)
def _reset_for_integration(request):
    """Auto-applies ambient settings reset for integration/smoke suites."""
    path = str(request.node.fspath)
    if "/suites/integration/" in path or "/suites/smoke/" in path:
        request.getfixturevalue("reset_ambient_settings")
    yield


@pytest.fixture(autouse=True)
def _isolated_dataset_registry(tmp_path, monkeypatch):
    """Every test reads/writes its dataset registry under its own tmp dir.

    Two isolation layers, both needed:
    - the env var: settings captured during a test (reload_settings /
      capture_settings_inputs) resolve registry_root from it, and SUBPROCESS
      tests (smoke CLI) inherit os.environ — with only the session-shared
      default, a unit test registering a bogus record poisoned the smoke
      CLI's readiness registry check;
    - the symbol patch: settings built from explicit env dicts bypass the
      ambient env var and fall back to default_data_root().
    """
    from ser_tpu._internal.data import registry as _registry

    monkeypatch.setenv("SER_DATASET_REGISTRY_ROOT", str(tmp_path / "registry-root"))
    monkeypatch.setattr(
        _registry, "default_data_root", lambda: tmp_path / "registry-root"
    )
