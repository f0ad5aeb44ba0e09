"""Per-owner tests for ``utils/common.py`` and ``utils/jax_runtime.py``.

``display_elapsed_time`` mirrors reference ``common_utils.py``; the jax
runtime knobs are the TPU build's own (CLAUDE.md gotcha: plugins pin
``jax_platforms`` at interpreter start, so the env contract needs restoring
in-process).
"""

import jax

from ser_tpu._internal.utils import jax_runtime
from ser_tpu._internal.utils.common import display_elapsed_time


def test_display_elapsed_long_format():
    assert display_elapsed_time(0.5) == "0.50 seconds"
    assert display_elapsed_time(59.994) == "59.99 seconds"
    assert display_elapsed_time(61.2) == "1 min 1 seconds"
    assert display_elapsed_time(3601.0) == "60 min 1 seconds"


def test_display_elapsed_short_format():
    assert display_elapsed_time(0.5, "short") == "0.50s"
    assert display_elapsed_time(61.2, "short") == "1m1s"
    assert display_elapsed_time(125.0, "short") == "2m5s"


def test_honor_platform_env_applies_env_request(monkeypatch):
    # The suite conftest already forces cpu; honoring the same value must be
    # a no-op, and an empty env var must leave the live config untouched.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    jax_runtime.honor_platform_env()
    assert jax.config.jax_platforms == "cpu"
    monkeypatch.setenv("JAX_PLATFORMS", "")
    jax_runtime.honor_platform_env()
    assert jax.config.jax_platforms == "cpu"


def test_ensure_compilation_cache_is_idempotent_and_gateable(monkeypatch):
    # Force a fresh pass through the configure-once latch with caching OFF:
    # the call must return quietly and leave platform honoring intact.
    monkeypatch.setattr(jax_runtime, "_configured", False)
    monkeypatch.setenv("SER_JAX_CACHE", "0")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    jax_runtime.ensure_compilation_cache()
    assert jax_runtime._configured is True
    # Second call: the latch short-circuits (no error, no reconfiguration).
    jax_runtime.ensure_compilation_cache()
    assert jax.config.jax_platforms == "cpu"


def test_ensure_compilation_cache_skips_under_remote_compile(monkeypatch):
    # Remote-compile plugins deposit foreign-machine executables; the cache
    # must stay disabled there (CLAUDE.md gotcha), whatever SER_JAX_CACHE says.
    monkeypatch.setattr(jax_runtime, "_configured", False)
    monkeypatch.setenv("SER_JAX_CACHE", "1")
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    before = jax.config.jax_compilation_cache_dir
    jax_runtime.ensure_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before


def test_ensure_compilation_cache_skips_when_pool_configured(monkeypatch):
    # The plugin's sitecustomize registers off PALLAS_AXON_POOL_IPS alone; a
    # pool-configured process still compiles remotely even with the explicit
    # remote-compile flag unset, so the cache gate must cover it too.
    monkeypatch.setattr(jax_runtime, "_configured", False)
    monkeypatch.setenv("SER_JAX_CACHE", "1")
    monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    before = jax.config.jax_compilation_cache_dir
    jax_runtime.ensure_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before
