"""Per-owner tests for ``_internal/utils/profiling.py`` (device tracing)."""

from __future__ import annotations

import jax.numpy as jnp

from ser_tpu._internal.utils.profiling import annotate, device_trace


def test_device_trace_writes_profile_artifacts(tmp_path):
    target = tmp_path / "trace"
    with device_trace(target):
        with annotate("unit-test-region"):
            jnp.sum(jnp.arange(128.0)).block_until_ready()
    written = list(target.rglob("*"))
    assert any(item.is_file() for item in written), written


def test_device_trace_stops_on_exception(tmp_path):
    # A crashed region must still close the profiler session so a later
    # trace can start (start_trace raises if one is already active).
    try:
        with device_trace(tmp_path / "first"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    with device_trace(tmp_path / "second"):
        jnp.zeros(8).block_until_ready()
    assert (tmp_path / "second").exists()
