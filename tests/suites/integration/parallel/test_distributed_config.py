"""SER_DIST_* parsing, multi-host detection, and init idempotence."""

import pytest

from ser_tpu.parallel import distributed


def test_single_host_env_is_not_multi_host():
    assert not distributed.is_multi_host_env({})
    assert not distributed.is_multi_host_env({"TPU_WORKER_HOSTNAMES": "host0"})


def test_pod_env_and_explicit_config_detected():
    assert distributed.is_multi_host_env({"TPU_WORKER_HOSTNAMES": "host0,host1"})
    assert distributed.is_multi_host_env({"SER_DIST_COORDINATOR": "10.0.0.1:8476"})


def test_explicit_kwargs_parse_fully():
    kwargs = distributed.resolve_distributed_kwargs(
        {
            "SER_DIST_COORDINATOR": "10.0.0.1:8476",
            "SER_DIST_NUM_PROCESSES": "4",
            "SER_DIST_PROCESS_ID": "2",
        }
    )
    assert kwargs == {
        "coordinator_address": "10.0.0.1:8476",
        "num_processes": 4,
        "process_id": 2,
    }


def test_auto_detect_when_no_override():
    assert distributed.resolve_distributed_kwargs({}) == {}


def test_partial_override_is_a_config_error():
    with pytest.raises(ValueError, match="SER_DIST_PROCESS_ID"):
        distributed.resolve_distributed_kwargs(
            {"SER_DIST_COORDINATOR": "c:1", "SER_DIST_NUM_PROCESSES": "2"}
        )


def test_non_integer_and_bad_topology_rejected():
    base = {"SER_DIST_COORDINATOR": "c:1", "SER_DIST_NUM_PROCESSES": "2"}
    with pytest.raises(ValueError, match="integers"):
        distributed.resolve_distributed_kwargs({**base, "SER_DIST_PROCESS_ID": "two"})
    with pytest.raises(ValueError, match="topology"):
        distributed.resolve_distributed_kwargs({**base, "SER_DIST_PROCESS_ID": "5"})


def test_initialize_is_idempotent(monkeypatch):
    calls = []

    class FakeDistributed:
        @staticmethod
        def initialize(**kwargs):
            calls.append(kwargs)

    import jax

    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    monkeypatch.setattr(jax, "process_index", lambda: 0, raising=False)
    monkeypatch.setattr(jax, "process_count", lambda: 1, raising=False)
    monkeypatch.setattr(distributed, "_initialized", False)
    monkeypatch.setenv("SER_DIST_COORDINATOR", "")

    assert not distributed.initialize_distributed()  # single host: no-op
    assert calls == []
    assert distributed.initialize_distributed(force=True)
    assert distributed.initialize_distributed(force=True)  # second call: cached
    assert len(calls) == 1
