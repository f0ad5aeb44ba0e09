"""Unit coverage for the CLI-smoke subprocess environment scrubber.

A child process inheriting the remote-compile TPU plugin (sitecustomize on
``PYTHONPATH`` + ``PALLAS_AXON_*``) or the harness's 8-virtual-device
``XLA_FLAGS`` is minutes-per-compile slow; ``local_cpu_env`` must strip both
while leaving unrelated environment intact.
"""

import os
import sys
from pathlib import Path

HELPERS = Path(__file__).resolve().parents[3] / "utils" / "helpers"
sys.path.insert(0, str(HELPERS))
from subprocess_env import local_cpu_env  # noqa: E402


def test_scrubs_axon_plugin_and_virtual_devices():
    base = {
        "PALLAS_AXON_REMOTE_COMPILE": "1",
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "AXON_LOOPBACK_RELAY": "1",
        "PYTHONPATH": os.pathsep.join(["/root/.axon_site", "/keep/me"]),
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8 --xla_cpu_foo=1",
        "JAX_PLATFORMS": "axon",
        "HOME": "/root",
    }
    env = local_cpu_env(base)
    assert not any(k.startswith(("PALLAS_AXON", "AXON_")) for k in env)
    assert env["PYTHONPATH"] == "/keep/me"
    assert "device_count" not in env["XLA_FLAGS"]
    assert env["XLA_FLAGS"] == "--xla_cpu_foo=1"
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["HOME"] == "/root"
    assert base["JAX_PLATFORMS"] == "axon"  # input mapping untouched


def test_empty_leftovers_are_removed_not_blanked():
    base = {
        "PYTHONPATH": "/root/.axon_site",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    env = local_cpu_env(base)
    assert "PYTHONPATH" not in env
    assert "XLA_FLAGS" not in env


def test_defaults_to_ambient_environ(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
    monkeypatch.setenv("SER_SOME_KNOB", "kept")
    env = local_cpu_env()
    assert "PALLAS_AXON_REMOTE_COMPILE" not in env
    assert env["SER_SOME_KNOB"] == "kept"
