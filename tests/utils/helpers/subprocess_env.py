"""Local-CPU environment builder for CLI subprocess tests.

Two inherited knobs make CLI subprocesses pathologically slow and MUST be
scrubbed:

- The axon TPU plugin registers in every python process via a sitecustomize
  hook on ``PYTHONPATH`` and, when ``PALLAS_AXON_REMOTE_COMPILE=1``, routes
  ALL XLA compiles — including CPU executables — through the remote tunnel:
  minutes per compile, a hang when the tunnel is down.
- The pytest harness exports
  ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` for the virtual
  sharding mesh. A child inheriting it splits the host's compute threads
  across 8 virtual devices; the medium readiness smoke's one 3-second encode
  measured >300 s with the flag vs ~12 s without.

CLI smoke subprocesses exercise workflows, not sharding, so they get one
local CPU device with full threads.
"""

from __future__ import annotations

import os
import re


def local_cpu_env(base: dict | None = None) -> dict:
    """Copy of the environment scrubbed down to a plain local-CPU child.

    Removes the axon sitecustomize hook from ``PYTHONPATH``, drops every
    ``PALLAS_AXON_*``/``AXON_*`` knob, strips the virtual-device-count XLA
    flag, and pins ``JAX_PLATFORMS=cpu`` — so the child is a single-device
    local-CPU JAX process regardless of tunnel state or harness flags.
    """
    env = dict(os.environ if base is None else base)
    for key in [k for k in env if k.startswith(("PALLAS_AXON", "AXON_"))]:
        env.pop(key)
    pythonpath = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in os.path.basename(os.path.normpath(p)).lower()
    ]
    if pythonpath:
        env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    else:
        env.pop("PYTHONPATH", None)
    xla_flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    if xla_flags:
        env["XLA_FLAGS"] = xla_flags
    else:
        env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


__all__ = ["local_cpu_env"]
