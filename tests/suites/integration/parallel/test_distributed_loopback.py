"""Two-process jax.distributed loopback: the live multi-host init path.

Spawns two CPU processes that coordinate over 127.0.0.1 through
``initialize_distributed`` (the SER_DIST_* path), build the global device
view, and run one real cross-process collective. This is the executable
counterpart to the pure config-parsing tests — proof the DCN leg initializes
and communicates, not just parses.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

_WORKER = textwrap.dedent(
    """
    import os, sys

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon plugin pins platforms via env alone

    from ser_tpu.parallel.distributed import initialize_distributed, is_multi_host_env

    assert is_multi_host_env(), "SER_DIST_* env must mark this process multi-host"
    assert initialize_distributed() is True

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    # 2 processes x 1 local CPU device = 2 global devices.
    assert jax.device_count() == 2, jax.device_count()

    # One real cross-process collective: allgather of per-process payloads.
    rank = jax.process_index()
    gathered = multihost_utils.process_allgather(jnp.array([float(rank + 1)]))
    assert gathered.ravel().tolist() == [1.0, 2.0], gathered

    print(f"OK rank={rank}")
    """
)


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def test_two_process_loopback_initializes_and_allgathers(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    processes = []
    for rank in range(2):
        env = dict(
            os.environ,
            SER_DIST_COORDINATOR=f"127.0.0.1:{port}",
            SER_DIST_NUM_PROCESSES="2",
            SER_DIST_PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
        )
        # One local CPU device per process — the distributed topology, not
        # the 8-device single-process mesh the rest of the suite uses.
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = str(Path(__file__).resolve().parents[4])
        processes.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outputs = []
    try:
        for proc in processes:
            stdout, stderr = proc.communicate(timeout=150)
            outputs.append((proc.returncode, stdout, stderr))
    finally:
        for proc in processes:
            if proc.poll() is None:
                proc.kill()
    for rank, (code, stdout, stderr) in enumerate(outputs):
        assert code == 0, f"rank {rank} failed:\n{stdout}\n{stderr}"
        assert f"OK rank={rank}" in stdout
