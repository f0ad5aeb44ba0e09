"""Multi-host (multi-slice) runtime initialization.

The DCN leg of the distributed backend (SURVEY §2.10: collectives ride ICI
intra-slice and DCN across slices). Single-host multi-chip needs no
initialization; multi-host pods call :func:`initialize_distributed` once per
process before any mesh construction, driven by the standard TPU pod env
(``jax.distributed.initialize`` auto-detects coordinator/process ids on Cloud
TPU) or explicit ``SER_DIST_*`` overrides.
"""

from __future__ import annotations

import os
import threading

from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

_initialized = False
_INIT_LOCK = threading.Lock()


def is_multi_host_env(env: dict[str, str] | None = None) -> bool:
    """Heuristic: explicit SER_DIST_* config or Cloud-TPU pod env present."""
    env = env if env is not None else dict(os.environ)
    if env.get("SER_DIST_COORDINATOR"):
        return True
    return bool(env.get("TPU_WORKER_HOSTNAMES", "").strip().count(","))


def resolve_distributed_kwargs(env: dict[str, str] | None = None) -> dict:
    """Pure ``SER_DIST_*`` → ``jax.distributed.initialize`` kwargs.

    Explicit overrides require the full triple (coordinator, process count,
    process id); a partial set is a configuration error, not a silent
    auto-detect fallback. Empty dict = rely on Cloud-TPU auto-detection.
    """
    env = env if env is not None else dict(os.environ)
    coordinator = env.get("SER_DIST_COORDINATOR", "").strip()
    if not coordinator:
        return {}
    missing = [
        name
        for name in ("SER_DIST_NUM_PROCESSES", "SER_DIST_PROCESS_ID")
        if not env.get(name, "").strip()
    ]
    if missing:
        raise ValueError(
            f"SER_DIST_COORDINATOR is set but {', '.join(missing)} is missing; "
            "explicit multi-host config needs all three variables."
        )
    try:
        num_processes = int(env["SER_DIST_NUM_PROCESSES"])
        process_id = int(env["SER_DIST_PROCESS_ID"])
    except ValueError as err:
        raise ValueError("SER_DIST_NUM_PROCESSES / SER_DIST_PROCESS_ID must be integers.") from err
    if num_processes < 1 or not 0 <= process_id < num_processes:
        raise ValueError(
            f"Invalid process topology: id {process_id} of {num_processes} processes."
        )
    return {
        "coordinator_address": coordinator,
        "num_processes": num_processes,
        "process_id": process_id,
    }


def initialize_distributed(*, force: bool = False) -> bool:
    """Initializes jax.distributed for multi-host execution when configured.

    Returns True when the runtime is (now) initialized. Safe to call
    unconditionally — single-host environments are a no-op — and idempotent
    under concurrency AND against external initialization: a lock serializes
    racing callers, and an already-initialized jax.distributed (someone
    called it directly) is adopted as success rather than re-raised.
    """
    global _initialized
    with _INIT_LOCK:
        if _initialized:
            return True
        if not force and not is_multi_host_env():
            return False
        import jax

        try:
            jax.distributed.initialize(**resolve_distributed_kwargs())
        except RuntimeError as err:
            if "already initialized" not in str(err).lower():
                raise
            logger.debug("jax.distributed already initialized externally; adopting.")
        _initialized = True
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return True


__all__ = ["initialize_distributed", "is_multi_host_env", "resolve_distributed_kwargs"]
