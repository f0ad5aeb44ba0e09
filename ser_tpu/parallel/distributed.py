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

from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

_initialized = False


def is_multi_host_env() -> bool:
    """Heuristic: explicit SER_DIST_* config or Cloud-TPU pod env present."""
    if os.environ.get("SER_DIST_COORDINATOR"):
        return True
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES", "").strip().count(","))


def initialize_distributed(*, force: bool = False) -> bool:
    """Initializes jax.distributed for multi-host execution when configured.

    Returns True when initialization ran. Safe to call unconditionally:
    single-host environments are a no-op.
    """
    global _initialized
    if _initialized:
        return True
    if not force and not is_multi_host_env():
        return False
    import jax

    kwargs = {}
    coordinator = os.environ.get("SER_DIST_COORDINATOR")
    if coordinator:
        kwargs["coordinator_address"] = coordinator
        kwargs["num_processes"] = int(os.environ["SER_DIST_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["SER_DIST_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d",
        jax.process_index(),
        jax.process_count(),
    )
    return True


__all__ = ["initialize_distributed", "is_multi_host_env"]
