"""Process-level JAX runtime knobs: persistent compilation cache.

TPU-native addition (no reference counterpart): first compiles on TPU cost
tens of seconds (minutes over a remote-compile tunnel), so the framework
enables JAX's on-disk compilation cache under the platform cache root by
default. Disable with ``SER_JAX_CACHE=0`` or point elsewhere with
``SER_JAX_CACHE_DIR``.
"""

from __future__ import annotations

import os

from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

_configured = False


def ensure_compilation_cache() -> None:
    """Idempotently enables the persistent XLA compilation cache."""
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("SER_JAX_CACHE", "1").strip().lower() in ("0", "false", "off"):
        return
    try:
        import jax

        from ser_tpu._internal.config.schema import default_cache_root

        cache_dir = os.environ.get("SER_JAX_CACHE_DIR") or str(default_cache_root() / "jax-cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.debug("JAX compilation cache enabled at %s", cache_dir)
    except Exception as err:  # pragma: no cover - cache is best-effort
        logger.warning("Could not enable JAX compilation cache: %s", err)


__all__ = ["ensure_compilation_cache"]
