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
    # Platform selection is honored UNCONDITIONALLY — coupling it to the
    # cache flag meant SER_JAX_CACHE=0 silently ignored JAX_PLATFORMS=cpu.
    honor_platform_env()
    if os.environ.get("SER_JAX_CACHE", "1").strip().lower() in ("0", "false", "off"):
        return
    try:
        import jax
        # Remote-compile plugins route ALL compiles — including CPU
        # executables — through the remote machine, whose CPU features differ
        # from the host; caching those locally risks SIGILL on replay.
        # Disable the persistent cache entirely there. The plugin registers
        # whenever its pool address is configured (sitecustomize keys off
        # PALLAS_AXON_POOL_IPS), so gate on that too — a pool-configured
        # process with the explicit remote-compile flag unset still compiles
        # remotely and was observed depositing foreign-machine CPU AOT
        # artifacts into the shared cache.
        if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1" or os.environ.get(
            "PALLAS_AXON_POOL_IPS"
        ):
            logger.debug("Remote-compile plugin active; skipping local XLA cache.")
            return

        from ser_tpu._internal.config.schema import default_cache_root

        # Per-platform cache dirs: remote-compile plugins can deposit foreign-
        # machine host executables, so cpu-only processes must not share a dir
        # with accelerator-enabled ones.
        platform_tag = (jax.config.jax_platforms or "default").replace(",", "-")
        cache_dir = os.environ.get("SER_JAX_CACHE_DIR") or str(
            default_cache_root() / f"jax-cache-{platform_tag}"
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.debug("JAX compilation cache enabled at %s", cache_dir)
    except Exception as err:  # pragma: no cover - cache is best-effort
        logger.warning("Could not enable JAX compilation cache: %s", err)


def honor_platform_env() -> None:
    """Re-applies ``JAX_PLATFORMS`` from the environment to the live config.

    Some TPU plugins pin ``jax_platforms`` at interpreter start (before user
    code runs), which silently overrides the conventional env-var contract.
    Calling this before the first backend initialization restores env-var
    control (e.g. ``JAX_PLATFORMS=cpu`` for CPU-only test subprocesses).
    """
    requested = os.environ.get("JAX_PLATFORMS", "").strip()
    if not requested:
        return
    try:
        import jax

        if jax.config.jax_platforms != requested:
            jax.config.update("jax_platforms", requested)
    except Exception as err:  # pragma: no cover
        logger.warning("Could not honor JAX_PLATFORMS=%s: %s", requested, err)


__all__ = ["ensure_compilation_cache", "honor_platform_env"]
