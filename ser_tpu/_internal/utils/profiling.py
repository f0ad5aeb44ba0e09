"""Device-level tracing helpers (jax.profiler integration).

Parity surface: SURVEY §5 tracing — the reference has phase-timing logs and a
latency CLI; the TPU equivalent pairs the same phase contract
(``_internal/runtime/phases.py``) with XLA traces viewable in TensorBoard /
Perfetto. Wrap any hot region in :func:`device_trace` and load the output dir
with ``tensorboard --logdir`` or ui.perfetto.dev.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager
from pathlib import Path

from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)


@contextmanager
def device_trace(trace_dir: str | Path) -> Iterator[None]:
    """Captures a jax.profiler trace of the enclosed region."""
    import jax

    target = Path(trace_dir)
    target.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(target))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Device trace written to %s", target)


def annotate(name: str):
    """Named trace annotation for host-side phases inside a device trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


__all__ = ["annotate", "device_trace"]
