"""Typed runtime-environment deltas applied around workflows.

Parity surface: reference ``ser/_internal/runtime/environment_plan.py:72-101``
+ ``process_env.py:12-30`` — a typed plan of env-var deltas (model cache
roots, runtime knobs) applied for the workflow scope and restored afterwards.
The torch/MPS-specific entries become JAX/HF cache entries.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager
from dataclasses import dataclass, field
import os

from ser_tpu._internal.config.schema import AppConfig


@dataclass(frozen=True)
class RuntimeEnvironmentPlan:
    """Environment variable deltas for one workflow execution."""

    set_vars: dict[str, str] = field(default_factory=dict)
    unset_vars: tuple[str, ...] = ()


def build_runtime_environment_plan(settings: AppConfig) -> RuntimeEnvironmentPlan:
    """Builds the cache-root env plan for the active settings snapshot.

    Caveat shared with the reference design: huggingface_hub snapshots
    ``HF_HOME``/``HF_HUB_OFFLINE`` at FIRST import, so the plan only steers
    libraries not yet imported when the scope opens. The model loaders pass
    explicit cache paths as the primary mechanism; the env plan is
    belt-and-suspenders for transitive library lookups.
    """
    hub_cache = settings.models.huggingface_cache_root / "hub"
    return RuntimeEnvironmentPlan(
        set_vars={
            "HF_HOME": str(settings.models.huggingface_cache_root),
            # Both hub-cache spellings, as the reference sets them
            # (environment_plan.py:92-97) — transitive libraries disagree on
            # which one they honor.
            "HF_HUB_CACHE": str(hub_cache),
            "HUGGINGFACE_HUB_CACHE": str(hub_cache),
            "HF_HUB_OFFLINE": "1",  # this runtime never downloads at inference time
            # ModelScope cache for the emotion2vec/FunASR lane (reference
            # environment_plan.py:89-90 scopes this to the accurate-research
            # workflow; one flat plan here since every entry is cache-root-only).
            "MODELSCOPE_CACHE": str(settings.models.modelscope_cache_root),
        }
    )


@contextmanager
def temporary_process_env(plan: RuntimeEnvironmentPlan) -> Iterator[None]:
    """Applies one env plan for the scope, restoring previous values after.

    Originals are saved on FIRST sight of a key only — a key in both
    ``set_vars`` and ``unset_vars`` would otherwise have its saved value
    clobbered by the plan's own, leaking the delta past the scope.
    """
    saved: dict[str, str | None] = {}

    def remember(key: str) -> None:
        if key not in saved:
            saved[key] = os.environ.get(key)

    try:
        for key, value in plan.set_vars.items():
            remember(key)
            os.environ[key] = value
        for key in plan.unset_vars:
            remember(key)
            os.environ.pop(key, None)
        yield
    finally:
        for key, previous in saved.items():
            if previous is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = previous


__all__ = [
    "RuntimeEnvironmentPlan",
    "build_runtime_environment_plan",
    "temporary_process_env",
]
