"""Masked uncertainty-weighted multitask objective (JAX).

Parity surface: reference ``ser/_internal/heads/multitask_loss.py:11-65`` —
per-task losses are combined with learned homoscedastic-uncertainty weights
(``exp(-log_variance) * mean_loss + log_variance``), per-sample masks select
only samples whose target exists for that task, and the primary task's
weight is clamped from below so auxiliary heads can never drown it out.

Functional re-design for jit: log-variances live in a param dict (trained by
the same optimizer as the head), masked task means are computed with count
guards instead of boolean indexing, and an absent/empty task contributes
exactly zero to the total — under tracing there is no data-dependent raise,
so the eager :func:`validate_multitask_inputs` carries the reference's
error contract at the host boundary.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import jax.numpy as jnp

PRIMARY_TASK = "primary_emotion"


def normalize_task_names(tasks: Sequence[str]) -> tuple[str, ...]:
    """De-duplicated, stripped task names; rejects empties and dotted names."""
    normalized = tuple(dict.fromkeys(task.strip() for task in tasks if task.strip()))
    if not normalized:
        raise ValueError("At least one multitask objective is required.")
    if any("." in task for task in normalized):
        raise ValueError("Task names cannot contain '.'.")
    return normalized


def init_multitask_loss_params(tasks: Sequence[str]) -> dict:
    """Zero-initialized log variances (weight 1.0) per task."""
    return {
        "log_variances": {
            task: jnp.zeros((), dtype=jnp.float32)
            for task in normalize_task_names(tasks)
        }
    }


def validate_multitask_inputs(
    params: dict,
    losses: Mapping[str, object],
    masks: Mapping[str, object],
) -> None:
    """Eager-side contract check: at least one registered task has targets."""
    registered = set(params["log_variances"])
    supplied = registered & set(losses) & set(masks)
    if not supplied:
        raise ValueError("No available targets were supplied to the multitask loss.")


def multitask_loss(
    params: dict,
    losses: Mapping[str, jnp.ndarray],
    masks: Mapping[str, jnp.ndarray],
    *,
    primary_task: str = PRIMARY_TASK,
    minimum_primary_weight: float = 0.25,
) -> jnp.ndarray:
    """Scalar combined loss over the tasks present in both mappings.

    Args:
      losses: per-task per-sample loss vectors (scalars promote to shape (1,)).
      masks: per-task availability masks of matching shape (1 = target exists).
    """
    if not 0.0 < minimum_primary_weight <= 1.0:
        raise ValueError("minimum_primary_weight must be within (0, 1].")
    total = jnp.zeros((), dtype=jnp.float32)
    for task, log_variance in params["log_variances"].items():
        if task not in losses or task not in masks:
            continue
        task_losses = jnp.atleast_1d(jnp.asarray(losses[task], dtype=jnp.float32))
        mask = jnp.atleast_1d(jnp.asarray(masks[task]))
        if mask.shape != task_losses.shape:
            raise ValueError(f"Loss and mask shapes differ for task {task!r}.")
        mask = mask.astype(jnp.float32)
        count = jnp.sum(mask)
        mean_loss = jnp.sum(task_losses * mask) / jnp.maximum(count, 1.0)
        weight = jnp.exp(-log_variance)
        if task == primary_task:
            weight = jnp.maximum(weight, minimum_primary_weight)
        contribution = weight * mean_loss + log_variance
        total = total + jnp.where(count > 0, contribution, 0.0)
    return total


__all__ = [
    "PRIMARY_TASK",
    "init_multitask_loss_params",
    "multitask_loss",
    "normalize_task_names",
    "validate_multitask_inputs",
]
