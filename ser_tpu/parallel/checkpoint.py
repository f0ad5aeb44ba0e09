"""Sharded train-state checkpoint/resume for the scale-out training loop.

Completes the checkpoint/resume story (SURVEY §5) for the one state the
artifact envelope does not cover: the full-encoder training trajectory —
encoder params, head params, optimizer state (adam moments are as large as
the params), and the step counter. Saves ride the crash-safe orbax writer
(`_internal/models/orbax_io.py`: staging-then-swap overwrite, committed-
staging recovery); restores are TEMPLATE-guided so every leaf comes back
with the caller's mesh placement (tensor-parallel kernels restore sharded,
not replicated — on a real pod a replicated restore of a 10 GB adam tree
would OOM before the first step).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

from ser_tpu._internal.models.orbax_io import load_checkpoint, save_checkpoint


def save_train_state(
    path: str | Path,
    *,
    encoder_params: Any,
    head_params: Any,
    opt_state: Any,
    step: int,
) -> str:
    """Persists one training-trajectory checkpoint (crash-safe overwrite)."""
    state = {
        "encoder_params": encoder_params,
        "head_params": head_params,
        "opt_state": opt_state,
        "step": np.asarray(step, dtype=np.int64),
    }
    return save_checkpoint(state, path)


def _abstract_like(tree: Any, mesh) -> Any:
    """ShapeDtypeStruct tree carrying each live leaf's MESH placement.

    Leaves that already live on the mesh keep their NamedSharding; anything
    else (e.g. optax scalar counters, which ``optimizer.init`` leaves on a
    single device) restores replicated over the mesh — mixing
    single-device and mesh-wide arrays in one jitted step is an error.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    replicated = NamedSharding(mesh, PartitionSpec())

    def leaf(x):
        x = jax.numpy.asarray(x)
        sharding = getattr(x, "sharding", None)
        if not isinstance(sharding, NamedSharding) or sharding.mesh != mesh:
            sharding = replicated
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree_util.tree_map(leaf, tree)


def restore_train_state(
    path: str | Path,
    *,
    mesh,
    encoder_params_like: Any,
    head_params_like: Any,
    opt_state_like: Any,
) -> tuple[Any, Any, Any, int]:
    """Restores ``(encoder_params, head_params, opt_state, step)``.

    The ``*_like`` trees are freshly initialized state already placed on the
    target mesh (what the caller would train from scratch with): their
    structure rebuilds optax's namedtuple pytrees, and their shardings tell
    orbax where each restored shard belongs — a resume onto a DIFFERENT mesh
    shape than the save is therefore supported.
    """
    template = {
        "encoder_params": _abstract_like(encoder_params_like, mesh),
        "head_params": _abstract_like(head_params_like, mesh),
        "opt_state": _abstract_like(opt_state_like, mesh),
        "step": jax.ShapeDtypeStruct((), np.dtype(np.int64)),
    }
    state = load_checkpoint(path, template=template)
    return (
        state["encoder_params"],
        state["head_params"],
        state["opt_state"],
        int(state["step"]),
    )


__all__ = ["restore_train_state", "save_train_state"]
