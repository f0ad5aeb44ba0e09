"""Multi-chip execution: device meshes, sharding rules, parallel steps.

The train-step builders are exposed lazily (PEP 562): they pull in optax and
the flax whisper stack, which pure-inference processes importing
``ser_tpu.parallel.mesh``/``sharding`` must not pay for at startup.
"""

from ser_tpu.parallel.mesh import build_mesh, mesh_shape_for
from ser_tpu.parallel.sharding import (
    batch_sharding,
    encoder_param_sharding,
    replicated,
)

_LAZY = {
    "make_sharded_train_loop": "train_step",
    "make_sharded_train_step": "train_step",
    "restore_train_state": "checkpoint",
    "save_train_state": "checkpoint",
}

__all__ = [
    "batch_sharding",
    "build_mesh",
    "encoder_param_sharding",
    "make_sharded_train_loop",
    "make_sharded_train_step",
    "mesh_shape_for",
    "replicated",
    "restore_train_state",
    "save_train_state",
]


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(f"ser_tpu.parallel.{_LAZY[name]}")
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
