"""Multi-chip execution: device meshes, sharding rules, parallel steps."""

from ser_tpu.parallel.mesh import build_mesh, mesh_shape_for
from ser_tpu.parallel.sharding import (
    batch_sharding,
    encoder_param_sharding,
    replicated,
)
from ser_tpu.parallel.train_step import (
    make_sharded_train_loop,
    make_sharded_train_step,
)

__all__ = [
    "batch_sharding",
    "build_mesh",
    "encoder_param_sharding",
    "make_sharded_train_loop",
    "make_sharded_train_step",
    "mesh_shape_for",
    "replicated",
]
