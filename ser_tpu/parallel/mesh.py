"""Device mesh construction for data/model parallel execution.

The distributed backend of this framework (SURVEY §2.10: a new, first-class
component with no reference counterpart): scale comes from
``jax.sharding.Mesh`` + GSPMD-inserted collectives over ICI, not from host
processes. The mesh is configured via ``MeshConfig`` (env
``SER_MESH_DATA_AXIS_SIZE`` / ``SER_MESH_MODEL_AXIS_SIZE``); axis size 0 means
"absorb the remaining devices".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ser_tpu._internal.config.schema import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def mesh_shape_for(
    n_devices: int, config: MeshConfig | None = None
) -> tuple[int, int]:
    """Resolves (data, model) axis sizes for one device count."""
    config = config if config is not None else MeshConfig()
    model = config.model_axis_size if config.model_axis_size > 0 else 1
    if n_devices % model != 0:
        raise ValueError(
            f"model_axis_size {model} does not divide device count {n_devices}."
        )
    data = config.data_axis_size if config.data_axis_size > 0 else n_devices // model
    if data * model != n_devices:
        raise ValueError(
            f"Mesh {data}x{model} does not match device count {n_devices}."
        )
    return data, model


def build_mesh(
    config: MeshConfig | None = None, *, devices: list[jax.Device] | None = None
) -> Mesh:
    """Builds the ("data", "model") mesh over the visible devices."""
    devices = devices if devices is not None else jax.devices()
    data, model = mesh_shape_for(len(devices), config)
    array = np.asarray(devices).reshape(data, model)
    return Mesh(array, (DATA_AXIS, MODEL_AXIS))


__all__ = ["DATA_AXIS", "MODEL_AXIS", "build_mesh", "mesh_shape_for"]
