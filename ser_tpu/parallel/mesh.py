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
    data_cfg, model_cfg = config.data_axis_size, config.model_axis_size
    if data_cfg > 0 and model_cfg > 0:
        data, model = data_cfg, model_cfg
    elif model_cfg > 0:
        model = model_cfg
        if n_devices % model != 0:
            raise ValueError(
                f"model_axis_size {model} does not divide device count {n_devices}."
            )
        data = n_devices // model
    elif data_cfg > 0:
        # Either axis may absorb the remaining devices (docstring contract).
        data = data_cfg
        if n_devices % data != 0:
            raise ValueError(
                f"data_axis_size {data} does not divide device count {n_devices}."
            )
        model = n_devices // data
    else:
        data, model = n_devices, 1
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
