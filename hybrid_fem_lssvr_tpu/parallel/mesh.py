"""Device-mesh helpers for element-axis sharding.

The reference has no parallelism (sequential Python loop over elements,
``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:151``).  Here the element
axis IS the data/sequence axis (SURVEY.md 2.3): a 1-D mesh
``('elements',)`` shards contiguous element ranges across chips; collectives
ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec

ELEMENT_AXIS = "elements"


def element_mesh(n_devices: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the element axis (defaults to all visible devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (ELEMENT_AXIS,))


def element_spec() -> PartitionSpec:
    return PartitionSpec(ELEMENT_AXIS)


def replicated_spec() -> PartitionSpec:
    return PartitionSpec()


GRID_AXES = ("ely", "elx")


def grid_mesh(n_dy: int, n_dx: int, devices: Optional[Sequence] = None
              ) -> Mesh:
    """2-axis mesh over (element-row, element-column) blocks — the full 2D
    analog of ``element_mesh`` (SURVEY.md 7.1 L8: 2-D mesh sharding)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_dy * n_dx]).reshape(n_dy, n_dx)
    return Mesh(devices, GRID_AXES)


GRID_AXES_3D = ("elz", "ely")


def grid_mesh_3d(n_dz: int, n_dy: int, devices: Optional[Sequence] = None
                 ) -> Mesh:
    """2-axis mesh over (element-layer, element-row) blocks of a 3D hex
    grid — z and y shard, x stays local (the 3D lift of ``grid_mesh``)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_dz * n_dy]).reshape(n_dz, n_dy)
    return Mesh(devices, GRID_AXES_3D)
