"""Device-mesh construction for the spatial-DD axis.

The reference scales by LAMMPS MPI domain decomposition (SURVEY §2.5); the
TPU-native analog is a 1-D device mesh over which atoms are sharded, with
XLA collectives riding ICI.  Multi-slice (DCN) meshes add an outer axis
later; every collective in this package is mesh-axis-name based so the
topology is a deployment choice, not a code change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

ATOM_AXIS = "atoms"


def make_mesh(n_devices: int | None = None, axis_name: str = ATOM_AXIS) -> Mesh:
    """A 1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
