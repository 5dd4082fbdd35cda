"""Core simulation state pytree and unit system.

Replaces the LAMMPS-side state the reference plugin reads through
``atom->x/f/type/tag`` and ``domain`` (see /root/reference/pair_nequip_allegro.cpp:333-407
and get_cell at :652-666).  The cell follows the same convention: a row-major
3x3 with rows = lattice vectors; LAMMPS-style upper-triangular
``[[lx,0,0],[xy,ly,0],[xz,yz,lz]]`` is one valid instance, but general
triclinic (and rotated) cells are supported as in the nequip-mode tests
(/root/reference/tests/test_python_repro_nequip.py:127-132).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


class Units:
    """LAMMPS ``units metal`` constants (eV, Angstrom, ps, amu, bar).

    The reference tests run exclusively in metal units
    (/root/reference/tests/test_python_repro_allegro.py:96 ``units metal``),
    with stress converted eV/A^3 -> bar at :330-332.
    """

    # Boltzmann constant [eV/K]
    kB = 8.617333262e-5
    # mass*velocity^2 -> energy: amu*(A/ps)^2 -> eV
    mvv2e = 1.0364269574711572e-4
    # force/mass -> acceleration: (eV/A)/amu -> A/ps^2
    ftm2a = 1.0 / mvv2e
    # pressure: eV/A^3 -> bar
    nktv2p = 1.6021766340000002e6
    # femtosecond in ps
    fs = 1.0e-3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class System:
    """The atomistic state: one pytree, donate-able through jitted MD steps.

    Attributes:
      positions: (N, 3) Cartesian positions [A].
      velocities: (N, 3) velocities [A/ps].
      types: (N,) int32 model type indices (already mapped through the
        type-name table, the analog of pair_nequip_allegro.cpp:274-294).
      masses: (N,) atomic masses [amu].
      cell: (3, 3) row-vector lattice matrix [A]; zeros row = non-periodic.
      pbc: (3,) bool, per-axis periodicity (LAMMPS ``boundary p/s``).
      valid: (N,) bool mask — False rows are padding (the analog of the
        Kokkos fake atoms, pair_nequip_allegro_kokkos.cpp:242-248).
    """

    positions: jax.Array
    velocities: jax.Array
    types: jax.Array
    masses: jax.Array
    cell: jax.Array
    pbc: Any = dataclasses.field(metadata=dict(static=True), default=(True, True, True))
    valid: jax.Array | None = None

    @property
    def n_atoms(self) -> int:
        return self.positions.shape[0]

    @property
    def n_valid(self):
        if self.valid is None:
            return self.positions.shape[0]
        return jnp.sum(self.valid)

    def valid_mask(self) -> jax.Array:
        if self.valid is None:
            return jnp.ones((self.n_atoms,), dtype=bool)
        return self.valid

    @staticmethod
    def create(
        positions,
        types,
        cell=None,
        velocities=None,
        masses=None,
        pbc=None,
        dtype=jnp.float32,
        pad_to: int | None = None,
    ) -> "System":
        """Build a System from host data, optionally padded to a fixed size."""
        pos = np.asarray(positions, dtype=np.float64)
        n = pos.shape[0]
        typ = np.asarray(types, dtype=np.int32)
        vel = np.zeros_like(pos) if velocities is None else np.asarray(velocities, np.float64)
        mas = np.ones((n,)) if masses is None else np.asarray(masses, np.float64)
        if cell is None:
            cell_np = np.zeros((3, 3))
            pbc = (False, False, False) if pbc is None else tuple(pbc)
        else:
            cell_np = np.asarray(cell, dtype=np.float64).reshape(3, 3)
            pbc = (True, True, True) if pbc is None else tuple(pbc)
        valid = np.ones((n,), dtype=bool)
        if pad_to is not None and pad_to > n:
            # Padding atoms parked far away, mirroring the Kokkos fake-atom
            # trick (pair_nequip_allegro_kokkos.cpp:242-248).
            extent = float(np.abs(pos).max() + np.abs(cell_np).sum() + 100.0)
            pad = pad_to - n
            pos = np.concatenate([pos, np.full((pad, 3), extent)], axis=0)
            vel = np.concatenate([vel, np.zeros((pad, 3))], axis=0)
            typ = np.concatenate([typ, np.zeros((pad,), np.int32)], axis=0)
            mas = np.concatenate([mas, np.ones((pad,))], axis=0)
            valid = np.concatenate([valid, np.zeros((pad,), bool)], axis=0)
        return System(
            positions=jnp.asarray(pos, dtype=dtype),
            velocities=jnp.asarray(vel, dtype=dtype),
            types=jnp.asarray(typ),
            masses=jnp.asarray(mas, dtype=dtype),
            cell=jnp.asarray(cell_np, dtype=dtype),
            pbc=pbc,
            valid=jnp.asarray(valid),
        )
