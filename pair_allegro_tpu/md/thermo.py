"""Thermodynamic observables (the ``thermo_style custom`` analog).

The reference's tests print step/pe/temp/press columns and per-atom energies
via LAMMPS computes (/root/reference/tests/test_python_repro_allegro.py:105-117:
``compute pe/atom``, ``compute reduce sum``, ``compute pressure NULL virial``,
``thermo_style custom step time cpu pe c_pe press``).  Conventions:

* temperature: T = 2 KE / (3 N kB), KE = 0.5 sum m v^2 * mvv2e      [K]
* pressure tensor: P = (sum m v (x) v * mvv2e + W) / V * nktv2p     [bar]
  where W is the virial (-dE/dstrain); scalar press = tr(P)/3.
  The LAMMPS-vs-ASE sign convention (virial = -stress*V) is pinned by
  tests/test_python_repro_allegro.py:343-355.
"""

from __future__ import annotations

import jax.numpy as jnp

from pair_allegro_tpu.ops.geometry import volume
from pair_allegro_tpu.system import Units


def kinetic_energy(system):
    m = system.masses * system.valid_mask().astype(system.masses.dtype)
    return 0.5 * Units.mvv2e * jnp.sum(m[:, None] * system.velocities**2)


def temperature(system):
    ke = kinetic_energy(system)
    n = system.n_valid
    return 2.0 * ke / (3.0 * jnp.maximum(n, 1) * Units.kB)


def pressure_tensor(system, virial):
    """(3,3) pressure tensor in bar (potential virial + kinetic term)."""
    m = system.masses * system.valid_mask().astype(system.masses.dtype)
    v = system.velocities
    kin = Units.mvv2e * jnp.einsum("n,ni,nj->ij", m, v, v)
    vol = volume(system.cell)
    return (kin + virial) / vol * Units.nktv2p


def thermo_row(state) -> dict:
    """One row of thermo output from an MDState."""
    sys_ = state.system
    ke = kinetic_energy(sys_)
    press = pressure_tensor(sys_, state.virial)
    return {
        "step": state.step,
        "pe": state.potential_energy,
        "ke": ke,
        "etotal": state.potential_energy + ke,
        "temp": temperature(sys_),
        "press": jnp.trace(press) / 3.0,
        "press_tensor": press,
        "n_edges": state.neighbors.count(),
        "overflow": state.neighbors.overflow,
    }
