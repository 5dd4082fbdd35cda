"""Thermodynamic observables (the ``thermo_style custom`` analog).

The reference's tests print step/pe/temp/press columns and per-atom energies
via LAMMPS computes (/root/reference/tests/test_python_repro_allegro.py:105-117:
``compute pe/atom``, ``compute reduce sum``, ``compute pressure NULL virial``,
``thermo_style custom step time cpu pe c_pe press``).  Conventions:

* temperature: T = 2 KE / (n_dof kB), n_dof = 3 N - 3 (LAMMPS
  ``compute temp`` subtracts the 3 COM degrees of freedom, matching the
  Nosé-Hoover thermostats here), KE = 0.5 sum m v^2 * mvv2e          [K]
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


def n_dof(system):
    """3N - 3: COM momentum is conserved (and zeroed by create_velocities),
    the LAMMPS ``compute temp`` default (extra_dof = 3)."""
    return jnp.maximum(3.0 * system.n_valid - 3.0, 1.0)


def temperature(system):
    ke = kinetic_energy(system)
    return 2.0 * ke / (n_dof(system) * Units.kB)


def nose_hoover_conserved(state, temp_K: float, tdamp: float):
    """The Nosé-Hoover extended Hamiltonian
    H' = KE + PE + q xi^2 / 2 + n_dof kB T eta,  deta/dt = xi —
    the exact invariant of the continuous NVT dynamics, conserved by the
    integrator to splitting order.  Drift here is the sensitive detector of
    thermostat bugs (VERDICT r2).  Requires 'xi'/'xi_int' in
    state.thermostat (the 'nvt' integrator)."""
    ndof = n_dof(state.system)
    q = ndof * Units.kB * temp_K * tdamp**2
    xi = state.thermostat["xi"]
    eta = state.thermostat["xi_int"]
    ke = kinetic_energy(state.system)
    return (
        ke + state.potential_energy + 0.5 * q * xi * xi
        + ndof * Units.kB * temp_K * eta
    )


def npt_mtk_conserved(state, temp_K: float, tdamp: float, press_bar: float,
                      pdamp: float):
    """MTK NPT invariant: H' = KE + PE + q xi^2/2 + W eta_b^2/2
    + (n_dof + 1) kB T xi_int + P_ext V (isotropic, single chain)."""
    ndof = n_dof(state.system)
    kT = Units.kB * temp_K
    q = ndof * kT * tdamp**2
    w = (ndof + 3.0) * kT * pdamp**2
    xi = state.thermostat["xi"]
    eta = state.thermostat["eta"]
    eta_i = state.thermostat["xi_int"]
    vol = volume(state.system.cell)
    p_ext = press_bar / Units.nktv2p
    ke = kinetic_energy(state.system)
    return (
        ke + state.potential_energy + 0.5 * q * xi * xi + 0.5 * w * eta * eta
        + (ndof + 1.0) * kT * eta_i + p_ext * vol
    )


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
