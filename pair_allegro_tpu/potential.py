"""Potential: energies -> forces / virial / custom outputs via autodiff.

The reference receives forces and virial as model outputs because autograd
lives inside the compiled libtorch artifact (outputs unpacked at
/root/reference/pair_nequip_allegro.cpp:358-363, virial mapped to the LAMMPS
6-vector at :382-393).  TPU-natively this is one ``jax.grad`` over the energy:

  forces = -dE/d(positions)            (includes ghost atoms in allegro mode,
                                        matching the write-back to ntotal at
                                        pair_nequip_allegro.cpp:368-377)
  virial W = -dE/d(strain)             (symmetric 3x3; stress = -W/V; LAMMPS
                                        reports pressure = -stress + kinetic)

Conventions verified against finite differences in tests/test_allegro.py
(force/virial finite-difference checks at tests/test_allegro.py:115-145).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelOutputs:
    """The model I/O contract (SURVEY §2.8): atomic_energy, forces, virial,
    plus arbitrary named extras consumed by computes
    (pair_nequip_allegro.cpp:403-406)."""

    total_energy: jax.Array
    atomic_energy: jax.Array
    forces: jax.Array
    virial: jax.Array
    extras: dict[str, jax.Array] = dataclasses.field(default_factory=dict)


def make_potential(energy_fn: Callable[..., dict]) -> Callable[..., ModelOutputs]:
    """Wrap an energy function into a full potential.

    Args:
      energy_fn: (positions, types, edge_index, cell=..., edge_shifts=...,
        atom_mask=..., edge_mask=..., **kw) -> dict with at least
        'total_energy' and 'atomic_energy'.  Additional dict entries are
        passed through as custom outputs.

    Returns:
      potential(positions, types, edge_index, cell=None, ...) -> ModelOutputs.
    """

    def potential(
        positions,
        types,
        edge_index,
        *,
        cell=None,
        edge_shifts=None,
        atom_mask=None,
        edge_mask=None,
        compute_virial: bool = True,
        **kw: Any,
    ) -> ModelOutputs:
        dtype = positions.dtype

        def energy_of(pos, strain):
            defm = jnp.eye(3, dtype=dtype) + strain
            pos_s = jnp.dot(pos, defm, precision="highest")
            cell_s = None if cell is None else jnp.dot(cell, defm, precision="highest")
            out = energy_fn(
                pos_s,
                types,
                edge_index,
                cell=cell_s,
                edge_shifts=edge_shifts,
                atom_mask=atom_mask,
                edge_mask=edge_mask,
                **kw,
            )
            return out["total_energy"], out

        strain0 = jnp.zeros((3, 3), dtype=dtype)
        if compute_virial:
            grads, out = jax.grad(energy_of, argnums=(0, 1), has_aux=True)(positions, strain0)
            dpos, dstrain = grads
            virial = -0.5 * (dstrain + dstrain.T)
        else:
            dpos, out = jax.grad(energy_of, argnums=0, has_aux=True)(positions, strain0)
            virial = jnp.zeros((3, 3), dtype=dtype)
        # NOTE: forces are NOT masked by atom_mask — ghost atoms carry forces
        # (the reference writes forces for ntotal = local+ghost atoms,
        # pair_nequip_allegro.cpp:368-377, and reverse-sums them to owners);
        # atom_mask only limits *energy* accounting to local atoms (:366-380).
        # Padded (fake) atoms have no real edges, so their forces are zero.
        forces = -dpos

        extras = {
            k: v
            for k, v in out.items()
            if k not in ("total_energy", "atomic_energy")
        }
        return ModelOutputs(
            total_energy=out["total_energy"],
            atomic_energy=out["atomic_energy"],
            forces=forces,
            virial=virial,
            extras=extras,
        )

    return potential


def virial_to_voigt(virial):
    """3x3 virial -> LAMMPS 6-vector [xx, yy, zz, xy, xz, yz]
    (pair_nequip_allegro.cpp:382-393)."""
    return jnp.stack(
        [
            virial[0, 0],
            virial[1, 1],
            virial[2, 2],
            virial[0, 1],
            virial[0, 2],
            virial[1, 2],
        ]
    )
