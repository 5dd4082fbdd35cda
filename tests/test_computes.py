"""compute allegro / compute allegro/atom equivalents."""

import numpy as np
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.computes import GlobalCompute, PerAtomCompute
from pair_allegro_tpu.potential import make_potential
from pair_allegro_tpu.system import System


def _toy_potential():
    """Pair potential emitting custom outputs: per-atom 'charges' (extensive
    sum -> global) and per-atom 3-vector 'dipole'."""

    def energy_fn(positions, types, edge_index, *, cell=None, edge_shifts=None,
                  atom_mask=None, edge_mask=None):
        i, j = edge_index[0], edge_index[1]
        r2 = jnp.sum((positions[j] - positions[i]) ** 2, axis=-1)
        e_edge = jnp.where(edge_mask, r2, 0.0) if edge_mask is not None else r2
        e_atom = jnp.zeros(positions.shape[0]).at[i].add(e_edge)
        q = positions[:, 0] * 0.1
        return {
            "total_energy": jnp.sum(e_atom),
            "atomic_energy": e_atom,
            "charges": q[:, None],
            "dipole": positions * q[:, None],
        }

    return make_potential(energy_fn)


def _setup(rng):
    pos = rng.rand(6, 3) * 4
    system = System.create(pos, np.zeros(6, np.int32), cell=np.eye(3) * 4, dtype=jnp.float64)
    ei = np.asarray([[0, 1, 2, 3], [1, 0, 3, 2]], np.int32)
    pot = _toy_potential()
    out = pot(system.positions, system.types, jnp.asarray(ei), compute_virial=False)
    return system, out, pos


def test_global_compute_extensive_sum(rng):
    system, out, pos = _setup(rng)
    c = GlobalCompute("charges", 1)
    np.testing.assert_allclose(float(c(out)[0]), pos[:, 0].sum() * 0.1, rtol=1e-12)
    c3 = GlobalCompute("dipole", 3)
    np.testing.assert_allclose(np.asarray(c3(out)), (pos * (pos[:, [0]] * 0.1)).sum(0), rtol=1e-12)


def test_global_compute_wrong_length(rng):
    system, out, _ = _setup(rng)
    with pytest.raises(ValueError, match="length"):
        GlobalCompute("dipole", 5)(out)


def test_missing_quantity_is_hard_error(rng):
    system, out, _ = _setup(rng)
    with pytest.raises(KeyError, match="polarization"):
        GlobalCompute("polarization", 3)(out)


def test_peratom_compute_masks_padding(rng):
    pos = rng.rand(6, 3) * 4
    system = System.create(
        pos, np.zeros(6, np.int32), cell=np.eye(3) * 4, dtype=jnp.float64, pad_to=8
    )
    ei = np.asarray([[0, 1], [1, 0]], np.int32)
    pot = _toy_potential()
    out = pot(system.positions, system.types, jnp.asarray(ei), compute_virial=False)
    arr = np.asarray(PerAtomCompute("dipole", 3)(out, system))
    assert arr.shape == (8, 3)
    assert np.all(arr[6:] == 0.0)  # padded rows zeroed
    np.testing.assert_allclose(arr[:6], pos * (pos[:, [0]] * 0.1), rtol=1e-12)
