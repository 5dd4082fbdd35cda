"""The reference's own test structures through the FULL engine.

Mirrors the parametrization of the reference's repro matrix
(/root/reference/tests/test_python_repro_allegro.py:33-50): aspirin
(nonperiodic), Cu-cubic with r_max exceeding the box (many periodic
images), Cu2AgO4 (triclinic), CuPd-cubic-big (256 atoms).  For each, the
engine's edge set and forces must match the naive f64 oracle — the engine
analog of the reference's LAMMPS-vs-ASE differential test."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.debug import edge_set
from pair_allegro_tpu.engine import AllegroEngine, TypeMapper
from pair_allegro_tpu.io.extxyz import read_extxyz
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
from pair_allegro_tpu.neighbors.naive import neighbor_list_np
from pair_allegro_tpu.potential import make_potential
from pair_allegro_tpu.system import System

REF_DATA = "/root/reference/tests/test_data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not mounted"
)

# (file, r_max) — r_max=15 on the 3.61 A Cu cell is the many-periodic-images
# case of the reference matrix (conftest.py:54-81: r_max > box size)
CASES = [
    ("aspirin.xyz", 5.0),
    ("Cu-cubic.xyz", 15.0),
    ("Cu2AgO4.xyz", 5.0),
    ("CuPd-cubic-big.xyz", 4.5),
]


def _load(fname):
    fr = read_extxyz(os.path.join(REF_DATA, fname), index=0)
    symbols = [str(s) for s in fr["symbols"]]
    names = tuple(sorted(set(symbols)))
    types = TypeMapper(names).map_names(symbols)
    cell = fr["cell"] if fr["cell"] is not None else np.eye(3) * 200.0
    return fr["positions"], types, names, cell, fr["pbc"]


@pytest.mark.parametrize("fname,r_max", CASES)
def test_engine_matches_oracle_on_reference_structure(fname, r_max):
    pos, types, names, cell, pbc = _load(fname)
    cfg = AllegroConfig(
        type_names=names, r_max=r_max, l_max=1, num_layers=2,
        num_scalar_features=8, num_tensor_features=4, avg_num_neighbors=10.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, types, cell=cell, pbc=pbc, dtype=jnp.float64)
    eng = AllegroEngine(cfg, params, system)
    nb = eng.rebuild_fn(system, None)
    assert not bool(np.asarray(nb.overflow))
    out = eng.force_fn(system, nb)

    # oracle: naive neighbor list + flat-layout model, f64
    ei, sh = neighbor_list_np(pos, cell if any(pbc) else None, pbc, r_max)
    # exact (i, j, shift) multiset equality, the reference's edge-dump check
    # (test_python_repro_allegro.py:259-286)
    es_engine = edge_set(nb, np.asarray(system.positions), np.asarray(cell))
    from pair_allegro_tpu.neighbors.device import NeighborData

    nb_oracle = NeighborData(
        edge_index=jnp.asarray(ei), edge_shifts=jnp.asarray(sh, jnp.float64),
        edge_mask=jnp.ones(ei.shape[1], bool), overflow=jnp.zeros((), bool),
    )
    es_oracle = edge_set(nb_oracle, pos, cell)
    assert es_engine == es_oracle, (
        f"{fname}: engine edge multiset != oracle "
        f"({len(es_engine)} vs {len(es_oracle)})"
    )

    pot = make_potential(
        lambda p, t, e, **kw: allegro_energy(params, cfg, p, t, e, **kw)
    )
    ref = pot(jnp.asarray(pos), jnp.asarray(types), jnp.asarray(ei),
              cell=jnp.asarray(cell), edge_shifts=jnp.asarray(sh, jnp.float64))
    # f64 tier tolerance (the reference's 1e-8, tests/conftest.py:113)
    np.testing.assert_allclose(
        float(out.total_energy), float(ref.total_energy), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out.forces)[: len(pos)], np.asarray(ref.forces), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out.virial), np.asarray(ref.virial), atol=1e-8
    )
    # pe == sum of per-atom energies (test_python_repro_allegro.py:321)
    np.testing.assert_allclose(
        float(out.total_energy), float(np.asarray(out.atomic_energy).sum()),
        rtol=1e-12,
    )


@pytest.mark.parametrize("fname,r_max", [("CuPd-cubic-big.xyz", 4.5)])
def test_reference_structure_through_sharded_engine(fname, r_max):
    """The reference's multi-rank matrix runs REAL structures through the
    real pair style (/root/reference/tests/test_python_repro_allegro.py:44-77);
    the analog here: CuPd-cubic-big (256 atoms, the structure the reference
    uses at 2 and 4 ranks) through the 8-virtual-device sharded engine,
    matching the single-device engine at f64."""
    from pair_allegro_tpu.parallel import ShardedAllegroEngine, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    pos, types, names, cell, pbc = _load(fname)
    cfg = AllegroConfig(
        type_names=names, r_max=r_max, l_max=1, num_layers=2,
        num_scalar_features=8, num_tensor_features=4, avg_num_neighbors=10.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, types, cell=cell, pbc=pbc, dtype=jnp.float64)
    mesh = make_mesh(8)
    sys_s, _ = ShardedAllegroEngine.prepare_system(system, 8)
    eng_s = ShardedAllegroEngine(cfg, params, sys_s, mesh)
    eng_0 = AllegroEngine(cfg, params, sys_s)
    nb_s = eng_s.rebuild_fn(sys_s, None)
    nb_0 = eng_0.rebuild_fn(sys_s, None)
    assert int(np.asarray(nb_s.count())) == int(np.asarray(nb_0.count()))
    out_s = eng_s.force_fn(sys_s, nb_s)
    out_0 = eng_0.force_fn(sys_s, nb_0)
    np.testing.assert_allclose(
        float(out_s.total_energy), float(out_0.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_s.forces), np.asarray(out_0.forces), atol=1e-11
    )
