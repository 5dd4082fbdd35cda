"""Sharded (multi-device) vs single-device differential tests.

The analog of the reference's n_rank ∈ {1,2,4} MPI parametrization
(/root/reference/tests/test_python_repro_allegro.py:44-47,153-157): the same
system evaluated on 1 device and on an 8-virtual-device CPU mesh must agree
to f64 tolerance — energies, per-atom energies, forces, virial.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.engine import AllegroEngine
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
from pair_allegro_tpu.parallel import ShardedAllegroEngine, make_mesh
from pair_allegro_tpu.system import System


def _fcc(n_rep, a0=3.61, jitter=0.05, seed=0):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate(
        [
            base + np.array([i, j, k]) * a0
            for i in range(n_rep)
            for j in range(n_rep)
            for k in range(n_rep)
        ]
    )
    rng = np.random.RandomState(seed)
    return pos + jitter * rng.randn(*pos.shape), np.eye(3) * a0 * n_rep


def _engine_pair(n_rep, n_dev, r_max=4.5, **cfg_kw):
    pos, cell = _fcc(n_rep)
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=r_max, l_max=1, num_layers=2,
        num_scalar_features=16, num_tensor_features=8, avg_num_neighbors=12.0,
        **cfg_kw,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell, dtype=jnp.float64)
    mesh = make_mesh(n_dev)
    system, perm = ShardedAllegroEngine.prepare_system(system, mesh.shape["atoms"])
    single = AllegroEngine(cfg, params, system)
    sharded = ShardedAllegroEngine(cfg, params, system, mesh)
    return system, single, sharded


@pytest.mark.parametrize("n_dev,n_rep", [(2, 2), (8, 3), (8, 5)])
def test_sharded_matches_single(n_dev, n_rep):
    """n_rep=2 (32 atoms) and 3 (108) take the dense strategy; 5 (500... >256)
    takes the cell list.  All must agree with the single-device engine."""
    system, single, sharded = _engine_pair(n_rep, n_dev)

    nb1 = single.rebuild_fn(system, None)
    out1 = single.force_fn(system, nb1)
    nb2 = sharded.rebuild_fn(system, None)
    out2 = sharded.force_fn(system, nb2)

    assert not bool(nb1.overflow) and not bool(nb2.overflow)
    # exact (i, j, shift) multiset equality — the reference's edge-dump
    # check (test_python_repro_allegro.py:259-286), not just the count
    from pair_allegro_tpu.debug import edge_set

    pos_np, cell_np = np.asarray(system.positions), np.asarray(system.cell)
    assert edge_set(nb1, pos_np, cell_np) == edge_set(nb2, pos_np, cell_np)
    np.testing.assert_allclose(
        float(out1.total_energy), float(out2.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out1.atomic_energy), np.asarray(out2.atomic_energy), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out1.forces), np.asarray(out2.forces), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out1.virial), np.asarray(out2.virial), atol=1e-10
    )


def test_sharded_extras_passthrough():
    """Custom model outputs survive the sharded path: per-atom extras stay
    per-atom, extensive extras are psum'ed (compute allegro under MPI,
    /root/reference/compute/compute_allegro.cpp:102-189)."""
    system, single, sharded = _engine_pair(3, 8, output_charges=True)
    out1 = single.force_fn(system, single.rebuild_fn(system, None))
    out2 = sharded.force_fn(system, sharded.rebuild_fn(system, None))
    assert "charges" in out2.extras and "dipole" in out2.extras
    np.testing.assert_allclose(
        np.asarray(out1.extras["charges"]), np.asarray(out2.extras["charges"]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out1.extras["dipole"]), np.asarray(out2.extras["dipole"]),
        atol=1e-11,
    )


def test_sharded_row_chunk_matches_single():
    """row_chunk x sharding: each shard scans center-row windows — the
    million-atom mode across the mesh.  Must equal the plain single-device
    result exactly (strict locality, pair_nequip_allegro.cpp:86-89)."""
    pos, cell = _fcc(5)  # 500 atoms -> cell-list strategy
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=1, num_layers=2,
        num_scalar_features=16, num_tensor_features=8, avg_num_neighbors=12.0,
        output_charges=True,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell, dtype=jnp.float64)
    mesh = make_mesh(8)
    system, _ = ShardedAllegroEngine.prepare_system(system, 8)  # 504 -> 63/shard
    single = AllegroEngine(cfg, params, system)
    sharded = ShardedAllegroEngine(cfg, params, system, mesh, row_chunk=21)

    out1 = single.force_fn(system, single.rebuild_fn(system, None))
    nb2 = sharded.rebuild_fn(system, None)
    assert not bool(np.asarray(nb2.overflow))
    out2 = sharded.force_fn(system, nb2)
    np.testing.assert_allclose(
        float(out1.total_energy), float(out2.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out1.atomic_energy), np.asarray(out2.atomic_energy), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(out1.forces), np.asarray(out2.forces), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out1.virial), np.asarray(out2.virial), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out1.extras["charges"]), np.asarray(out2.extras["charges"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out1.extras["dipole"]), np.asarray(out2.extras["dipole"]), atol=1e-11
    )


@pytest.mark.parametrize("n_rep,skin", [(2, 0.0), (5, 0.4)])
def test_sharded_jit_and_scan_step(n_rep, skin):
    """One jitted NVE step over the mesh (what dryrun_multichip exercises).

    The skin>0 + cell-list case is a regression guard: the sharded rebuild
    assembles NeighborData EAGERLY around its jitted shard_map, so a
    ref_positions that aliases system.positions puts the same buffer twice
    into the donated MDState — a hard XLA donation error on the first
    chunk (the single-device engine jits the whole rebuild and never
    leaks the alias)."""
    from pair_allegro_tpu.md.integrate import Simulation, Units

    pos, cell = _fcc(n_rep)
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=1, num_layers=2,
        num_scalar_features=16, num_tensor_features=8, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell, dtype=jnp.float64)
    system, _ = ShardedAllegroEngine.prepare_system(system, 8)
    sharded = ShardedAllegroEngine(cfg, params, system, make_mesh(8), skin=skin)
    if skin > 0.0:
        assert sharded.spec.strategy == "cell_list"
    sim = Simulation(system, sharded.force_fn, sharded.rebuild_fn, dt=1.0 * Units.fs)
    sim.init_velocities(100.0)
    rows = sim.run(3, log_every=3)
    assert np.isfinite(rows[-1]["etotal"])


def test_prepare_system_permutation_roundtrip():
    pos, cell = _fcc(3)
    n = pos.shape[0]
    system = System.create(pos, np.zeros(n, np.int32), cell=cell, dtype=jnp.float64)
    prepared, perm = ShardedAllegroEngine.prepare_system(system, 8)
    assert prepared.n_atoms % 8 == 0
    np.testing.assert_allclose(np.asarray(prepared.positions)[: len(perm)], pos[perm])
    # padded rows are invalid
    assert not np.any(np.asarray(prepared.valid)[n:])


def test_sharded_nequip_matches_single():
    """Sharded NequIP — a capability the reference explicitly forbids
    (pair_nequip_allegro.cpp:86-89 errors on >1 rank): per-layer all_gather
    carries the multi-hop messages, and the mesh result must equal the
    single-device model at f64."""
    from pair_allegro_tpu.engine import NequIPEngine
    from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_init
    from pair_allegro_tpu.parallel import ShardedNequIPEngine

    pos, cell = _fcc(5)
    n = pos.shape[0]
    cfg = NequIPConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=3,
                       num_features=8, avg_num_neighbors=12.0)
    params = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float64)
    mesh = make_mesh(8)
    sys_s, _ = ShardedAllegroEngine.prepare_system(system, 8)
    eng_s = ShardedNequIPEngine(cfg, params, sys_s, mesh)
    eng_0 = NequIPEngine(cfg, params, sys_s)
    nb_s = eng_s.rebuild_fn(sys_s, None)
    nb_0 = eng_0.rebuild_fn(sys_s, None)
    assert int(np.asarray(nb_s.count())) == int(np.asarray(nb_0.count()))
    out_s = eng_s.force_fn(sys_s, nb_s)
    out_0 = eng_0.force_fn(sys_s, nb_0)
    np.testing.assert_allclose(
        float(out_s.total_energy), float(out_0.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_s.atomic_energy), np.asarray(out_0.atomic_energy), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_s.forces), np.asarray(out_0.forces), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_s.virial), np.asarray(out_0.virial), atol=1e-11
    )
    # information really crosses shard boundaries: num_layers * r_max = 12 A
    # exceeds the shard window extent, so equality here certifies multi-hop
    # propagation over the mesh, not accidental locality
    assert cfg.num_layers * cfg.r_max > float(np.asarray(sys_s.cell)[2, 2]) / 8
