"""Halo-sharded engine tests: positions sharded over the mesh, ppermute
ghost exchange, reverse force comm via autodiff transpose.

The differential contract mirrors the reference's multi-rank matrix
(/root/reference/tests/test_python_repro_allegro.py:44-77): halo-sharded
results must equal the single-device engine at f64 — edges (multiset),
energies, forces, virial — and, unlike the replicated ShardedAllegroEngine,
per-device arrays must be O(N/n_shards + halo), the ghost-atom memory
contract of pair_nequip_allegro.cpp:368-377.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.engine import AllegroEngine
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
from pair_allegro_tpu.parallel import HaloShardedAllegroEngine, make_mesh
from pair_allegro_tpu.system import System

N_DEV = 8


def _fcc(n_rep, a0=3.61, jitter=0.05, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate(
        [base + np.array([i, j, k]) * a0
         for i in range(n_rep) for j in range(n_rep) for k in range(n_rep)]
    )
    pos += jitter * rng.randn(*pos.shape)
    return pos, np.eye(3) * a0 * n_rep


def _cfg(**kw):
    d = dict(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=2,
             num_scalar_features=8, num_tensor_features=4,
             avg_num_neighbors=12.0)
    d.update(kw)
    return AllegroConfig(**d)


def _setup(n_rep=5, seed=0, **cfg_kw):
    pos, cell = _fcc(n_rep, seed=seed)
    n = pos.shape[0]
    cfg = _cfg(**cfg_kw)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float64)
    mesh = make_mesh(N_DEV)
    sys_s, perm = HaloShardedAllegroEngine.prepare_system(system, N_DEV)
    return cfg, params, sys_s, mesh


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_matches_single_device():
    """Energy / per-atom energies / forces / virial / edge count must match
    the single-device engine exactly (f64)."""
    cfg, params, sys_s, mesh = _setup()
    eng_h = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    eng_0 = AllegroEngine(cfg, params, sys_s)
    nb_h = eng_h.rebuild_fn(sys_s, None)
    nb_0 = eng_0.rebuild_fn(sys_s, None)
    assert not bool(np.asarray(nb_h.overflow))
    assert int(np.asarray(nb_h.count())) == int(np.asarray(nb_0.count()))
    out_h = eng_h.force_fn(sys_s, nb_h)
    out_0 = eng_0.force_fn(sys_s, nb_0)
    np.testing.assert_allclose(
        float(out_h.total_energy), float(out_0.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_h.atomic_energy), np.asarray(out_0.atomic_energy), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_h.forces), np.asarray(out_0.forces), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out_h.virial), np.asarray(out_0.virial), atol=1e-10
    )


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_edge_multiset_exact():
    """Edge (i, j_global, shift) multiset equality against the host oracle —
    the reference's debug-dump check (pair_nequip_allegro.cpp:562-633),
    translated through the ext->global index map."""
    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    cfg, params, sys_s, mesh = _setup(n_rep=4, seed=1)
    eng = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    nb = eng.rebuild_fn(sys_s, None)
    nl, s, hops = eng.n_local, eng.n_shards, eng.hops

    # reconstruct global ids from the per-shard ext frame
    ei = np.asarray(nb.edge_index)  # (N, K) ext-frame j
    em = np.asarray(nb.edge_mask)
    edges = set()
    hop_offsets = eng.hop_offsets
    pos = np.asarray(sys_s.positions)
    cell = np.asarray(sys_s.cell)
    inv_cell = np.linalg.inv(cell)
    for i in range(ei.shape[0]):
        r = i // nl
        for k in range(ei.shape[1]):
            if not em[i, k]:
                continue
            jext = ei[i, k]
            hop = hop_offsets[jext // nl]
            src = (r + hop) % s
            jg = src * nl + jext % nl
            # net lattice shift: build-time x/y shift + z wrap of the hop
            kz = (r + hop) // s  # python floor division
            sh = np.asarray(nb.edge_shifts)[i, k] + np.array([0, 0, kz])
            # verify via geometry instead of trusting index math twice
            vec = pos[jg] + sh @ cell - pos[i]
            assert np.linalg.norm(vec) <= eng.rc + 1e-9
            edges.add((i, jg, *(int(round(x)) for x in sh)))
    ei_ref, sh_ref = neighbor_list_np(pos[: s * nl], cell, (True,) * 3, eng.rc)
    ref = {
        (int(ei_ref[0, k]), int(ei_ref[1, k]), *(int(x) for x in sh_ref[k]))
        for k in range(ei_ref.shape[1])
    }
    assert edges == ref


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_per_device_memory_is_local():
    """THE capability delta vs the replicated engine: per-device arrays are
    O(N/n_shards + halo), not O(N)."""
    cfg, params, sys_s, mesh = _setup()
    eng = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    n = sys_s.n_atoms
    assert eng.n_ext == (2 * eng.hops + 1) * eng.n_local
    assert eng.n_ext < n  # strictly smaller than replication
    nb = eng.rebuild_fn(sys_s, None)
    out = eng.force_fn(sys_s, nb)
    # outputs are genuinely sharded: each device holds N/S rows
    for arr in (out.forces, out.atomic_energy):
        shard = arr.addressable_shards[0]
        assert shard.data.shape[0] == eng.n_local
    shard_e = nb.edge_index.addressable_shards[0]
    assert shard_e.data.shape[0] == eng.n_local


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_md_trajectory_matches():
    """A short NVE run through Simulation (with Verlet skin) must track the
    single-device trajectory at f64."""
    from pair_allegro_tpu.md.integrate import Simulation, Units

    cfg, params, sys_s, mesh = _setup()
    eng_h = HaloShardedAllegroEngine(cfg, params, sys_s, mesh, skin=0.3)
    eng_0 = AllegroEngine(cfg, params, sys_s, skin=0.3)
    sims = []
    for eng in (eng_h, eng_0):
        sys_i = jax.tree.map(jnp.copy, sys_s)  # donated buffers: fresh state
        sim = Simulation(sys_i, eng.force_fn, eng.rebuild_fn, dt=1.0 * Units.fs)
        sim.init_velocities(30.0, seed=3)
        sim.run(20, log_every=10)
        sims.append(sim)
    p_h = np.asarray(sims[0].state.system.positions)
    p_0 = np.asarray(sims[1].state.system.positions)
    np.testing.assert_allclose(p_h, p_0, atol=1e-10)
    e_h = float(sims[0].state.potential_energy)
    e_0 = float(sims[1].state.potential_energy)
    np.testing.assert_allclose(e_h, e_0, rtol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_row_chunk_matches():
    """row_chunk (scan over center windows within each shard) must be exact —
    the million-atom configuration on a halo mesh."""
    cfg, params, sys_s, mesh = _setup()
    eng_c = HaloShardedAllegroEngine(cfg, params, sys_s, mesh, row_chunk=21)
    eng_h = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    nb_c = eng_c.rebuild_fn(sys_s, None)
    nb_h = eng_h.rebuild_fn(sys_s, None)
    out_c = eng_c.force_fn(sys_s, nb_c)
    out_h = eng_h.force_fn(sys_s, nb_h)
    np.testing.assert_allclose(
        float(out_c.total_energy), float(out_h.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_c.forces), np.asarray(out_h.forces), atol=1e-11
    )


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_drift_guard_flags_stale_decomposition():
    """Atoms drifting beyond the coverage margin must flag the neighbor data
    (overflow), and grow() must refuse with a re-sort message — never a
    silently wrong halo."""
    cfg, params, sys_s, mesh = _setup()
    eng = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    margin = eng.cov_min - eng.rc
    # teleport one atom far from its slab (more than half the margin)
    pos = np.asarray(sys_s.positions).copy()
    pos[5] += np.array([0.0, 0.0, margin * 0.75])
    sys_bad = dataclasses.replace(sys_s, positions=jnp.asarray(pos))
    nb = eng.rebuild_fn(sys_bad, None)
    assert bool(np.asarray(nb.overflow))
    with pytest.raises(RuntimeError, match="re-sort"):
        eng.grow(system=sys_bad)


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_thin_slabs_rejected():
    """When slabs would be thinner than the cutoff (2h+1 > S), construction
    must refuse and point at the replicated engine."""
    cfg, params, sys_s, mesh = _setup(n_rep=3)  # 108 atoms: slabs ~1.4 A
    with pytest.raises(ValueError, match="replicated"):
        HaloShardedAllegroEngine(cfg, params, sys_s, mesh)


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_triclinic_and_extras():
    """Triclinic cell (tilted z vector — the slab normal is no longer ez)
    plus custom-output extras through the halo path: per-atom charges stay
    sharded, the extensive dipole is psum'ed — and everything matches the
    single-device engine at f64."""
    rng = np.random.RandomState(2)
    n_rep = 5
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    frac = np.concatenate(
        [base / a0 / n_rep + np.array([i, j, k]) / n_rep
         for i in range(n_rep) for j in range(n_rep) for k in range(n_rep)]
    )
    cell = np.array([
        [a0 * n_rep, 0.0, 0.0],
        [1.5, a0 * n_rep, 0.0],
        [2.0, -1.0, a0 * n_rep],
    ])
    pos = frac @ cell + 0.04 * rng.randn(len(frac), 3)
    n = pos.shape[0]
    cfg = _cfg(output_charges=True)
    params = allegro_init(jax.random.PRNGKey(1), cfg, dtype=jnp.float64)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float64)
    mesh = make_mesh(N_DEV)
    sys_s, _ = HaloShardedAllegroEngine.prepare_system(system, N_DEV)
    eng_h = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    eng_0 = AllegroEngine(cfg, params, sys_s)
    nb_h = eng_h.rebuild_fn(sys_s, None)
    nb_0 = eng_0.rebuild_fn(sys_s, None)
    assert not bool(np.asarray(nb_h.overflow))
    assert int(np.asarray(nb_h.count())) == int(np.asarray(nb_0.count()))
    out_h = eng_h.force_fn(sys_s, nb_h)
    out_0 = eng_0.force_fn(sys_s, nb_0)
    np.testing.assert_allclose(
        float(out_h.total_energy), float(out_0.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_h.forces), np.asarray(out_0.forces), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out_h.virial), np.asarray(out_0.virial), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_h.extras["charges"]), np.asarray(out_0.extras["charges"]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out_h.extras["dipole"]), np.asarray(out_0.extras["dipole"]),
        atol=1e-10,
    )


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_migration_exactness():
    """maybe_migrate (the LAMMPS subdomain re-assignment analog): a rigid
    translation past half the coverage margin must trigger a re-sort whose
    output is exact — positions are the wrapped originals under the returned
    permutation, forces are the (translation-invariant) originals permuted,
    and the refreshed decomposition matches the single-device engine with NO
    new rebuild_fn (no retrace) when the hop count is unchanged."""
    cfg, params, sys_s, mesh = _setup()
    eng = HaloShardedAllegroEngine(cfg, params, sys_s, mesh)
    rebuild_before = eng.rebuild_fn
    out0 = eng.force_fn(sys_s, eng.rebuild_fn(sys_s, None))
    f0 = np.asarray(out0.forces)
    margin = eng.cov_min - eng.rc

    # rigid +z translation: physics identical, drift = 0.3*margin per atom
    # (2*drift = 0.6*margin > the 0.5 default threshold)
    shift = np.array([0.0, 0.0, 0.3 * margin])
    pos = np.asarray(sys_s.positions) + shift
    sys_d = dataclasses.replace(sys_s, positions=jnp.asarray(pos))

    new_sys, perm, new_rebuild = eng.maybe_migrate(sys_d)
    assert new_sys is not None
    assert new_rebuild is None  # same hops: no retrace needed
    assert eng.rebuild_fn is rebuild_before
    # perm is a permutation of the padded index range
    assert sorted(perm) == list(range(sys_s.n_atoms))
    # valid atoms: new positions == wrapped originals under perm
    mask_new = np.asarray(new_sys.valid_mask())
    cell = np.asarray(sys_s.cell)
    frac = (pos[perm] @ np.linalg.inv(cell))
    wrapped = (frac - np.floor(frac)) @ cell
    np.testing.assert_allclose(
        np.asarray(new_sys.positions)[mask_new], wrapped[mask_new], atol=1e-12
    )
    # velocities/types/masses rode along
    np.testing.assert_allclose(
        np.asarray(new_sys.velocities)[mask_new],
        np.asarray(sys_s.velocities)[perm][mask_new], atol=0,
    )
    # the refreshed engine state is exact vs the single-device oracle
    nb = eng.rebuild_fn(new_sys, None)
    assert not bool(np.asarray(nb.overflow))
    out_h = eng.force_fn(new_sys, nb)
    eng_0 = AllegroEngine(cfg, params, new_sys)
    out_0 = eng_0.force_fn(new_sys, eng_0.rebuild_fn(new_sys, None))
    np.testing.assert_allclose(
        float(out_h.total_energy), float(out_0.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_h.forces), np.asarray(out_0.forces), atol=1e-11
    )
    # translation invariance: forces are the originals, permuted
    np.testing.assert_allclose(
        np.asarray(out_h.forces)[mask_new], f0[perm][mask_new], atol=1e-9
    )
    # below threshold: no migration proposed
    res = eng.maybe_migrate(new_sys)
    assert res == (None, None, None)


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")
def test_halo_migration_continuation():
    """An NVT run through Simulation with migrate_fn wired must cross at
    least one drift-triggered re-sort WITHOUT manual intervention and keep
    the dynamics continuous across it — the long-diffusive-run scenario that
    previously died on the drift guard (round-3 review item #3).  LAMMPS
    analog: atom re-assignment to subdomains at reneighboring (SURVEY §2.5).

    Thermal drift in a solid takes thousands of steps to eat the coverage
    margin, so the test injects a rigid +z center-of-mass velocity sized to
    trip the threshold within a few 25-step chunks — a pure translation:
    forces are translation-invariant, so the trajectory stays physical and
    the migration (wrap + relabel) must not kick it."""
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.md.thermo import kinetic_energy

    cfg, params, sys_s, mesh = _setup()
    eng = HaloShardedAllegroEngine(cfg, params, sys_s, mesh, skin=0.3)
    temp_K = 100.0
    dt_fs = 2.0
    sim = Simulation(
        jax.tree.map(jnp.copy, sys_s), eng.force_fn, eng.rebuild_fn,
        dt=dt_fs * Units.fs, integrator="nvt", temp_K=temp_K, tdamp=0.05,
        grow_fn=eng.grow, migrate_fn=eng.maybe_migrate,
    )
    sim.init_velocities(temp_K, seed=7)
    # rigid drift: reach 0.45*margin of one-sided drift (past the 0.5
    # threshold on 2*drift) in ~60 steps → first proactive re-sort at the
    # chunk-2 or chunk-3 boundary of 25-step chunks
    margin = eng.cov_min - eng.rc
    vz = 0.45 * margin / (60 * dt_fs)  # A/fs
    st = sim.state
    vel = st.system.velocities + jnp.asarray([0.0, 0.0, vz], st.system.velocities.dtype)
    sim.state = dataclasses.replace(
        st, system=dataclasses.replace(st.system, velocities=vel)
    )

    def conserved(state):
        # continuity across a PURE RELABELING only needs KE + PE (thermostat
        # scalars are replace()'d through migration unchanged)
        return float(kinetic_energy(state.system)) + float(state.potential_energy)

    migrated_at = None
    e_pre = None
    for it in range(8):  # up to 200 steps; drift trips within ~3 chunks
        e_before = conserved(sim.state)
        perm_before = sim.atom_perm
        sim.run(25, log_every=25)
        if sim.atom_perm is not None and (
            perm_before is None or not np.array_equal(sim.atom_perm, perm_before)
        ):
            migrated_at = it
            e_pre = e_before
            break
    assert migrated_at is not None, (
        "no migration occurred in 200 drifting NVT steps — the continuation "
        "path is untested"
    )
    # the run continues cleanly past the re-sort (this raised before)
    rows = sim.run(50, log_every=25)
    assert len(rows) == 2
    assert not bool(rows[-1]["overflow"])
    # energy continuity: the relabeling itself must not kick the dynamics.
    # Compare the conserved estimate after the post-migration chunks with
    # the pre-migration value: bounded by normal per-chunk NH fluctuation
    # (thermostat work on the injected COM drift), not a jump.
    e_post = conserved(sim.state)
    n_atoms = int(np.asarray(sys_s.valid_mask()).sum())
    scale = max(abs(e_pre), n_atoms * 8.617e-5 * temp_K * 3)
    assert abs(e_post - e_pre) < 0.2 * scale, (e_pre, e_post)
    # the composed permutation maps current -> original indices
    assert sorted(sim.atom_perm) == list(range(sys_s.n_atoms))
