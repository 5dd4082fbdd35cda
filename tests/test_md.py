"""MD runtime tests: conservation, thermostats, overflow regrowth, debug dump."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.engine import AllegroEngine
from pair_allegro_tpu.md.integrate import Simulation, Units
from pair_allegro_tpu.md.thermo import temperature
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
from pair_allegro_tpu.system import System


def _cu_system(rng, n_rep=3, jitter=0.02, dtype=jnp.float64):
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(n_rep) for j in range(n_rep) for k in range(n_rep)])
    pos += jitter * rng.randn(*pos.shape)
    n = pos.shape[0]
    return System.create(pos, np.zeros(n, np.int32), cell=np.eye(3) * a0 * n_rep,
                         masses=np.full(n, 63.546), dtype=dtype)


def _engine(system, rng_key=0, dtype=jnp.float64, **kw):
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(rng_key), cfg, dtype=dtype)
    return AllegroEngine(cfg, params, system, **kw)


def test_nve_energy_conservation(rng):
    system = _cu_system(rng)
    eng = _engine(system)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=0.5 * Units.fs)
    sim.init_velocities(30.0)
    rows = sim.run(100, log_every=20)
    e = [float(r["etotal"]) for r in rows]
    n = system.n_atoms
    # measured ~9e-7 eV/atom at f64/0.5fs; 3x headroom catches integrator
    # regressions that the old 1e-5 bound would let through
    drift = max(abs(x - e[0]) for x in e) / n
    assert drift < 3e-6, f"NVE drift {drift} eV/atom over 100 steps"


def test_nvt_reaches_target_temperature(rng):
    system = _cu_system(rng)
    eng = _engine(system)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs,
                     integrator="nvt", temp_K=150.0, tdamp=0.05)
    sim.init_velocities(40.0)
    sim.run(150, log_every=150)
    temps = [float(r["temp"]) for r in sim.run(100, log_every=20)]
    t_avg = np.mean(temps)
    assert 100.0 < t_avg < 200.0, f"NVT average T {t_avg} K, target 150"


def test_langevin_thermalizes(rng):
    system = _cu_system(rng)
    eng = _engine(system)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs,
                     integrator="langevin", temp_K=120.0, damp=0.05)
    sim.run(150, log_every=150)
    temps = [float(r["temp"]) for r in sim.run(100, log_every=20)]
    t_avg = np.mean(temps)
    assert 70.0 < t_avg < 180.0, f"Langevin average T {t_avg} K, target 120"


def test_nvt_conserved_quantity(rng):
    """The Nosé-Hoover extended Hamiltonian H' = KE + PE + q xi^2/2
    + n_dof kB T xi_int must be conserved (the sensitive thermostat-bug
    detector — plain etotal fluctuates by design under NVT)."""
    from pair_allegro_tpu.md.thermo import nose_hoover_conserved

    system = _cu_system(rng)
    eng = _engine(system)
    temp_K, tdamp = 150.0, 0.05
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=1.0 * Units.fs,
                     integrator="nvt", temp_K=temp_K, tdamp=tdamp)
    sim.init_velocities(100.0)
    vals = []
    sim.run(200, log_every=10,
            callback=lambda st, row: vals.append(
                float(nose_hoover_conserved(st, temp_K, tdamp))))
    n = system.n_atoms
    drift = (max(vals) - min(vals)) / n
    # measured 3.0e-5 eV/atom at f64 / 1 fs / tdamp=50dt, scaling cleanly as
    # dt^2 (7.6e-6 at 0.5 fs -> pure non-secular splitting error); ~5x
    # headroom.  KE+PE alone varies by ~0.35 eV/atom here, so the invariant
    # is a ~1e4x stronger check.
    assert drift < 1.5e-4, f"NH conserved-quantity drift {drift} eV/atom"


def test_npt_mtk_conserved_quantity(rng):
    """MTK invariant H' = KE + PE + q xi^2/2 + W eta^2/2
    + (n_dof+1) kB T xi_int + P_ext V, conserved to splitting order."""
    from pair_allegro_tpu.md.thermo import npt_mtk_conserved

    system = _cu_system(rng, n_rep=2)
    eng = _engine(system, skin=0.3)
    temp_K, tdamp, press_bar, pdamp = 100.0, 0.1, 0.0, 1.0
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=1.0 * Units.fs,
                     integrator="npt", temp_K=temp_K, tdamp=tdamp,
                     press_bar=press_bar, pdamp=pdamp, grow_fn=eng.grow)
    sim.init_velocities(100.0)
    vals = []
    sim.run(200, log_every=10,
            callback=lambda st, row: vals.append(
                float(npt_mtk_conserved(st, temp_K, tdamp, press_bar, pdamp))))
    n = system.n_atoms
    drift = (max(vals) - min(vals)) / n
    # measured 4.1e-5 eV/atom at f64 / 1 fs, oscillatory (non-secular);
    # ~5x headroom
    assert drift < 2e-4, f"MTK conserved-quantity drift {drift} eV/atom"


def test_temperature_dof_convention(rng):
    """compute temp parity: T uses n_dof = 3N-3 and init_velocities hits the
    target exactly under the same convention."""
    system = _cu_system(rng)
    from pair_allegro_tpu.md.integrate import create_velocities
    from pair_allegro_tpu.md.thermo import kinetic_energy

    v = create_velocities(jax.random.PRNGKey(4), system.masses, 137.0,
                          valid=system.valid_mask())
    sys_v = dataclasses.replace(system, velocities=v)
    t = float(temperature(sys_v))
    np.testing.assert_allclose(t, 137.0, rtol=1e-10)
    # explicit convention check: T == 2 KE / ((3N-3) kB)
    ke = float(kinetic_energy(sys_v))
    n = int(np.asarray(system.n_valid))
    np.testing.assert_allclose(t, 2 * ke / ((3 * n - 3) * Units.kB), rtol=1e-12)
    # COM momentum is zero, so the 3 subtracted DOF are genuinely frozen
    p = np.asarray(jnp.sum(system.masses[:, None] * v, axis=0))
    assert np.max(np.abs(p)) < 1e-10


def test_overflow_triggers_regrow(rng):
    """A deliberately undersized neighbor capacity must auto-regrow through
    grow_fn: the first chunk flags overflow, Simulation regrows and retries,
    and the run completes with valid results."""
    from pair_allegro_tpu.engine import make_rebuild_fn

    system = _cu_system(rng, n_rep=2, dtype=jnp.float64)
    eng = _engine(system)
    # sabotage: shrink capacities far below need
    eng.spec = dataclasses.replace(
        eng.spec, max_neighbors=4, cell_capacity=6, max_edges=64
    )
    eng.rebuild_fn = jax.jit(make_rebuild_fn(eng.spec, eng.skin))
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=1.0 * Units.fs,
                     grow_fn=eng.grow)
    sim.init_velocities(20.0)
    rows = sim.run(4, log_every=4)
    assert not bool(rows[-1]["overflow"])
    assert eng.spec.max_neighbors > 4  # grew at least once
    assert np.isfinite(float(rows[-1]["etotal"]))


def test_overflow_without_grow_fn_raises(rng):
    system = _cu_system(rng, dtype=jnp.float64)
    eng = _engine(system)
    from pair_allegro_tpu.engine import make_rebuild_fn

    spec = dataclasses.replace(eng.spec, max_neighbors=4, cell_capacity=6, max_edges=64)
    rebuild = jax.jit(make_rebuild_fn(spec, 0.0))
    sim = Simulation(system, eng.force_fn, rebuild, dt=1.0 * Units.fs)
    with pytest.raises(RuntimeError, match="overflow"):
        sim.run(5, log_every=5)


def test_debug_edge_dump_layout_agreement(rng):
    """edge_set must give the same multiset for FLAT and TABLE layouts and
    match the host oracle."""
    from pair_allegro_tpu.debug import edge_set
    from pair_allegro_tpu.neighbors.device import cell_list_neighbors, choose_grid
    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    cell = np.diag([13.0, 14.0, 15.0])
    pos = rng.rand(250, 3) @ cell
    rc = 4.0
    grid = choose_grid(cell, rc)
    args = (jnp.asarray(pos), jnp.asarray(cell), rc, grid, 64, 64)
    s_flat = edge_set(cell_list_neighbors(*args, flatten=True))
    s_tab = edge_set(cell_list_neighbors(*args, flatten=False))
    assert s_flat == s_tab
    ei, sh = neighbor_list_np(pos, cell, (True,) * 3, rc)
    ref = {(int(ei[0, k]), int(ei[1, k]), *(int(x) for x in sh[k])) for k in range(ei.shape[1])}
    assert s_flat == ref


def test_row_chunked_engine_matches_unchunked(rng):
    """Chunked (lax.scan over center rows) evaluation must equal the
    unchunked engine exactly — the single-chip big-system mode."""
    system = _cu_system(rng, n_rep=5)  # 500 atoms -> cell-list strategy
    eng0 = _engine(system)
    assert eng0.spec.strategy == "cell_list"
    eng1 = _engine(system, row_chunk=125)
    nb0 = eng0.rebuild_fn(system, None)
    nb1 = eng1.rebuild_fn(system, None)
    assert int(np.asarray(nb0.count())) == int(np.asarray(nb1.count()))
    out0 = eng0.force_fn(system, nb0)
    out1 = eng1.force_fn(system, nb1)
    np.testing.assert_allclose(float(out0.total_energy), float(out1.total_energy), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out0.atomic_energy), np.asarray(out1.atomic_energy), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out0.forces), np.asarray(out1.forces), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out0.virial), np.asarray(out1.virial), atol=1e-10)


def test_npt_berendsen_relaxes_pressure(rng):
    """NPT Berendsen: the barostat must drive the cell so the pressure moves
    toward the target (or, equivalently, the volume visibly responds)."""
    system = _cu_system(rng, n_rep=2)
    eng = _engine(system)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=1.0 * Units.fs,
                     integrator="npt_berendsen", temp_K=50.0, tdamp=0.05,
                     press_bar=0.0, pdamp=0.5, bulk_modulus_bar=1.4e6)
    sim.init_velocities(50.0)
    rows0 = sim.run(5, log_every=5)
    p0 = float(rows0[-1]["press"])
    v0 = float(np.linalg.det(np.asarray(sim.state.system.cell)))
    rows = sim.run(200, log_every=200)
    p1 = float(rows[-1]["press"])
    v1 = float(np.linalg.det(np.asarray(sim.state.system.cell)))
    assert np.isfinite(p1)
    # pressure moved toward the target and the cell responded
    assert abs(p1) < abs(p0) or abs(v1 - v0) / v0 > 1e-5


def test_npt_mtk_controls_pressure_and_temperature(rng):
    """fix npt parity: the MTK Nosé-Hoover barostat ('npt') must keep T near
    target and move pressure toward target while the cell responds."""
    system = _cu_system(rng, n_rep=2)
    eng = _engine(system, skin=0.3)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs,
                     integrator="npt", temp_K=100.0, tdamp=0.1,
                     press_bar=0.0, pdamp=1.0, grow_fn=eng.grow)
    sim.init_velocities(100.0)
    rows0 = sim.run(5, log_every=5)
    p0 = float(rows0[-1]["press"])
    v0 = float(np.linalg.det(np.asarray(sim.state.system.cell)))
    sim.run(150, log_every=150)
    rows = sim.run(100, log_every=20)
    p1 = np.mean([float(r["press"]) for r in rows])
    t1 = np.mean([float(r["temp"]) for r in rows])
    v1 = float(np.linalg.det(np.asarray(sim.state.system.cell)))
    assert np.isfinite(p1) and np.isfinite(t1)
    assert 50.0 < t1 < 200.0, f"NPT/MTK average T {t1} K, target 100"
    # pressure relaxed toward target (or the cell visibly responded)
    assert abs(p1) < abs(p0) or abs(v1 - v0) / v0 > 1e-4


def test_contracting_cell_is_detected_not_silent(rng):
    """NPT robustness: a 25% box contraction beyond the built capacity must
    set the overflow flag (device-side geometry check) and, after a
    system-aware regrow, reproduce the naive-oracle edge count — never a
    silently truncated neighbor list (VERDICT r1 #7)."""
    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    system = _cu_system(rng, n_rep=3)  # 108 atoms -> dense strategy
    eng = _engine(system)
    nb = eng.rebuild_fn(system, None)
    assert not bool(np.asarray(nb.overflow))
    # contract the cell enough that more periodic images are needed
    scale = 0.55
    small = dataclasses.replace(
        system, positions=system.positions * scale, cell=system.cell * scale
    )
    nb_bad = eng.rebuild_fn(small, None)
    assert bool(np.asarray(nb_bad.overflow)), "contraction must flag overflow"
    # regrow with the current system: spec re-estimates for the new cell
    rebuild = eng.grow(system=small)
    nb_ok = rebuild(small, None)
    assert not bool(np.asarray(nb_ok.overflow))
    ei, _ = neighbor_list_np(
        np.asarray(small.positions), np.asarray(small.cell), (True,) * 3,
        eng.spec.cutoff,
    )
    assert int(np.asarray(nb_ok.count())) == ei.shape[1]


def test_cell_list_contraction_detected(rng):
    """Same detection for the binned strategy: shrinking bins below the
    cutoff must flag, and regrow(system) must re-pick the grid."""
    system = _cu_system(rng, n_rep=5)  # 500 atoms -> cell_list
    eng = _engine(system)
    assert eng.spec.strategy == "cell_list"
    scale = 0.7  # bins fall below cutoff but grid is still >= 3 per axis
    small = dataclasses.replace(
        system, positions=system.positions * scale, cell=system.cell * scale
    )
    nb_bad = eng.rebuild_fn(small, None)
    assert bool(np.asarray(nb_bad.overflow))
    rebuild = eng.grow(system=small)
    nb_ok = rebuild(small, None)
    assert not bool(np.asarray(nb_ok.overflow))
    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    ei, _ = neighbor_list_np(
        np.asarray(small.positions), np.asarray(small.cell), (True,) * 3,
        eng.spec.cutoff,
    )
    assert int(np.asarray(nb_ok.count())) == ei.shape[1]


def test_row_chunked_engine_matches_unchunked_typed(rng):
    """Chunked evaluation with MULTIPLE types: exercises the typed
    (table_edge_vec_typed + tjf window threading) leg of the r5 gather-based
    chunked force backward — forces/energy/virial exactly equal the
    unchunked engine."""
    import dataclasses as _dc

    system = _cu_system(rng, n_rep=5)
    n = system.n_atoms
    types2 = jnp.asarray((np.arange(n) % 2).astype(np.int32))
    system = _dc.replace(system, types=types2)
    cfg = AllegroConfig(
        type_names=("Cu", "Ag"), r_max=4.0, l_max=1, num_layers=1,
        num_scalar_features=8, num_tensor_features=4, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    eng0 = AllegroEngine(cfg, params, system)
    assert eng0.spec.strategy == "cell_list"
    eng1 = AllegroEngine(cfg, params, system, row_chunk=125)
    nb0 = eng0.rebuild_fn(system, None)
    nb1 = eng1.rebuild_fn(system, None)
    assert nb1.edge_rev is not None  # the chunked rev path actually engaged
    out0 = eng0.force_fn(system, nb0)
    out1 = eng1.force_fn(system, nb1)
    np.testing.assert_allclose(
        float(out0.total_energy), float(out1.total_energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out0.forces), np.asarray(out1.forces), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(out0.virial), np.asarray(out1.virial), atol=1e-10
    )
