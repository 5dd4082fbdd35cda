"""Integrators and the Simulation driver — the MD runtime (LAMMPS-core analog).

The reference delegates integration to LAMMPS ``fix nve`` + ``Verlet::run``
(SURVEY §2.7; tests use fix nve, test_python_repro_allegro.py:105).  Here the
whole step — integrate, neighbor rebuild, model forces — is ONE fused XLA
program iterated with ``lax.scan``; state buffers are donated so the loop runs
entirely on device with zero host round-trips between thermo reads.

Integrators: NVE velocity Verlet, NVT Langevin (BAOAB), NVT Nosé-Hoover
(single chain), NPT Nosé-Hoover/MTK ("npt", the ``fix npt`` family), NPT
Berendsen ("npt_berendsen").  All operate in LAMMPS metal units.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.md.thermo import kinetic_energy, pressure_tensor, temperature, thermo_row
from pair_allegro_tpu.neighbors.device import NeighborData
from pair_allegro_tpu.system import System, Units


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MDState:
    system: System
    neighbors: NeighborData
    forces: jax.Array
    potential_energy: jax.Array
    atomic_energy: jax.Array
    virial: jax.Array
    step: jax.Array
    key: jax.Array
    thermostat: dict[str, Any] = dataclasses.field(default_factory=dict)
    extras: dict[str, Any] = dataclasses.field(default_factory=dict)


def create_velocities(key, masses, temp_K: float, valid=None, zero_momentum: bool = True):
    """Maxwell-Boltzmann velocities at temp_K [A/ps] (LAMMPS ``velocity ...
    create`` analog)."""
    n = masses.shape[0]
    sigma = jnp.sqrt(Units.kB * temp_K / (masses * Units.mvv2e))[:, None]
    v = jax.random.normal(key, (n, 3), dtype=masses.dtype) * sigma
    mask = jnp.ones((n,), bool) if valid is None else valid
    m = (masses * mask)[:, None]
    if zero_momentum:
        v = v - jnp.sum(m * v, axis=0) / jnp.sum(m)
    # rescale to the exact target temperature (n_dof = 3N - 3 after the COM
    # drift removal — the LAMMPS ``velocity create`` / ``compute temp``
    # convention, matching md.thermo.temperature)
    nv = jnp.maximum(jnp.sum(mask), 1)
    ndof = jnp.maximum(3.0 * nv - 3.0, 1.0) if zero_momentum else 3.0 * nv
    ke = 0.5 * Units.mvv2e * jnp.sum(m * v * v)
    t_now = 2.0 * ke / (ndof * Units.kB)
    return v * jnp.sqrt(temp_K / jnp.maximum(t_now, 1e-12)) * mask[:, None]


def _pack_row(row: dict):
    """Flatten a thermo row into two vectors (float leaves, int/bool leaves).

    The host then fetches the whole row in TWO device transfers instead of
    one ``np.asarray`` per key — each scalar fetch is a full host<->device
    round trip, and over a tunneled TPU relay the 9-key row measured ~0.3 s
    per chunk (~5 ms/step at 60-step chunks, 17% of the MD step).  Int/bool
    leaves ride a separate int32 vector so ``step`` stays exact past 2^24.
    """
    leaves, _ = jax.tree.flatten(row)
    is_f = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
    fdts = [l.dtype for l, f in zip(leaves, is_f) if f]
    fdt = jnp.result_type(*fdts) if fdts else jnp.float32
    fvec = [jnp.ravel(l).astype(fdt) for l, f in zip(leaves, is_f) if f]
    # the int vector rides at the RESULT type of all non-float leaves (like
    # the float path) so a wider leaf (int64 under x64, uint32, ...) widens
    # the transfer instead of silently wrapping through int32
    idts = [l.dtype for l, f in zip(leaves, is_f) if not f]
    idt = jnp.result_type(jnp.int32, *idts) if idts else jnp.int32
    ivec = [jnp.ravel(l).astype(idt) for l, f in zip(leaves, is_f) if not f]

    def cat(xs, dt):
        return jnp.concatenate(xs) if xs else jnp.zeros((0,), dt)

    return cat(fvec, fdt), cat(ivec, idt)


def _unpack_row(fvec, ivec, row_avals) -> dict:
    """Inverse of `_pack_row` on the host, restoring shapes/dtypes from the
    `jax.eval_shape(thermo_row, state)` avals."""
    leaves_avals, treedef = jax.tree.flatten(row_avals)
    fvec, ivec = np.asarray(fvec), np.asarray(ivec)
    out, fo, io = [], 0, 0
    for a in leaves_avals:
        n = int(np.prod(a.shape, dtype=int))
        if jnp.issubdtype(a.dtype, jnp.floating):
            v, fo = fvec[fo : fo + n], fo + n
        else:
            v, io = ivec[io : io + n], io + n
        out.append(v.reshape(a.shape).astype(a.dtype))
    return jax.tree.unflatten(treedef, out)


def _accel(forces, masses):
    return forces * (Units.ftm2a / masses)[:, None]


def _evaluate(force_fn, system, neighbors):
    out = force_fn(system, neighbors)
    return dict(
        forces=out.forces,
        potential_energy=out.total_energy,
        atomic_energy=out.atomic_energy,
        virial=out.virial,
        extras=out.extras,
    )


def nve_step(state: MDState, force_fn, rebuild_fn, dt: float) -> MDState:
    """Velocity Verlet (fix nve)."""
    sys_ = state.system
    v_half = sys_.velocities + (0.5 * dt) * _accel(state.forces, sys_.masses)
    pos = sys_.positions + dt * v_half
    sys_ = dataclasses.replace(sys_, positions=pos)
    neighbors = rebuild_fn(sys_, state.neighbors)
    out = _evaluate(force_fn, sys_, neighbors)
    v_new = v_half + (0.5 * dt) * _accel(out["forces"], sys_.masses)
    sys_ = dataclasses.replace(sys_, velocities=v_new)
    return dataclasses.replace(
        state, system=sys_, neighbors=neighbors, step=state.step + 1, **out
    )


def langevin_step(
    state: MDState, force_fn, rebuild_fn, dt: float, temp_K: float, damp: float
) -> MDState:
    """BAOAB Langevin (fix langevin analog). `damp` is the time constant [ps]."""
    sys_ = state.system
    m = sys_.masses
    v = sys_.velocities + (0.5 * dt) * _accel(state.forces, m)
    pos = sys_.positions + (0.5 * dt) * v
    # O: Ornstein-Uhlenbeck
    key, sub = jax.random.split(state.key)
    c1 = jnp.exp(-dt / damp)
    sigma = jnp.sqrt((1.0 - c1**2) * Units.kB * temp_K / (m * Units.mvv2e))[:, None]
    noise = jax.random.normal(sub, v.shape, dtype=v.dtype)
    v = c1 * v + sigma * noise
    v = v * sys_.valid_mask()[:, None]
    pos = pos + (0.5 * dt) * v
    sys_ = dataclasses.replace(sys_, positions=pos)
    neighbors = rebuild_fn(sys_, state.neighbors)
    out = _evaluate(force_fn, sys_, neighbors)
    v = v + (0.5 * dt) * _accel(out["forces"], m)
    sys_ = dataclasses.replace(sys_, velocities=v)
    return dataclasses.replace(
        state, system=sys_, neighbors=neighbors, step=state.step + 1, key=key, **out
    )


def nose_hoover_step(
    state: MDState, force_fn, rebuild_fn, dt: float, temp_K: float, tdamp: float
) -> MDState:
    """Nosé-Hoover thermostat (fix nvt analog), single chain, velocity-Verlet
    split: half thermostat — half kick — drift — force — half kick — half
    thermostat."""
    sys_ = state.system
    n_dof = 3.0 * jnp.maximum(sys_.n_valid, 1) - 3.0
    q = n_dof * Units.kB * temp_K * tdamp**2  # thermostat "mass"
    xi = state.thermostat.get("xi", jnp.zeros((), sys_.positions.dtype))
    # xi_int = integral of xi dt (thermostat "position"): needed only for the
    # conserved extended Hamiltonian (md.thermo.nose_hoover_conserved) —
    # advanced exactly where velocities are scaled
    xi_int = state.thermostat.get("xi_int", jnp.zeros((), sys_.positions.dtype))

    def ke2_of(v):
        return Units.mvv2e * jnp.sum((sys_.masses * sys_.valid_mask())[:, None] * v * v)

    def thermo_half(v, xi, xi_int):
        # symmetric quarter-step update (xi kick — scale — xi kick): the
        # asymmetric form (always kick-then-scale) is only first order and
        # drifts the extended Hamiltonian secularly
        kbt = n_dof * Units.kB * temp_K
        xi = xi + (0.25 * dt) * (ke2_of(v) - kbt) / q
        v = v * jnp.exp(-xi * 0.5 * dt)
        xi_int = xi_int + xi * (0.5 * dt)
        xi = xi + (0.25 * dt) * (ke2_of(v) - kbt) / q
        return v, xi, xi_int

    v, xi, xi_int = thermo_half(sys_.velocities, xi, xi_int)
    v = v + (0.5 * dt) * _accel(state.forces, sys_.masses)
    pos = sys_.positions + dt * v
    sys_ = dataclasses.replace(sys_, positions=pos)
    neighbors = rebuild_fn(sys_, state.neighbors)
    out = _evaluate(force_fn, sys_, neighbors)
    v = v + (0.5 * dt) * _accel(out["forces"], sys_.masses)
    v, xi, xi_int = thermo_half(v, xi, xi_int)
    sys_ = dataclasses.replace(sys_, velocities=v)
    return dataclasses.replace(
        state,
        system=sys_,
        neighbors=neighbors,
        step=state.step + 1,
        thermostat={"xi": xi, "xi_int": xi_int},
        **out,
    )


def npt_berendsen_step(
    state: MDState,
    force_fn,
    rebuild_fn,
    dt: float,
    temp_K: float,
    tdamp: float,
    press_bar: float,
    pdamp: float,
    bulk_modulus_bar: float = 1.0e6,
) -> MDState:
    """Berendsen NPT: Nosé-Hoover on temperature + isotropic Berendsen
    barostat rescaling cell and positions toward target pressure."""
    st = nose_hoover_step(state, force_fn, rebuild_fn, dt, temp_K, tdamp)
    sys_ = st.system
    p_now = jnp.trace(pressure_tensor(sys_, st.virial)) / 3.0
    eta = (1.0 - dt / pdamp * (press_bar - p_now) / bulk_modulus_bar) ** (1.0 / 3.0)
    sys_ = dataclasses.replace(sys_, positions=sys_.positions * eta, cell=sys_.cell * eta)
    return dataclasses.replace(st, system=sys_)


def npt_mtk_step(
    state: MDState,
    force_fn,
    rebuild_fn,
    dt: float,
    temp_K: float,
    tdamp: float,
    press_bar: float,
    pdamp: float,
) -> MDState:
    """Isotropic Nosé-Hoover/MTK NPT (the ``fix npt`` family; Martyna-
    Tobias-Klein with the Tuckerman velocity-Verlet splitting, single
    thermostat chain).  Thermostat velocity ``xi`` and barostat strain rate
    ``eta`` live in state.thermostat; the cell scales isotropically by
    ``exp(eta dt)`` per step."""
    sys_ = state.system
    dtype = sys_.positions.dtype
    m = sys_.masses
    mask = sys_.valid_mask()
    n_dof = 3.0 * jnp.maximum(sys_.n_valid, 1) - 3.0
    kT = Units.kB * temp_K
    q = n_dof * kT * tdamp**2
    w = (n_dof + 3.0) * kT * pdamp**2
    p_ext = press_bar / Units.nktv2p  # bar -> eV/A^3
    xi = state.thermostat.get("xi", jnp.zeros((), dtype))
    eta = state.thermostat.get("eta", jnp.zeros((), dtype))
    # thermostat position integral (conserved-quantity bookkeeping only,
    # md.thermo.npt_mtk_conserved); the thermostat scales particles by
    # exp(-dt2 xi) and the barostat DOF by exp(-dt4 xi) twice per half call,
    # both consistent with xi_int += dt2 * xi at the midpoint
    xi_int = state.thermostat.get("xi_int", jnp.zeros((), dtype))
    dt2, dt4 = 0.5 * dt, 0.25 * dt

    def ke2_of(v):  # 2*KE in eV
        return Units.mvv2e * jnp.sum((m * mask)[:, None] * v * v)

    def baro_thermo_half(v, xi, eta, xi_int, virial):
        # barostat force: G_eta = [3V (P_int - P_ext) + (3/N_f) 2KE] / W
        vol = jnp.abs(jnp.linalg.det(sys_.cell * jnp.exp(0.0)))  # current V
        ke2 = ke2_of(v)
        p_int = (ke2 / 3.0 + jnp.trace(virial) / 3.0) / vol  # eV/A^3
        g_eta = (3.0 * vol * (p_int - p_ext) + 3.0 * ke2 / n_dof) / w
        eta = eta + dt4 * g_eta
        # thermostat couples particles + barostat DOF
        g_xi = (ke2 + w * eta * eta - (n_dof + 1.0) * kT) / q
        xi = xi + dt4 * g_xi
        eta = eta * jnp.exp(-dt4 * xi)
        v = v * jnp.exp(-dt2 * (xi + (1.0 + 3.0 / n_dof) * eta))
        xi_int = xi_int + dt2 * xi
        eta = eta * jnp.exp(-dt4 * xi)
        xi = xi + dt4 * ((ke2_of(v) + w * eta * eta - (n_dof + 1.0) * kT) / q)
        vol = jnp.abs(jnp.linalg.det(sys_.cell))
        ke2 = ke2_of(v)
        p_int = (ke2 / 3.0 + jnp.trace(virial) / 3.0) / vol
        eta = eta + dt4 * ((3.0 * vol * (p_int - p_ext) + 3.0 * ke2 / n_dof) / w)
        return v, xi, eta, xi_int

    v, xi, eta, xi_int = baro_thermo_half(sys_.velocities, xi, eta, xi_int, state.virial)
    v = v + dt2 * _accel(state.forces, m)
    # drift with isotropic cell scaling: r' = e^{dt eta} r + dt v e^{dt eta/2} sinhx
    x_ = dt2 * eta
    sinhx = 1.0 + (x_ * x_) / 6.0 + (x_**4) / 120.0  # sinh(x)/x
    scale = jnp.exp(dt * eta)
    pos = sys_.positions * scale + dt * v * jnp.exp(x_) * sinhx
    cell = sys_.cell * scale
    sys_ = dataclasses.replace(sys_, positions=pos, cell=cell)
    neighbors = rebuild_fn(sys_, state.neighbors)
    out = _evaluate(force_fn, sys_, neighbors)
    v = v + dt2 * _accel(out["forces"], m)
    sys_ = dataclasses.replace(sys_, velocities=v)
    v, xi, eta, xi_int = baro_thermo_half(v, xi, eta, xi_int, out["virial"])
    sys_ = dataclasses.replace(sys_, velocities=v * mask[:, None])
    return dataclasses.replace(
        state,
        system=sys_,
        neighbors=neighbors,
        step=state.step + 1,
        thermostat={"xi": xi, "eta": eta, "xi_int": xi_int},
        **out,
    )


_INTEGRATORS: dict[str, Callable] = {
    "nve": nve_step,
    "langevin": langevin_step,
    "nvt": nose_hoover_step,
    "npt": npt_mtk_step,
    "npt_berendsen": npt_berendsen_step,
}


class Simulation:
    """High-level MD driver (the LAMMPS input-script analog).

    Example::

        sim = Simulation(system, force_fn, rebuild_fn, dt=0.001)
        sim.init_velocities(300.0)
        trace = sim.run(1000, log_every=100)

    `force_fn(system, neighbors) -> ModelOutputs`;
    `rebuild_fn(system, prev: NeighborData) -> NeighborData`.

    Steps run in jitted `lax.scan` chunks with donated state.  After each
    chunk the host checks the neighbor-capacity overflow flag (the analog of
    the Kokkos padded-buffer growth, pair_nequip_allegro_kokkos.cpp:218-229)
    and raises if work was lost — callers regrow via `grow_fn` when given.
    """

    # per-chunk step cap (see run()): bounds the re-run cost of an overflow
    # near the start of a huge log_every window
    MAX_CHUNK = 2000

    def __init__(
        self,
        system: System,
        force_fn,
        rebuild_fn,
        dt: float = 1.0e-3,
        integrator: str = "nve",
        seed: int = 0,
        grow_fn: Callable[[], Callable] | None = None,
        shrink_fn: Callable[..., Callable | None] | None = None,
        shrink_every: int = 10,
        migrate_fn: Callable[..., tuple] | None = None,
        **integrator_kwargs,
    ):
        self.force_fn = force_fn
        self.rebuild_fn = rebuild_fn
        self.dt = float(dt)
        self.integrator = integrator
        self.integrator_kwargs = integrator_kwargs
        self.grow_fn = grow_fn
        # atom-migration hook (HaloShardedAllegroEngine.maybe_migrate): called
        # with the current system at every chunk boundary; a non-None first
        # return is the re-sorted replacement system (LAMMPS re-assigns atoms
        # to subdomains at every reneighboring, SURVEY §2.5 — fixed jit index
        # windows move that to chunk granularity).  `atom_perm` accumulates
        # the composed permutation CURRENT index -> ORIGINAL index (None =
        # identity) so callers can undo the re-orderings for output.
        self.migrate_fn = migrate_fn
        self.atom_perm: np.ndarray | None = None
        # capacity SHRINK hook (engine.PairEngine.maybe_shrink): called with
        # the current system every `shrink_every` successful chunks; a
        # non-None return is the new (smaller-capacity) rebuild_fn — the
        # other half of the Kokkos realloc hysteresis
        # (pair_nequip_allegro_kokkos.cpp:218-229)
        self.shrink_fn = shrink_fn
        self.shrink_every = max(1, int(shrink_every))
        self._chunks_since_shrink = 0
        neighbors = rebuild_fn(system, None)
        out = _evaluate(force_fn, system, neighbors)
        # thermostat state must exist up-front: lax.scan carries need a
        # fixed pytree structure
        dtype = system.positions.dtype
        thermostat = {}
        if integrator in ("nvt", "npt", "npt_berendsen"):
            thermostat["xi"] = jnp.zeros((), dtype)
            thermostat["xi_int"] = jnp.zeros((), dtype)
        if integrator == "npt":
            thermostat["eta"] = jnp.zeros((), dtype)
        self.state = MDState(
            system=system,
            neighbors=neighbors,
            step=jnp.zeros((), jnp.int32),
            key=jax.random.PRNGKey(seed),
            thermostat=thermostat,
            **out,
        )
        self._chunk_cache: dict = {}
        self._row_avals = None  # filled on first chunk (structure is fixed)

    def init_velocities(self, temp_K: float, seed: int = 1):
        sys_ = self.state.system
        v = create_velocities(
            jax.random.PRNGKey(seed), sys_.masses, temp_K, valid=sys_.valid_mask()
        )
        self.state = dataclasses.replace(
            self.state, system=dataclasses.replace(sys_, velocities=v)
        )

    def _step_fn(self):
        step = _INTEGRATORS[self.integrator]
        return functools.partial(
            step,
            force_fn=self.force_fn,
            rebuild_fn=self.rebuild_fn,
            dt=self.dt,
            **self.integrator_kwargs,
        )

    def _chunk_runner(self, n_sub: int):
        if n_sub not in self._chunk_cache:
            step = self._step_fn()

            @functools.partial(jax.jit, donate_argnums=0)
            def chunk(state):
                def body(s, _):
                    return step(s), None

                state, _ = jax.lax.scan(body, state, None, length=n_sub)
                return state, _pack_row(thermo_row(state))

            self._chunk_cache[n_sub] = chunk
        return self._chunk_cache[n_sub]

    def _regrow(self, backup: MDState) -> None:
        """Grow neighbor capacities and rebuild the state from `backup`
        (the Kokkos padded-buffer realloc analog,
        pair_nequip_allegro_kokkos.cpp:218-229, done at chunk granularity).
        When grow_fn accepts a `system`, the CURRENT geometry is passed so
        the spec re-estimates for a changed (NPT) cell."""
        try:
            self.rebuild_fn = self.grow_fn(system=backup.system)
        except TypeError:
            self.rebuild_fn = self.grow_fn()
        self._chunk_cache.clear()
        neighbors = self.rebuild_fn(backup.system, None)
        out = _evaluate(self.force_fn, backup.system, neighbors)
        self.state = dataclasses.replace(backup, neighbors=neighbors, **out)

    def run(self, n_steps: int, log_every: int = 100, callback=None) -> list[dict]:
        """Run n_steps; returns thermo rows every `log_every` steps.

        On neighbor-capacity overflow: with `grow_fn` set, capacities grow,
        the chunk is re-run from its snapshot (state buffers are donated, so
        a pre-chunk copy is kept whenever grow_fn is present); without it,
        overflow is a hard error — work in the chunk is invalid either way,
        never silently truncated.  Chunks are capped at 2000 steps so an
        overflow near the start of a huge `log_every` window bounds the
        re-run cost (the overflow flag is only observable at chunk
        boundaries).
        """
        log_every = max(1, min(log_every, n_steps, self.MAX_CHUNK))
        rows = []
        done = 0
        migrate_retries = 0
        keep_backup = self.grow_fn is not None or self.migrate_fn is not None
        while done < n_steps:
            n_sub = min(log_every, n_steps - done)
            runner = self._chunk_runner(n_sub)
            backup = jax.tree.map(jnp.copy, self.state) if keep_backup else None
            if self._row_avals is None:
                self._row_avals = jax.eval_shape(thermo_row, self.state)
            self.state, packed = runner(self.state)
            row = _unpack_row(*packed, self._row_avals)
            if bool(row["overflow"]):
                # drift past the halo coverage margin also raises the
                # overflow flag — try re-sorting first (no capacity change);
                # a second overflow on the retried chunk is then genuine
                # capacity and takes the grow path with drift ~0
                if self.migrate_fn is not None and self._apply_migration(backup):
                    # unlike grow (monotone capacity), a re-sort can trip
                    # again within the SAME chunk if atoms outrun the margin
                    # in n_sub steps — cap the retries so a too-long chunk
                    # fails loudly instead of looping
                    migrate_retries += 1
                    if migrate_retries > 8:
                        raise RuntimeError(
                            "atom drift exceeds the halo coverage margin "
                            f"within a single {n_sub}-step chunk even after "
                            "8 re-sorts — use a shorter log_every/chunk, "
                            "more halo hops, or a larger skin"
                        )
                    continue  # retry the same chunk in the new decomposition
                if self.grow_fn is None:
                    raise RuntimeError(
                        "neighbor capacity overflow during chunk — increase "
                        "max_neighbors/max_edges or pass grow_fn "
                        "(results in this chunk are invalid)"
                    )
                self._regrow(backup)
                continue  # retry the same chunk at the new capacity
            rows.append(row)
            if callback is not None:
                callback(self.state, row)
            done += n_sub
            migrate_retries = 0  # cap is per-chunk, not per-run
            if self.migrate_fn is not None:
                # proactive re-sort at half margin: no work is lost when the
                # decomposition is refreshed BEFORE the in-chunk guard trips
                self._apply_migration(self.state)
            if self.shrink_fn is not None:
                self._chunks_since_shrink += 1
                if self._chunks_since_shrink >= self.shrink_every:
                    self._chunks_since_shrink = 0
                    self._maybe_shrink()
        return rows

    def _apply_migration(self, base_state: "MDState") -> bool:
        """Adopt a re-sorted system from `migrate_fn` (atom re-assignment to
        subdomains).  Replaces the system in `base_state`, rebuilds neighbor
        arrays + outputs, composes `atom_perm`.  Thermostat scalars, PRNG and
        step carry over unchanged — the re-sort is a pure relabeling (plus a
        PBC wrap), under which all dynamical invariants are preserved."""
        new_sys, perm, new_rebuild = self.migrate_fn(system=base_state.system)
        if new_sys is None:
            return False
        if new_rebuild is not None:
            # halo topology changed (more hops): step closures hold the old
            # rebuild_fn — drop the compiled chunks
            self.rebuild_fn = new_rebuild
            self._chunk_cache.clear()
        neighbors = self.rebuild_fn(new_sys, None)
        out = _evaluate(self.force_fn, new_sys, neighbors)
        self.state = dataclasses.replace(
            base_state, system=new_sys, neighbors=neighbors, **out
        )
        if perm is not None:
            perm = np.asarray(perm)
            self.atom_perm = (
                self.atom_perm[perm] if self.atom_perm is not None else perm
            )
        return True

    def _maybe_shrink(self) -> None:
        """Adopt a shrunk neighbor capacity mid-run: rebind rebuild_fn,
        rebuild the (smaller) neighbor arrays for the CURRENT positions, and
        keep the rest of the state — unlike _regrow, no work was lost, so
        forces/energies stay valid."""
        new_rebuild = self.shrink_fn(system=self.state.system)
        if new_rebuild is None:
            return
        self.rebuild_fn = new_rebuild
        self._chunk_cache.clear()
        neighbors = self.rebuild_fn(self.state.system, None)
        # re-evaluate: edge-shaped outputs (edge_energy extras, ...) carry the
        # capacity K in their shapes and must match the new neighbor arrays
        out = _evaluate(self.force_fn, self.state.system, neighbors)
        self.state = dataclasses.replace(self.state, neighbors=neighbors, **out)
