"""Engine assembly — the pair-style glue layer.

This is the direct counterpart of ``PairNequIPAllegro`` (the reference's own
code, /root/reference/pair_nequip_allegro.cpp): it binds a model (config +
params), a type-name mapping, and a neighbor strategy into the two closures
the MD runtime consumes — ``force_fn`` and ``rebuild_fn`` — plus capacity
management (the Kokkos padded-buffer hysteresis, grow on overflow).

Key parity points:
* type-name mapping table (pair_nequip_allegro.cpp:274-301)
* per-edge-type cutoff matrix semantics (:303-328) — neighbor lists are
  built at the max cutoff; finer per-type filtering happens in the model's
  cutoff envelope (same observable behavior as the reference's re-filtering
  in preprocess, :488-512, because edges beyond their type cutoff contribute
  exactly zero through the polynomial envelope)
* model metadata is self-describing (cfg carries r_max, type_names, ...),
  like the compiled-artifact metadata the reference parses (:214-222).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy
from pair_allegro_tpu.neighbors.device import (
    NeighborData,
    cell_list_neighbors,
    choose_grid,
    dense_neighbors,
    static_image_shifts,
)
from pair_allegro_tpu.potential import make_potential
from pair_allegro_tpu.system import System


class TypeMapper:
    """Map user type names to model type indices
    (pair_nequip_allegro.cpp:274-294: ``coeff`` args are type names which must
    exist in the model's ``type_names`` metadata)."""

    def __init__(self, model_type_names: tuple[str, ...]):
        self.model_type_names = tuple(model_type_names)
        self._index = {n: i for i, n in enumerate(self.model_type_names)}

    def map_names(self, names) -> np.ndarray:
        try:
            return np.asarray([self._index[n] for n in names], dtype=np.int32)
        except KeyError as e:  # hard error like the reference (:287-292)
            raise KeyError(
                f"type name {e} not found in model type names {self.model_type_names}"
            ) from None


@dataclasses.dataclass
class NeighborSpec:
    """Resolved neighbor strategy + capacities for a fixed system shape."""

    strategy: str  # "dense" | "cell_list"
    cutoff: float
    max_edges: int
    shifts_table: np.ndarray | None = None
    grid: tuple[int, int, int] | None = None
    cell_capacity: int = 0
    max_neighbors: int = 0
    # symmetrized per-edge-type BUILD cutoffs incl. skin (cell_list only):
    # candidates beyond cutoff_table[t_i, t_j] are dropped at build time (the
    # reference's preprocess count-pass filter,
    # pair_nequip_allegro.cpp:488-512) so K is sized by the TYPED count
    cutoff_table: np.ndarray | None = None


def typed_cutoff_table(cfg, skin: float) -> np.ndarray | None:
    """Symmetrized per-edge-type build-time cutoff table (+skin), or None
    when the model's cutoff matrix is uniform (scalar build suffices).

    Symmetrization (max of the two directions) keeps reverse_table's edge
    bijection: if (i,j) is kept so is (j,i).  An asymmetric true cutoff is
    still honored exactly — the model's polynomial envelope zeroes the
    over-kept direction (engine.py module docstring)."""
    m = np.asarray(cfg.cutoff_matrix(), dtype=np.float64)
    # the neighbor search never exceeds r_max (the reference builds lists at
    # the scalar model cutoff, pair_nequip_allegro.cpp:153-156)
    m = np.minimum(m, cfg.r_max)
    sym = np.maximum(m, m.T)
    if np.allclose(sym, sym.flat[0]):
        return None
    return sym + skin


def _estimate_capacities(
    system: System,
    cutoff: float,
    skin: float,
    capacity_factor: float,
    cutoff_table: np.ndarray | None = None,
) -> NeighborSpec:
    """Pick strategy and padded capacities from the initial geometry.

    capacity_factor is the padding hysteresis slack — the reference's Kokkos
    path uses 1.05 (pair_nequip_allegro_kokkos.cpp:218); we default larger
    because rebuild-triggered recompiles are costlier than a few % of padded
    FLOPs on TPU.
    """
    from pair_allegro_tpu.neighbors.naive import host_neighbor_stats

    pos = np.asarray(system.positions, dtype=np.float64)
    cell = np.asarray(system.cell, dtype=np.float64)
    mask = np.asarray(system.valid_mask())
    rc = cutoff + skin
    n = pos.shape[0]
    # the binned build min-images every axis — only valid for full PBC;
    # mixed boundaries (LAMMPS `boundary p s`) take the dense strategy
    grid = choose_grid(cell, rc) if all(system.pbc) else None
    # typed filtering covers BOTH strategies: in the cell list it sizes the
    # per-row K (padding multiplies ALL per-edge kernel work), in the dense
    # build it sizes max_edges for small/mixed-PBC heterogeneous systems
    # (round-4 review "missing" #4)
    typed = cutoff_table is not None
    # O(N) binned initial count on valid atoms only
    n_edges, max_count = host_neighbor_stats(
        pos[mask],
        cell if any(system.pbc) else None,
        system.pbc,
        rc,
        types=np.asarray(system.types)[mask] if typed else None,
        cutoff_matrix=cutoff_table if typed else None,
    )
    if grid is not None and n > 256:
        # per-atom table capacity: bound by the observed MAX count (the avg
        # is not a per-row constraint) with 20% + 2 dynamics slack.  MEASURED
        # (round 3): a tight Kokkos-style 5% margin overflows within 60 bench
        # steps — per-row max counts swing far more than the total edge count
        # the reference's 1.05 buffer slack governs
        # (pair_nequip_allegro_kokkos.cpp:218); the bench's random-weight PES
        # self-heats to ~5000 K and max_count rises 44 -> 55 while the MEAN
        # falls.  Overflow stays recoverable (Simulation regrow-and-retry).
        # PAT_K_MAX forces a value for capacity experiments.
        k_env = int(os.environ.get("PAT_K_MAX", "0"))
        k_max = k_env or _round_k(max_count + max(8, -(-max_count // 5)))
        # bin occupancy estimate: atoms per bin * slack
        per_bin = n / np.prod(grid)
        cell_cap = int(np.ceil(per_bin * capacity_factor)) + 8
        return NeighborSpec(
            strategy="cell_list",
            cutoff=rc,
            max_edges=n * k_max,
            grid=grid,
            cell_capacity=cell_cap,
            max_neighbors=k_max,
            cutoff_table=cutoff_table if typed else None,
        )
    shifts = static_image_shifts(cell, system.pbc, rc)
    cap = int(np.ceil(n_edges * capacity_factor / 128.0)) * 128 + 128
    return NeighborSpec(
        strategy="dense", cutoff=rc, max_edges=cap, shifts_table=shifts,
        cutoff_table=cutoff_table if typed else None,
    )


def _round_k(k_max: int) -> int:
    """Round the per-atom neighbor capacity up to the smallest KERNEL-LEGAL
    value: a K for which some m gives a 128-aligned edge block (128 | K*m)
    within the fused kernels' scoped-VMEM lane cap at flagship dims
    (ops/pallas_stack._env_block_geometry) — multiples of 16 qualify at
    {32, 48, 64, 96, 128}, then multiples of 128.  Tightness matters: the
    table layout computes every padded slot, so K=48 instead of 64 at a
    typical ~44-neighbor config cuts 25% of ALL per-edge kernel work."""
    if k_max <= 24:
        # small K: any multiple of 8 is kernel-legal (m = 128/gcd(K,128)
        # gives a 128-aligned block within the 512-lane cap)
        return max(8, -(-k_max // 8) * 8)
    k = -(-k_max // 16) * 16
    while k < 512:
        if any((k * m) % 128 == 0 and k * m <= 512 for m in range(1, 9)):
            return k
        k += 16
    # beyond the block cap the env-fused geometry bails to the non-fused
    # path anyway (alignment only needs 128 | K*m for some m)
    return -(-k_max // 128) * 128


def _resolve_remat(cfg, spec: NeighborSpec, n_atoms: int):
    """Resolve cfg.remat == "auto": turn remat off when per-layer residuals
    (the V/env per-edge tensors the fused-TP VJP saves) fit comfortably in
    HBM — measured ~1.5x faster; keep it on at scale."""
    if getattr(cfg, "remat", None) != "auto":
        return cfg
    n_edges = (
        n_atoms * spec.max_neighbors if spec.strategy == "cell_list" else spec.max_edges
    )
    d = (getattr(cfg, "l_max", 2) + 1) ** 2
    c = getattr(cfg, "num_tensor_features", getattr(cfg, "num_features", 32))
    layers = getattr(cfg, "num_layers", 3)
    resid_bytes = n_edges * (2 * c * d + 128) * 4 * layers * 2
    return dataclasses.replace(cfg, remat=resid_bytes > 8 * 1024**3)


def make_rebuild_fn(
    spec: NeighborSpec, skin: float = 0.0, row_chunk: int | None = None
) -> Callable:
    """rebuild_fn(system, prev) -> NeighborData, callable inside jit.

    With skin > 0, implements Verlet-list semantics (LAMMPS ``neigh_modify
    check yes``): the list is built at cutoff+skin and only rebuilt when any
    atom moved more than skin/2 since the last build.  Exactness is
    preserved because (a) the model's polynomial envelope zeroes edges
    beyond their type cutoff, and (b) positions are never wrapped during MD,
    so stored lattice shifts stay valid indefinitely — only membership ages.

    With row_chunk, the cell-list candidate scan runs sequentially over
    center-row windows (lax.scan) so the (N, 27*cap) candidate matrix never
    exists at full size — the million-atom single-chip mode.
    """

    def build(system: System) -> NeighborData:
        mask = system.valid_mask()
        if spec.strategy == "cell_list" and row_chunk:
            n = system.n_atoms
            # O(N) binning hoisted out of the window scan (it used to be
            # recomputed once per center window)
            from pair_allegro_tpu.neighbors.device import build_cell_bins

            typed = spec.cutoff_table is not None
            bins_data = build_cell_bins(
                system.positions, system.cell, spec.cutoff, spec.grid,
                spec.cell_capacity, mask,
                types=system.types if typed else None,
            )

            def body(_, q0):
                nd = cell_list_neighbors(
                    system.positions,
                    system.cell,
                    spec.cutoff,
                    spec.grid,
                    spec.cell_capacity,
                    spec.max_neighbors,
                    atom_mask=mask,
                    query_start=q0,
                    n_query=row_chunk,
                    flatten=False,
                    bins_data=bins_data,
                    types=system.types if typed else None,
                    cutoff_table=spec.cutoff_table,
                )
                return None, (nd.edge_index, nd.edge_shifts, nd.edge_mask, nd.overflow)

            starts = jnp.arange(0, n, row_chunk, dtype=jnp.int32)
            _, (ei, esh, em, ov) = jax.lax.scan(body, None, starts)
            nd = NeighborData(
                edge_index=ei.reshape(n, -1),
                edge_shifts=esh.reshape(n, -1, 3),
                edge_mask=em.reshape(n, -1),
                overflow=jnp.any(ov),
            )
            # reverse-edge map for the chunked force backward: without it the
            # per-window dpos accumulation is a serializing scatter-add —
            # MEASURED 2.57 s of the 9.74 s 1M-atom force eval (r5 trace,
            # benchmarks/profile_scale.py); reverse_table runs in row blocks,
            # so the (N, K, K) comparison never materializes
            from pair_allegro_tpu.neighbors.device import reverse_table

            nd = dataclasses.replace(
                nd, edge_rev=reverse_table(nd.edge_index, nd.edge_shifts)
            )
        elif spec.strategy == "cell_list":
            # TABLE layout: scatter-free aggregation in the models (see
            # allegro_energy docstring)
            nd = cell_list_neighbors(
                system.positions,
                system.cell,
                spec.cutoff,
                spec.grid,
                spec.cell_capacity,
                spec.max_neighbors,
                atom_mask=mask,
                flatten=False,
                types=system.types if spec.cutoff_table is not None else None,
                cutoff_table=spec.cutoff_table,
            )
            # reverse-edge map: turns the force backward's scatter-add into
            # a gather (ops.scatter.table_edge_vec) — built once per
            # reneighboring, amortized over the Verlet-skin lifetime
            from pair_allegro_tpu.neighbors.device import reverse_table

            nd = dataclasses.replace(
                nd, edge_rev=reverse_table(nd.edge_index, nd.edge_shifts)
            )
        else:
            nd = dense_neighbors(
                system.positions,
                system.cell,
                spec.shifts_table,
                spec.cutoff,
                spec.max_edges,
                atom_mask=mask,
                pbc=system.pbc,
                types=system.types if spec.cutoff_table is not None else None,
                cutoff_table=spec.cutoff_table,
            )
        if skin > 0.0:
            # jnp.copy, NOT an alias: the eager initial build puts
            # ref_positions into the same donated state pytree as
            # system.positions — one buffer donated twice is a hard XLA
            # error (observed on the CPU backend; jit-internal rebuilds
            # produce fresh output buffers either way)
            nd = dataclasses.replace(nd, ref_positions=jnp.copy(system.positions))
        return nd

    def rebuild(system: System, prev: NeighborData | None) -> NeighborData:
        if prev is None or skin <= 0.0 or prev.ref_positions is None:
            return build(system)
        disp2 = system.positions - prev.ref_positions
        disp2 = jnp.sum(disp2 * disp2, axis=-1)
        disp2 = jnp.max(jnp.where(system.valid_mask(), disp2, 0.0))
        return jax.lax.cond(
            disp2 > (0.5 * skin) ** 2, build, lambda s: prev, system
        )

    return rebuild


def _make_chunked_energy(model_energy, params, cfg, row_chunk: int):
    """Sequential center-row chunking of a TABLE-layout energy (lax.scan +
    per-chunk rematerialization): bounds per-edge live memory to one chunk,
    the single-chip path to million-atom systems.  Exact because the model
    is strictly local per center row (the same property the sharded engine
    and the reference's MPI mode rely on, pair_nequip_allegro.cpp:86-89).

    The returned energy_fn accepts ``center_offset`` (traced OK) so the
    sharded engine can run it inside shard_map over its own center window —
    the combination that scales million-atom systems across the mesh.
    Extra model outputs are carried through: per-CENTER extras (leading dim
    == row_chunk per window) are reassembled to the full window; anything
    else is treated as extensive and summed over windows.
    """

    def energy_fn(
        positions,
        types,
        edge_index,
        *,
        cell=None,
        edge_shifts=None,
        atom_mask=None,
        edge_mask=None,
        center_offset=0,
        edge_rev=None,
    ):
        n, k = edge_index.shape
        c = n // row_chunk
        am = jnp.ones((n,), bool) if atom_mask is None else atom_mask
        # With a reverse table, the edge vectors are gathered ONCE outside
        # the window scan through table_edge_vec's custom VJP: each window's
        # d(vec) then lands in the scan's STACKED ys-cotangent (a contiguous
        # dynamic_update_slice per window) and ONE global reverse-gather
        # assembles dpos.  Without it, every window's backward scatter-adds
        # its edge cotangents into the full (N, 3) carry — TPU scatters
        # serialize, measured 2.57 s of the 9.74 s 1M force eval (r5).
        vec_all = tjf_all = None
        if edge_rev is not None and edge_mask is not None:
            from pair_allegro_tpu.ops.scatter import (
                table_edge_vec,
                table_edge_vec_typed,
            )

            typed = getattr(cfg, "num_types", 1) > 1
            if typed:
                pos_t = jnp.concatenate(
                    [positions, types.astype(positions.dtype)[:, None]], 1
                )
                vec_all, tjf_all = table_edge_vec_typed(
                    pos_t, edge_index, edge_rev, edge_mask
                )
            else:
                vec_all = table_edge_vec(
                    positions, edge_index, edge_rev, edge_mask
                )

        def _probe(nc_w):
            return jax.eval_shape(
                lambda p, t, ji, sh, em, am_w: model_energy(
                    params, cfg, p, t, ji, cell=cell, edge_shifts=sh,
                    atom_mask=am_w, edge_mask=em, center_offset=0,
                    num_centers=nc_w,
                ),
                jax.ShapeDtypeStruct(positions.shape, positions.dtype),
                jax.ShapeDtypeStruct(types.shape, types.dtype),
                jax.ShapeDtypeStruct((nc_w, k), edge_index.dtype),
                jax.ShapeDtypeStruct((nc_w, k, 3), edge_shifts.dtype),
                jax.ShapeDtypeStruct((nc_w, k), edge_mask.dtype),
                jax.ShapeDtypeStruct((nc_w,), am.dtype),
            )

        # Classify outputs as per-CENTER vs extensive by whether the leading
        # dim SCALES with the window size (two eval_shape probes) — a pure
        # shape test (`== row_chunk`) misfires on fixed-width globals like a
        # (3,) dipole when row_chunk happens to be 3.  With a single window
        # (c == 1) both treatments produce identical values, so the probe
        # degenerates harmlessly.
        p2 = 2 * row_chunk if c >= 2 else row_chunk
        a1, a2 = _probe(row_chunk), _probe(p2)
        per_center = {
            key: a1[key].shape[:1] == (row_chunk,) and a2[key].shape[:1] == (p2,)
            for key in a1
        }

        def body(_, inp):
            c_idx, j_tab, sh, em, am_w = inp[:5]
            kw = {}
            if vec_all is not None:
                kw["edge_vec"] = inp[5]
                if tjf_all is not None:
                    kw["edge_tjf"] = inp[6]
            out = model_energy(
                params,
                cfg,
                positions,
                types,
                j_tab,
                cell=cell,
                edge_shifts=sh,
                atom_mask=am_w,
                edge_mask=em,
                center_offset=center_offset + c_idx * row_chunk,
                num_centers=row_chunk,
                **kw,
            )
            return None, out

        xs = (
            jnp.arange(c, dtype=jnp.int32),
            edge_index.reshape(c, row_chunk, k),
            edge_shifts.reshape(c, row_chunk, k, 3),
            edge_mask.reshape(c, row_chunk, k),
            am.reshape(c, row_chunk),
        )
        if vec_all is not None:
            xs = xs + (vec_all.reshape(c, row_chunk, k, 3),)
            if tjf_all is not None:
                xs = xs + (tjf_all.reshape(c, row_chunk, k),)
        _, outs = jax.lax.scan(jax.checkpoint(body), None, xs)
        res = {}
        for key, v in outs.items():
            if per_center[key]:
                res[key] = v.reshape(c * row_chunk, *v.shape[2:])
            else:
                res[key] = jnp.sum(v, axis=0)  # extensive (incl. total_energy)
        return res

    return energy_fn


def grow_spec(spec: NeighborSpec, factor: float = 1.5) -> NeighborSpec:
    """Capacity growth on overflow (Kokkos realloc analog)."""
    return dataclasses.replace(
        spec,
        max_edges=int(spec.max_edges * factor) + 128,
        cell_capacity=int(spec.cell_capacity * factor) + 4,
        max_neighbors=_round_k(int(spec.max_neighbors * factor) + 4),
    )


def reestimate_spec(
    spec: NeighborSpec, system: System, factor: float = 1.5
) -> NeighborSpec:
    """Regrow using the CURRENT geometry (NPT cell changes): re-pick the
    shift table / bin grid from the present cell and take the max of grown
    and freshly-estimated capacities.  The strategy is kept fixed — a
    mid-run layout change would silently alter the model's edge contract.

    This is what makes the device-side geometry checks in
    neighbors/device.py actionable: a contracting box flags overflow, the
    host lands here, and the rebuilt spec covers the new cell.
    """
    from pair_allegro_tpu.neighbors.naive import host_neighbor_stats

    grown = grow_spec(spec, factor)
    cell = np.asarray(system.cell, dtype=np.float64)
    pos = np.asarray(system.positions, dtype=np.float64)
    mask = np.asarray(system.valid_mask())
    typed = spec.cutoff_table is not None
    n_edges, max_count = host_neighbor_stats(
        pos[mask],
        cell if any(system.pbc) else None,
        system.pbc,
        spec.cutoff,
        types=np.asarray(system.types)[mask] if typed else None,
        cutoff_matrix=spec.cutoff_table if typed else None,
    )
    if spec.strategy == "dense":
        shifts = static_image_shifts(cell, system.pbc, spec.cutoff, extra_images=1)
        cap = int(np.ceil(n_edges * factor / 128.0)) * 128 + 128
        return dataclasses.replace(
            grown, shifts_table=shifts, max_edges=max(grown.max_edges, cap)
        )
    grid = choose_grid(cell, spec.cutoff)
    if grid is None:
        raise RuntimeError(
            "cell contracted below the 3-bin cell-list regime "
            f"(cell heights vs cutoff {spec.cutoff}); restart the engine "
            "so the dense strategy can be selected"
        )
    per_bin = system.n_atoms / np.prod(grid)
    k_max = _round_k(max(int(max_count * factor) + 2, grown.max_neighbors))
    return dataclasses.replace(
        grown,
        grid=grid,
        max_neighbors=k_max,
        max_edges=max(grown.max_edges, system.n_atoms * k_max),
        cell_capacity=max(grown.cell_capacity, int(np.ceil(per_bin * factor)) + 8),
    )


class PairEngine:
    """Bind an energy model to a system shape: the ``pair_style`` layer,
    TPU-native.  Subclasses pick the model family; `energy_fn(positions,
    types, edge_index, **kw) -> dict` is the AtomicDataDict-style contract
    (SURVEY §2.8)."""

    def __init__(
        self,
        cfg,
        params,
        system: System,
        model_energy: Callable,
        skin: float = 0.0,
        capacity_factor: float = 1.25,
        compute_virial: bool = True,
        row_chunk: int | None = None,
    ):
        self.params = params
        self.compute_virial = compute_virial
        self.skin = skin
        self.capacity_factor = capacity_factor
        self.spec = _estimate_capacities(
            system, cfg.r_max, skin, capacity_factor,
            cutoff_table=typed_cutoff_table(cfg, skin),
        )
        # bind the model AFTER config resolution (remat="auto" etc.)
        self.cfg = cfg = _resolve_remat(cfg, self.spec, system.n_atoms)
        if row_chunk:
            if self.spec.strategy != "cell_list":
                raise ValueError("row_chunk requires the cell-list (table) strategy")
            if system.n_atoms % row_chunk:
                raise ValueError(
                    f"n_atoms={system.n_atoms} not divisible by row_chunk={row_chunk}"
                )
            energy_fn = _make_chunked_energy(model_energy, params, cfg, row_chunk)
        else:
            energy_fn = lambda *a, **k: model_energy(params, cfg, *a, **k)  # noqa: E731
        self.row_chunk = row_chunk
        # jit at the engine boundary: eager evaluation dispatches hundreds of
        # tiny ops (each a remote compile on TPU); nested jit inlines free
        # when called from a jitted MD step.
        self.rebuild_fn = jax.jit(make_rebuild_fn(self.spec, skin, row_chunk))
        self._potential = jax.jit(
            make_potential(energy_fn), static_argnames=("compute_virial",)
        )

    def force_fn(self, system: System, neighbors: NeighborData):
        kw = {}
        if neighbors.edge_rev is not None:
            kw["edge_rev"] = neighbors.edge_rev
        return self._potential(
            system.positions,
            system.types,
            neighbors.edge_index,
            cell=system.cell,
            edge_shifts=neighbors.edge_shifts,
            atom_mask=system.valid_mask(),
            edge_mask=neighbors.edge_mask,
            compute_virial=self.compute_virial,
            **kw,
        )

    def grow(self, factor: float = 1.5, system: System | None = None):
        """Regrow capacities; with `system`, also re-estimate the shift
        table / bin grid from the CURRENT cell (the NPT path)."""
        self.spec = (
            reestimate_spec(self.spec, system, factor)
            if system is not None
            else grow_spec(self.spec, factor)
        )
        self.rebuild_fn = jax.jit(make_rebuild_fn(self.spec, self.skin, self.row_chunk))
        return self.rebuild_fn

    def maybe_shrink(self, system: System):
        """Capacity SHRINK hysteresis — the other half of the Kokkos padded-
        buffer realloc (buffers shrink when capacity exceeds need*1.05²,
        pair_nequip_allegro_kokkos.cpp:218-229).  Without this, a transient
        density spike (grow on overflow) inflates the padded K for the rest
        of the run — a permanent per-edge compute tax, since the TABLE layout
        computes every padded slot.

        Re-estimates capacities from the CURRENT geometry; adopts the fresh
        spec only when the per-atom capacity K strictly drops (the fresh
        estimate's 20% slack + kernel-legal rounding provide the hysteresis
        band — K is quantized to {32, 48, 64, 96, ...}, so border-hovering
        counts cannot flip-flop).  Returns the new rebuild_fn, or None when
        nothing shrank — the signature Simulation's `shrink_fn` hook expects.
        """
        if self.spec.strategy != "cell_list":
            return None  # dense capacity is edge-count sized; padding is cheap
        fresh = _estimate_capacities(
            system, self.cfg.r_max, self.skin, self.capacity_factor,
            cutoff_table=self.spec.cutoff_table,
        )
        if fresh.strategy != "cell_list":
            return None  # never change layout strategy mid-run
        if fresh.max_neighbors >= self.spec.max_neighbors:
            return None
        self.spec = fresh
        self.rebuild_fn = jax.jit(
            make_rebuild_fn(self.spec, self.skin, self.row_chunk)
        )
        return self.rebuild_fn


class AllegroEngine(PairEngine):
    """``pair_style allegro`` equivalent: strictly local, scale-out capable
    (the MPI-parallel mode of the reference, pair_nequip_allegro.h:18)."""

    def __init__(self, cfg: AllegroConfig, params, system: System, **kw):
        super().__init__(cfg, params, system, allegro_energy, **kw)


class NequIPEngine(PairEngine):
    """``pair_style nequip`` equivalent: message passing, information
    propagates num_layers hops — single-device, like the reference's
    single-rank restriction (pair_nequip_allegro.cpp:86-89)."""

    def __init__(self, cfg, params, system: System, **kw):
        from pair_allegro_tpu.models.nequip import nequip_energy

        if kw.get("row_chunk"):
            raise ValueError(
                "row_chunk requires strict locality; NequIP message passing "
                "propagates num_layers hops (pair_nequip_allegro.cpp:86-89)"
            )
        super().__init__(cfg, params, system, nequip_energy, **kw)
