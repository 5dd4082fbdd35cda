"""Per-edge-type cutoff at neighbor-BUILD time + capacity shrink hysteresis.

The reference filters edges by ``cutoff_matrix[ti][tj]`` in its preprocess
count pass (/root/reference/pair_nequip_allegro.cpp:488-512), so its edge
buffer holds only typed-real edges; its Kokkos buffers also SHRINK when
capacity exceeds need*1.05² (/root/reference/pair_nequip_allegro_kokkos.cpp:
218-229).  These tests pin both capabilities: K sized by the typed count
with identical physics, and K returning to baseline after a capacity spike.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pair_allegro_tpu.engine import AllegroEngine, typed_cutoff_table
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
from pair_allegro_tpu.neighbors.device import cell_list_neighbors, choose_grid
from pair_allegro_tpu.neighbors.naive import host_neighbor_stats, neighbor_list_np
from pair_allegro_tpu.system import System

# asymmetric per-type cutoffs: build-time filtering must symmetrize (max)
# so every kept edge's reverse is kept; the model envelope applies the exact
# asymmetric value.  Same-species cutoffs are small so the typed neighbor
# count (hence K) genuinely drops below the scalar-max build's.
CUT = ((2.0, 3.5), (3.0, 1.8))

CFG = AllegroConfig(
    type_names=("Cu", "Ag"),
    r_max=3.5,
    l_max=1,
    num_layers=1,
    num_scalar_features=8,
    num_tensor_features=4,
    two_body_mlp_width=8,
    allegro_mlp_hidden_layers_width=8,
    readout_mlp_hidden_layers_width=8,
    avg_num_neighbors=10.0,
    per_edge_type_cutoff=CUT,
)


def _system(rng, n_rep=5, a=3.61):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    cells = []
    for i in range(n_rep):
        for j in range(n_rep):
            for k in range(n_rep):
                cells.append(base + np.array([i, j, k]) * a)
    pos = np.concatenate(cells, axis=0) + rng.randn(n_rep**3 * 4, 3) * 0.05
    cell = np.eye(3) * a * n_rep
    types = rng.randint(0, 2, size=len(pos)).astype(np.int32)
    return pos, cell, types


def _edge_multiset(j_tab, shifts, mask):
    out = set()
    n, k = j_tab.shape
    for i in range(n):
        for kk in range(k):
            if not mask[i, kk]:
                continue
            key = (
                i,
                int(j_tab[i, kk]),
                int(round(float(shifts[i, kk, 0]))),
                int(round(float(shifts[i, kk, 1]))),
                int(round(float(shifts[i, kk, 2]))),
            )
            assert key not in out
            out.add(key)
    return out


def test_typed_cell_list_matches_typed_oracle(rng):
    pos, cell, types = _system(rng, n_rep=4)
    sym = np.maximum(np.asarray(CUT), np.asarray(CUT).T)
    rc = float(sym.max())
    grid = choose_grid(cell, rc)
    assert grid is not None
    ei_ref, sh_ref = neighbor_list_np(
        pos, cell, (True,) * 3, rc, types=types, cutoff_matrix=sym
    )
    nd = cell_list_neighbors(
        jnp.asarray(pos), jnp.asarray(cell), rc, grid,
        cell_capacity=24, max_neighbors=32, flatten=False,
        types=jnp.asarray(types), cutoff_table=sym,
    )
    assert not bool(nd.overflow)
    got = _edge_multiset(
        np.asarray(nd.edge_index), np.asarray(nd.edge_shifts), np.asarray(nd.edge_mask)
    )
    want = {
        (int(i), int(j), *(int(round(s)) for s in sh))
        for (i, j), sh in zip(ei_ref.T, sh_ref)
    }
    assert got == want


def test_typed_host_stats_match_oracle(rng):
    pos, cell, types = _system(rng, n_rep=4)
    sym = np.maximum(np.asarray(CUT), np.asarray(CUT).T)
    rc = float(sym.max())
    ei, _ = neighbor_list_np(pos, cell, (True,) * 3, rc, types=types, cutoff_matrix=sym)
    n_edges, max_count = host_neighbor_stats(
        pos, cell, (True,) * 3, rc, types=types, cutoff_matrix=sym
    )
    assert n_edges == ei.shape[1]
    assert max_count == int(np.bincount(ei[0], minlength=len(pos)).max())


def test_typed_build_shrinks_k_and_preserves_forces(rng, monkeypatch):
    """The typed engine gets a strictly smaller K than the scalar-max build
    and produces identical forces (envelope-killed edges contribute zero)."""
    pos, cell, types = _system(rng)
    n = len(pos)
    params = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float64)
    system = System.create(
        pos, types, cell=cell, masses=np.full(n, 63.5), dtype=jnp.float64
    )
    eng_t = AllegroEngine(CFG, params, system, skin=0.3)
    assert eng_t.spec.cutoff_table is not None

    # scalar-max build of the SAME model: disable the typed table
    import pair_allegro_tpu.engine as eng_mod

    monkeypatch.setattr(eng_mod, "typed_cutoff_table", lambda cfg, skin: None)
    eng_s = AllegroEngine(CFG, params, system, skin=0.3)
    assert eng_s.spec.cutoff_table is None
    assert eng_t.spec.max_neighbors < eng_s.spec.max_neighbors

    nd_t = eng_t.rebuild_fn(system, None)
    nd_s = eng_s.rebuild_fn(system, None)
    out_t = eng_t.force_fn(system, nd_t)
    out_s = eng_s.force_fn(system, nd_s)
    np.testing.assert_allclose(
        np.asarray(out_t.forces), np.asarray(out_s.forces), atol=1e-11
    )
    np.testing.assert_allclose(
        float(out_t.total_energy), float(out_s.total_energy), atol=1e-11
    )


def test_typed_dense_build_shrinks_edges_and_preserves_forces(rng, monkeypatch):
    """Dense-strategy twin of the K-shrink test (round-4 review missing #4):
    small heterogeneous systems (<= 256 atoms take the dense all-pairs
    build) must also size max_edges by the TYPED edge count and keep
    identical physics — the reference's count-pass filter applies to its
    single neighbor list regardless of system size
    (/root/reference/pair_nequip_allegro.cpp:488-512)."""
    pos, cell, types = _system(rng, n_rep=3)  # 108 atoms -> dense strategy
    n = len(pos)
    params = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float64)
    system = System.create(
        pos, types, cell=cell, masses=np.full(n, 63.5), dtype=jnp.float64
    )
    eng_t = AllegroEngine(CFG, params, system, skin=0.3)
    assert eng_t.spec.strategy == "dense"
    assert eng_t.spec.cutoff_table is not None

    import pair_allegro_tpu.engine as eng_mod

    monkeypatch.setattr(eng_mod, "typed_cutoff_table", lambda cfg, skin: None)
    eng_s = AllegroEngine(CFG, params, system, skin=0.3)
    assert eng_s.spec.strategy == "dense"
    assert eng_s.spec.cutoff_table is None
    assert eng_t.spec.max_edges < eng_s.spec.max_edges

    nd_t = eng_t.rebuild_fn(system, None)
    nd_s = eng_s.rebuild_fn(system, None)
    # the typed build keeps exactly the typed-oracle edge multiset
    sym = np.maximum(np.asarray(CUT), np.asarray(CUT).T) + 0.3
    ei, sh = neighbor_list_np(
        pos, cell, (True,) * 3, float(sym.max()), types=types, cutoff_matrix=sym
    )
    got = {
        (int(i), int(j), tuple(int(x) for x in s))
        for i, j, s, m in zip(
            np.asarray(nd_t.edge_index[0]),
            np.asarray(nd_t.edge_index[1]),
            np.asarray(nd_t.edge_shifts),
            np.asarray(nd_t.edge_mask),
        )
        if m
    }
    want = {
        (int(i), int(j), tuple(int(x) for x in s)) for (i, j), s in zip(ei.T, sh)
    }
    assert got == want

    out_t = eng_t.force_fn(system, nd_t)
    out_s = eng_s.force_fn(system, nd_s)
    np.testing.assert_allclose(
        np.asarray(out_t.forces), np.asarray(out_s.forces), atol=1e-11
    )
    np.testing.assert_allclose(
        float(out_t.total_energy), float(out_s.total_energy), atol=1e-11
    )


def test_typed_table_symmetrized_and_skinned():
    tab = typed_cutoff_table(CFG, skin=0.4)
    sym = np.maximum(np.asarray(CUT), np.asarray(CUT).T)
    np.testing.assert_allclose(tab, sym + 0.4)
    # uniform matrix -> no typed build
    cfg_u = dataclasses.replace(CFG, per_edge_type_cutoff=None)
    assert typed_cutoff_table(cfg_u, skin=0.4) is None


def test_capacity_shrink_hysteresis(rng):
    """After a (simulated) spike-grow, maybe_shrink returns capacities to the
    fresh estimate — the Kokkos shrink guard
    (pair_nequip_allegro_kokkos.cpp:218-229)."""
    pos, cell, types = _system(rng)
    n = len(pos)
    params = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float64)
    system = System.create(
        pos, types, cell=cell, masses=np.full(n, 63.5), dtype=jnp.float64
    )
    eng = AllegroEngine(CFG, params, system, skin=0.3)
    k0 = eng.spec.max_neighbors
    nd0 = eng.rebuild_fn(system, None)
    f0 = np.asarray(eng.force_fn(system, nd0).forces)

    eng.grow(2.0)
    assert eng.spec.max_neighbors > k0
    rb = eng.maybe_shrink(system)
    assert rb is not None
    assert eng.spec.max_neighbors == k0
    nd1 = rb(system, None)
    f1 = np.asarray(eng.force_fn(system, nd1).forces)
    np.testing.assert_allclose(f1, f0, atol=1e-11)
    # idempotent: nothing left to shrink
    assert eng.maybe_shrink(system) is None


def test_simulation_shrink_hook(rng):
    """Simulation's shrink_fn hook adopts the smaller capacity mid-run and
    keeps integrating (state stays valid — no work lost)."""
    from pair_allegro_tpu.md.integrate import Simulation, Units

    pos, cell, types = _system(rng, n_rep=5)
    n = len(pos)
    params = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float64)
    system = System.create(
        pos, types, cell=cell, masses=np.full(n, 63.5), dtype=jnp.float64
    )
    eng = AllegroEngine(CFG, params, system, skin=0.3)
    k0 = eng.spec.max_neighbors
    eng.grow(2.0)  # simulate an earlier density-spike grow
    k_big = eng.spec.max_neighbors
    assert k_big > k0
    sim = Simulation(
        system, eng.force_fn, eng.rebuild_fn, dt=0.5 * Units.fs,
        grow_fn=eng.grow, shrink_fn=eng.maybe_shrink, shrink_every=1,
    )
    sim.init_velocities(50.0)
    rows = sim.run(4, log_every=2)
    assert eng.spec.max_neighbors == k0  # shrank back at a chunk boundary
    assert len(rows) == 2
    assert sim.state.neighbors.edge_index.shape[1] == k0
