"""Physics tests of the Allegro model: symmetries, forces, virial, padding.

These mirror the reference's differential test strategy (SURVEY §4): the f64
model is its own oracle via exact physical identities, the analog of the
1e-8 f64 parity tier (/root/reference/tests/conftest.py:113)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
from pair_allegro_tpu.neighbors.naive import neighbor_list_np, pad_edges
from pair_allegro_tpu.potential import make_potential

CFG = AllegroConfig(
    type_names=("Cu", "Ag"),
    r_max=3.5,
    l_max=2,
    num_layers=2,
    num_scalar_features=8,
    num_tensor_features=4,
    two_body_mlp_width=16,
    allegro_mlp_hidden_layers_width=16,
    readout_mlp_hidden_layers_width=16,
    avg_num_neighbors=10.0,
)


def make_crystal(rng, n_rep=2, a=3.61, jitter=0.05):
    """FCC-ish Cu/Ag crystal with jitter."""
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    cells = []
    for i in range(n_rep):
        for j in range(n_rep):
            for k in range(n_rep):
                cells.append(base + np.array([i, j, k]) * a)
    pos = np.concatenate(cells, axis=0)
    pos = pos + rng.randn(*pos.shape) * jitter
    cell = np.eye(3) * a * n_rep
    types = rng.randint(0, 2, size=len(pos)).astype(np.int32)
    return pos, cell, types


@pytest.fixture(scope="module")
def params():
    p = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float64)
    # nontrivial shifts/scales
    p["per_type_shift"] = jnp.array([-1.5, 2.0])
    p["per_type_scale"] = jnp.array([0.7, 1.3])
    return p


@jax.jit
def _eval_jit(params, pos, types, edge_index, cell, shifts, edge_mask):
    pot = make_potential(lambda *a, **k: allegro_energy(params, CFG, *a, **k))
    return pot(pos, types, edge_index, cell=cell, edge_shifts=shifts, edge_mask=edge_mask)


def evaluate(params, pos, cell, types, pbc=(True, True, True)):
    edge_index, shifts = neighbor_list_np(pos, cell, pbc, CFG.r_max)
    # pad the edge list to a fixed capacity so the jit cache hits across
    # slightly-perturbed geometries (finite differences etc.)
    cap = 512 * (edge_index.shape[1] // 512 + 2)
    edge_index, shifts, edge_mask = pad_edges(edge_index, shifts, cap)
    return _eval_jit(
        params,
        jnp.asarray(pos),
        jnp.asarray(types),
        jnp.asarray(edge_index),
        jnp.asarray(cell),
        jnp.asarray(shifts),
        jnp.asarray(edge_mask),
    )


def test_translation_invariance(params, rng):
    pos, cell, types = make_crystal(rng)
    out1 = evaluate(params, pos, cell, types)
    out2 = evaluate(params, pos + np.array([1.3, -0.7, 2.1]), cell, types)
    np.testing.assert_allclose(out1.total_energy, out2.total_energy, rtol=1e-12)
    np.testing.assert_allclose(out1.forces, out2.forces, atol=1e-11)


def test_rotation_equivariance(params, rng):
    pos, cell, types = make_crystal(rng)
    q, r = np.linalg.qr(rng.randn(3, 3))
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    out1 = evaluate(params, pos, cell, types)
    out2 = evaluate(params, pos @ q.T, cell @ q.T, types)
    np.testing.assert_allclose(out1.total_energy, out2.total_energy, rtol=1e-11)
    np.testing.assert_allclose(out2.forces, np.asarray(out1.forces) @ q.T, atol=1e-10)
    np.testing.assert_allclose(out2.virial, q @ np.asarray(out1.virial) @ q.T, atol=1e-10)


def test_permutation_equivariance(params, rng):
    pos, cell, types = make_crystal(rng)
    perm = rng.permutation(len(pos))
    out1 = evaluate(params, pos, cell, types)
    out2 = evaluate(params, pos[perm], cell, types[perm])
    np.testing.assert_allclose(out2.atomic_energy, np.asarray(out1.atomic_energy)[perm], atol=1e-11)
    np.testing.assert_allclose(out2.forces, np.asarray(out1.forces)[perm], atol=1e-11)


def test_pe_equals_sum_of_atomic(params, rng):
    """pe == sum eatom — the reference asserts this in LAMMPS
    (test_python_repro_allegro.py:321)."""
    pos, cell, types = make_crystal(rng)
    out = evaluate(params, pos, cell, types)
    np.testing.assert_allclose(out.total_energy, np.sum(out.atomic_energy), rtol=1e-12)


def test_forces_match_finite_differences(params, rng):
    pos, cell, types = make_crystal(rng, n_rep=1)
    out = evaluate(params, pos, cell, types)
    eps = 1e-5
    for atom in [0, 2]:
        for d in range(3):
            dp = np.zeros_like(pos)
            dp[atom, d] = eps
            ep = evaluate(params, pos + dp, cell, types).total_energy
            em = evaluate(params, pos - dp, cell, types).total_energy
            f_fd = -(ep - em) / (2 * eps)
            np.testing.assert_allclose(out.forces[atom, d], f_fd, rtol=1e-6, atol=1e-9)


def test_virial_matches_finite_difference_strain(params, rng):
    pos, cell, types = make_crystal(rng)
    out = evaluate(params, pos, cell, types)
    eps = 1e-6
    for (a, b) in [(0, 0), (1, 1), (0, 1), (0, 2)]:
        strain = np.zeros((3, 3))
        strain[a, b] = eps
        strain[b, a] = eps
        defp = np.eye(3) + strain
        defm = np.eye(3) - strain
        ep = evaluate(params, pos @ defp, cell @ defp, types).total_energy
        em = evaluate(params, pos @ defm, cell @ defm, types).total_energy
        w_fd = -(ep - em) / (2 * eps)
        # diagonal: the symmetric perturbation writes eps once; off-diagonal:
        # twice, so the FD sees W_ab + W_ba = 2 W_ab.
        expected = out.virial[a, a] if a == b else 2 * out.virial[a, b]
        np.testing.assert_allclose(w_fd, expected, rtol=1e-5, atol=1e-8)


def test_extensivity_supercell(params, rng):
    """Strict locality: a 2x1x1 supercell has exactly 2x the energy — the
    property that makes allegro-mode domain decomposition exact
    (pair_nequip_allegro.cpp:86-89)."""
    pos, cell, types = make_crystal(rng, n_rep=1, jitter=0.03)
    out1 = evaluate(params, pos, cell, types)
    pos2 = np.concatenate([pos, pos + cell[0]], axis=0)
    cell2 = cell.copy()
    cell2[0] *= 2
    types2 = np.concatenate([types, types])
    out2 = evaluate(params, pos2, cell2, types2)
    np.testing.assert_allclose(out2.total_energy, 2 * out1.total_energy, rtol=1e-10)
    np.testing.assert_allclose(out2.forces[: len(pos)], out1.forces, atol=1e-10)


def test_padding_invariance(params, rng):
    """Fake atoms + fake edges change nothing — the fixed-shape contract
    (Kokkos scheme, pair_nequip_allegro_kokkos.cpp:242-264)."""
    pos, cell, types = make_crystal(rng)
    n = len(pos)
    edge_index, shifts = neighbor_list_np(pos, cell, (True,) * 3, CFG.r_max)
    pot = make_potential(lambda *a, **k: allegro_energy(params, CFG, *a, **k))
    out1 = pot(
        jnp.asarray(pos),
        jnp.asarray(types),
        jnp.asarray(edge_index),
        cell=jnp.asarray(cell),
        edge_shifts=jnp.asarray(shifts),
    )
    # pad atoms far away and edges as masked self-loops
    pos_p = np.concatenate([pos, np.full((5, 3), 1e3)], axis=0)
    types_p = np.concatenate([types, np.zeros(5, np.int32)])
    atom_mask = np.concatenate([np.ones(n, bool), np.zeros(5, bool)])
    ei_p, sh_p, edge_mask = pad_edges(edge_index, shifts, edge_index.shape[1] + 37)
    out2 = pot(
        jnp.asarray(pos_p),
        jnp.asarray(types_p),
        jnp.asarray(ei_p),
        cell=jnp.asarray(cell),
        edge_shifts=jnp.asarray(sh_p),
        atom_mask=jnp.asarray(atom_mask),
        edge_mask=jnp.asarray(edge_mask),
    )
    np.testing.assert_allclose(out2.total_energy, out1.total_energy, rtol=1e-12)
    np.testing.assert_allclose(out2.atomic_energy[:n], out1.atomic_energy, atol=1e-12)
    np.testing.assert_allclose(out2.forces[:n], out1.forces, atol=1e-11)
    np.testing.assert_allclose(out2.virial, out1.virial, atol=1e-11)


def test_smooth_at_cutoff(params):
    """Energy of a dimer -> 0 smoothly at r_max (polynomial envelope)."""
    types = np.array([0, 1], np.int32)
    pot = make_potential(lambda *a, **k: allegro_energy(params, CFG, *a, **k))

    def dimer_energy(r):
        pos = jnp.asarray([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
        ei = jnp.asarray([[0, 1], [1, 0]])
        base = params["per_type_shift"][types].sum()
        return float(
            pot(pos, jnp.asarray(types), ei, compute_virial=False).total_energy - base
        )

    assert abs(dimer_energy(CFG.r_max - 1e-4)) < 1e-4
    assert dimer_energy(CFG.r_max + 0.01) == 0.0
    assert abs(dimer_energy(2.0)) > 1e-3


def test_ghost_mode_matches_pbc_mode(params, rng):
    """Allegro-mode (unwrapped ghost atoms, no cell) must equal nequip-mode
    (local j + shifts) — the two tensor contracts of SURVEY §2.8."""
    pos, cell, types = make_crystal(rng, n_rep=1)
    out_pbc = evaluate(params, pos, cell, types)
    # build ghosts: replicate images, collect edges to ghosts
    edge_index, shifts = neighbor_list_np(pos, cell, (True,) * 3, CFG.r_max)
    ghost_pos = [pos]
    ghost_types = [types]
    gmap = {}
    ei_ghost = np.zeros_like(edge_index)
    ei_ghost[0] = edge_index[0]
    cur = len(pos)
    for e in range(edge_index.shape[1]):
        j = int(edge_index[1, e])
        s = tuple(int(v) for v in shifts[e])
        if s == (0, 0, 0):
            ei_ghost[1, e] = j
            continue
        kkey = (j, s)
        if kkey not in gmap:
            gmap[kkey] = cur
            ghost_pos.append((pos[j] + np.asarray(s) @ cell)[None])
            ghost_types.append(types[j : j + 1])
            cur += 1
        ei_ghost[1, e] = gmap[kkey]
    pos_g = np.concatenate(ghost_pos, axis=0)
    types_g = np.concatenate(ghost_types)
    atom_mask = np.zeros(len(pos_g), bool)
    atom_mask[: len(pos)] = True  # energy from locals only (:366-380)
    pot = make_potential(lambda *a, **k: allegro_energy(params, CFG, *a, **k))
    out_g = pot(
        jnp.asarray(pos_g),
        jnp.asarray(types_g),
        jnp.asarray(ei_ghost),
        atom_mask=jnp.asarray(atom_mask),
    )
    np.testing.assert_allclose(out_g.total_energy, out_pbc.total_energy, rtol=1e-10)
    # local forces must match after reverse-summing ghost forces onto owners
    f = np.asarray(out_g.forces)
    f_local = f[: len(pos)].copy()
    for (j, s), g in gmap.items():
        f_local[j] += f[g]
    np.testing.assert_allclose(f_local, out_pbc.forces, atol=1e-10)


def test_table_layout_matches_flat(rng):
    """TABLE (N,K) and FLAT (2,E) edge layouts must give identical energies
    and forces — the table is the scatter-free production path."""
    import jax
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
    from pair_allegro_tpu.neighbors.device import cell_list_neighbors, choose_grid
    from pair_allegro_tpu.potential import make_potential

    n = 300
    cell = np.diag([14.0, 13.0, 15.0])
    pos = rng.rand(n, 3) @ cell
    types = rng.randint(0, 2, n).astype(np.int32)
    rc = 4.0
    cfg = AllegroConfig(type_names=("A", "B"), r_max=rc, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=8.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    grid = choose_grid(cell, rc)
    args = (jnp.asarray(pos), jnp.asarray(cell), rc, grid, 64, 64)
    nd_flat = cell_list_neighbors(*args, flatten=True)
    nd_tab = cell_list_neighbors(*args, flatten=False)
    assert not bool(nd_flat.overflow) and not bool(nd_tab.overflow)
    pot = make_potential(lambda *a, **k: allegro_energy(params, cfg, *a, **k))
    o1 = pot(jnp.asarray(pos), jnp.asarray(types), nd_flat.edge_index,
             cell=jnp.asarray(cell), edge_shifts=nd_flat.edge_shifts,
             edge_mask=nd_flat.edge_mask)
    o2 = pot(jnp.asarray(pos), jnp.asarray(types), nd_tab.edge_index,
             cell=jnp.asarray(cell), edge_shifts=nd_tab.edge_shifts,
             edge_mask=nd_tab.edge_mask)
    np.testing.assert_allclose(float(o1.total_energy), float(o2.total_energy), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(o1.atomic_energy), np.asarray(o2.atomic_energy), atol=1e-12)
    np.testing.assert_allclose(np.asarray(o1.forces), np.asarray(o2.forces), atol=1e-11)
    np.testing.assert_allclose(np.asarray(o1.virial), np.asarray(o2.virial), atol=1e-11)


def test_per_edge_type_cutoff(rng):
    """per_edge_type_cutoff semantics (pair_nequip_allegro.cpp:303-328): an
    edge beyond its TYPE-PAIR cutoff contributes exactly zero even though it
    is inside r_max and present in the neighbor list — observably identical
    to the reference's re-filtering in preprocess (:488-512)."""
    cut = ((3.5, 2.0), (2.0, 3.5))  # A-B pairs cut at 2.0, A-A/B-B at 3.5
    cfg_full = AllegroConfig(
        type_names=("A", "B"), r_max=3.5, l_max=1, num_layers=1,
        num_scalar_features=8, num_tensor_features=4,
    )
    cfg_cut = AllegroConfig(
        type_names=("A", "B"), r_max=3.5, l_max=1, num_layers=1,
        num_scalar_features=8, num_tensor_features=4,
        per_edge_type_cutoff=cut,
    )
    params = allegro_init(jax.random.PRNGKey(9), cfg_cut, dtype=jnp.float64)
    # A-B dimer at r = 2.5: inside r_max, outside the A-B cutoff
    pos = np.array([[0.0, 0, 0], [2.5, 0, 0], [50, 0, 0], [52.5, 0, 0]])
    types = np.array([0, 1, 0, 0], np.int32)
    ei, sh = neighbor_list_np(pos, None, (False,) * 3, 3.5)
    out_cut = allegro_energy(params, cfg_cut, jnp.asarray(pos), jnp.asarray(types),
                             jnp.asarray(ei), edge_shifts=jnp.asarray(sh))
    out_full = allegro_energy(params, cfg_full, jnp.asarray(pos), jnp.asarray(types),
                              jnp.asarray(ei), edge_shifts=jnp.asarray(sh))
    # with the matrix: the A-B pair beyond 2.0 contributes nothing beyond the
    # per-type shift; the A-A dimer (r=2.5 < 3.5) still binds
    shift = np.asarray(params["per_type_shift"])
    np.testing.assert_allclose(
        np.asarray(out_cut["atomic_energy"][:2]), shift[[0, 1]], atol=1e-12
    )
    assert abs(float(out_cut["atomic_energy"][2]) - shift[0]) > 1e-8
    # without the matrix the A-B pair DOES contribute (sanity of the setup)
    assert abs(float(out_full["atomic_energy"][0]) - shift[0]) > 1e-8


def test_parity_reflection_invariance(rng):
    """With cfg.parity=True (default) the energy is strictly invariant under
    reflection — the O(3) property of the e3nn models the reference consumes.
    The all-paths SO(3) mode (parity=False) leaks parity-odd terms and is
    measurably NOT reflection invariant (kept only for round-1 compat)."""
    import dataclasses

    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    pos = rng.rand(12, 3) * 5
    cell = np.eye(3) * 5
    types = np.zeros(12, np.int32)
    mirror = np.diag([-1.0, 1.0, 1.0])

    def energy(cfg, params, p, c):
        ei, sh = neighbor_list_np(p, c, (True,) * 3, cfg.r_max)
        out = allegro_energy(
            params, cfg, jnp.asarray(p), jnp.asarray(types), jnp.asarray(ei),
            cell=jnp.asarray(c), edge_shifts=jnp.asarray(sh),
        )
        return float(out["total_energy"])

    base = dict(type_names=("A",), r_max=3.5, l_max=2, num_layers=2,
                num_scalar_features=8, num_tensor_features=4,
                avg_num_neighbors=8.0)
    cfg_o3 = AllegroConfig(**base, parity=True)
    params_o3 = allegro_init(jax.random.PRNGKey(7), cfg_o3, dtype=jnp.float64)
    e0 = energy(cfg_o3, params_o3, pos, cell)
    e1 = energy(cfg_o3, params_o3, pos @ mirror, cell @ mirror)
    np.testing.assert_allclose(e0, e1, rtol=1e-12)

    cfg_so3 = AllegroConfig(**base, parity=False)
    params_so3 = allegro_init(jax.random.PRNGKey(7), cfg_so3, dtype=jnp.float64)
    d = abs(energy(cfg_so3, params_so3, pos, cell)
            - energy(cfg_so3, params_so3, pos @ mirror, cell @ mirror))
    assert d > 1e-10, "SO(3) mode unexpectedly reflection-invariant"


def test_directed_edges_are_required_halving_impossible(params, rng):
    """Pin the round-4 half-pair analysis (BASELINE.md): Allegro's per-edge
    quantities are NOT direction-symmetric — E_ij != E_ji because the edge
    latent couples to the CENTER's environment (env_i vs env_j), on top of
    the type-order asymmetry of the two-body input — so evaluating i<j pairs
    once and mirroring (newton-style force halving) would CHANGE the model.
    The reference itself feeds BOTH directions: it requests a FULL neighbor
    list (/root/reference/pair_nequip_allegro.cpp:143-147) and its tests
    assert the plugin's edge count equals nequip's bidirectional
    neighborlist's, Kokkos path included
    (/root/reference/tests/test_python_repro_allegro.py:238-239)."""
    pos, cell, types = make_crystal(rng)
    edge_index, shifts = neighbor_list_np(pos, cell, (True,) * 3, CFG.r_max)
    out = allegro_energy(
        params, CFG, jnp.asarray(pos), jnp.asarray(types),
        jnp.asarray(edge_index), cell=jnp.asarray(cell),
        edge_shifts=jnp.asarray(shifts),
    )
    e_edge = np.asarray(out["edge_energy"])
    # locate each edge's reverse partner
    key = {}
    for k in range(edge_index.shape[1]):
        key[(int(edge_index[0, k]), int(edge_index[1, k]),
             *(int(round(s)) for s in shifts[k]))] = k
    rel = []
    for (i, j, sx, sy, sz), k in key.items():
        kr = key[(j, i, -sx, -sy, -sz)]  # bijection: full list
        denom = max(abs(e_edge[k]), abs(e_edge[kr]), 1e-30)
        rel.append(abs(e_edge[k] - e_edge[kr]) / denom)
    rel = np.asarray(rel)
    # O(1) relative asymmetry — not a numerical artifact
    assert rel.max() > 1e-2, rel.max()
    # and the halved evaluation (keep i<j directed edges, double) does NOT
    # reproduce the energy: the redundancy a half-list would exploit is absent
    keep = edge_index[0] < edge_index[1]
    half = 2.0 * float(np.sum(e_edge[keep]))
    full = float(np.sum(e_edge))
    assert abs(half - full) / max(abs(full), 1e-30) > 1e-3
