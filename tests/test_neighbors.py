"""Differential tests: on-device neighbor builders vs the exact host oracle.

The analog of the reference's edge-multiset checks against the nequip
neighborlist (/root/reference/tests/test_python_repro_allegro.py:219-286):
exact (i, j, shift) multiset equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pair_allegro_tpu.neighbors.device import (
    cell_list_neighbors,
    choose_grid,
    dense_neighbors,
    static_image_shifts,
)
from pair_allegro_tpu.neighbors.naive import neighbor_list_np


def edge_multiset(edge_index, shifts, mask=None):
    e = edge_index.shape[1]
    out = set()
    items = []
    for k in range(e):
        if mask is not None and not mask[k]:
            continue
        items.append(
            (
                int(edge_index[0, k]),
                int(edge_index[1, k]),
                int(round(float(shifts[k, 0]))),
                int(round(float(shifts[k, 1]))),
                int(round(float(shifts[k, 2]))),
            )
        )
    for it in items:
        assert it not in out, f"duplicate edge {it}"
        out.add(it)
    return out


def random_box(rng, n, lo=4.0, hi=7.0, triclinic=False):
    cell = np.diag(rng.uniform(lo, hi, size=3))
    if triclinic:
        cell[1, 0] = rng.uniform(-1.0, 1.0)
        cell[2, 0] = rng.uniform(-1.0, 1.0)
        cell[2, 1] = rng.uniform(-1.0, 1.0)
    frac = rng.rand(n, 3)
    return frac @ cell, cell


@pytest.mark.parametrize("triclinic", [False, True])
def test_dense_matches_oracle(rng, triclinic):
    pos, cell = random_box(rng, 24, triclinic=triclinic)
    rc = 2.5
    ei_ref, sh_ref = neighbor_list_np(pos, cell, (True,) * 3, rc)
    table = static_image_shifts(cell, (True,) * 3, rc)
    nd = dense_neighbors(jnp.asarray(pos), jnp.asarray(cell), table, rc, max_edges=4096)
    assert not bool(nd.overflow)
    assert edge_multiset(np.asarray(nd.edge_index), np.asarray(nd.edge_shifts), np.asarray(nd.edge_mask)) == edge_multiset(ei_ref, sh_ref)


def test_dense_cutoff_larger_than_box(rng):
    """r_max = 15 on a 3.61 A cell — the many-periodic-images case the
    reference tests explicitly (tests/conftest.py dataset matrix)."""
    a = 3.61
    pos = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    cell = np.eye(3) * a
    rc = 7.5
    ei_ref, sh_ref = neighbor_list_np(pos, cell, (True,) * 3, rc)
    table = static_image_shifts(cell, (True,) * 3, rc)
    nd = dense_neighbors(jnp.asarray(pos), jnp.asarray(cell), table, rc, max_edges=8192)
    assert not bool(nd.overflow)
    assert edge_multiset(np.asarray(nd.edge_index), np.asarray(nd.edge_shifts), np.asarray(nd.edge_mask)) == edge_multiset(ei_ref, sh_ref)


def test_dense_nonperiodic(rng):
    pos = rng.rand(21, 3) * 6.0  # aspirin-like: nonperiodic
    rc = 3.0
    ei_ref, sh_ref = neighbor_list_np(pos, None, (False,) * 3, rc)
    table = static_image_shifts(np.zeros((3, 3)), (False,) * 3, rc)
    nd = dense_neighbors(jnp.asarray(pos), jnp.zeros((3, 3)), table, rc, max_edges=1024)
    assert edge_multiset(np.asarray(nd.edge_index), np.asarray(nd.edge_shifts), np.asarray(nd.edge_mask)) == edge_multiset(ei_ref, sh_ref)


@pytest.mark.parametrize("triclinic", [False, True])
def test_cell_list_matches_oracle(rng, triclinic):
    n = 600
    cell = np.diag([22.0, 19.0, 25.0])
    if triclinic:
        cell[1, 0] = 3.0
        cell[2, 1] = -2.5
    pos = rng.rand(n, 3) @ cell
    # positions intentionally unwrapped beyond the box
    pos[: n // 3] += cell[0] * 2 - cell[2]
    rc = 4.5
    grid = choose_grid(cell, rc)
    assert grid is not None
    ei_ref, sh_ref = neighbor_list_np(pos, cell, (True,) * 3, rc)
    nd = cell_list_neighbors(
        jnp.asarray(pos), jnp.asarray(cell), rc, grid, cell_capacity=48, max_neighbors=64
    )
    assert not bool(nd.overflow)
    assert edge_multiset(np.asarray(nd.edge_index), np.asarray(nd.edge_shifts), np.asarray(nd.edge_mask)) == edge_multiset(ei_ref, sh_ref)


def test_cell_list_overflow_flag(rng):
    cell = np.diag([20.0, 20.0, 20.0])
    pos = rng.rand(400, 3) @ cell
    rc = 4.0
    grid = choose_grid(cell, rc)
    nd = cell_list_neighbors(
        jnp.asarray(pos), jnp.asarray(cell), rc, grid, cell_capacity=2, max_neighbors=4
    )
    assert bool(nd.overflow)


def test_padded_atoms_excluded(rng):
    pos, cell = random_box(rng, 16)
    pos_p = np.concatenate([pos, np.full((4, 3), 500.0)], axis=0)
    mask = np.concatenate([np.ones(16, bool), np.zeros(4, bool)])
    rc = 2.5
    table = static_image_shifts(cell, (True,) * 3, rc)
    nd = dense_neighbors(
        jnp.asarray(pos_p), jnp.asarray(cell), table, rc, 2048, atom_mask=jnp.asarray(mask)
    )
    ei = np.asarray(nd.edge_index)
    m = np.asarray(nd.edge_mask)
    assert np.all(ei[:, m] < 16)
    ei_ref, sh_ref = neighbor_list_np(pos, cell, (True,) * 3, rc)
    assert edge_multiset(ei, np.asarray(nd.edge_shifts), m) == edge_multiset(ei_ref, sh_ref)


def test_jit_and_vmap_compatible(rng):
    pos, cell = random_box(rng, 20)
    rc = 2.5
    table = static_image_shifts(cell, (True,) * 3, rc)
    f = jax.jit(lambda p, c: dense_neighbors(p, c, table, rc, 1024))
    nd = f(jnp.asarray(pos), jnp.asarray(cell))
    ei_ref, _ = neighbor_list_np(pos, cell, (True,) * 3, rc)
    assert int(nd.count()) == ei_ref.shape[1]


def test_host_neighbor_stats_matches_oracle(rng):
    from pair_allegro_tpu.neighbors.naive import host_neighbor_stats

    cell = np.diag([16.0, 15.0, 17.0])
    cell[2, 0] = 2.0
    pos = rng.rand(300, 3) @ cell
    rc = 4.0
    ei, _ = neighbor_list_np(pos, cell, (True,) * 3, rc)
    n_edges, max_count = host_neighbor_stats(pos, cell, (True,) * 3, rc)
    assert n_edges == ei.shape[1]
    assert max_count == int(np.bincount(ei[0], minlength=300).max())
    # small-box fallback path (rc > box/3): must agree with the oracle too
    small = np.eye(3) * 6.0
    pos2 = rng.rand(40, 3) @ small
    ei2, _ = neighbor_list_np(pos2, small, (True,) * 3, 4.0)
    n2, m2 = host_neighbor_stats(pos2, small, (True,) * 3, 4.0)
    assert n2 == ei2.shape[1]
    assert m2 == int(np.bincount(ei2[0], minlength=40).max())


def test_verlet_skin_rebuild_semantics(rng):
    """rebuild_fn with skin: stale list + envelope must give identical forces
    to an every-step rebuild until displacement exceeds skin/2."""
    import jax
    import jax.numpy as jnp
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    n_rep = 5
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    pos = np.concatenate([base + np.array([i, j, k]) * a0
                          for i in range(n_rep) for j in range(n_rep) for k in range(n_rep)])
    pos += 0.03 * rng.randn(*pos.shape)
    cell = np.eye(3) * a0 * n_rep
    n = pos.shape[0]
    cfg = AllegroConfig(type_names=("Cu",), r_max=4.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4, avg_num_neighbors=12.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)

    def sys_at(p):
        return System.create(p, np.zeros(n, np.int32), cell=cell, dtype=jnp.float64)

    eng0 = AllegroEngine(cfg, params, sys_at(pos))          # no skin
    engs = AllegroEngine(cfg, params, sys_at(pos), skin=0.5)

    s0 = sys_at(pos)
    nb_s = engs.rebuild_fn(s0, None)
    # small drift < skin/2: stale list must still be exact
    drift = 0.2 * rng.randn(n, 3)
    drift *= 0.2 / np.abs(drift).max()
    s1 = sys_at(pos + drift)
    nb_stale = engs.rebuild_fn(s1, nb_s)
    # unchanged list object semantics: same edge count as before
    assert int(np.asarray(nb_stale.count())) == int(np.asarray(nb_s.count()))
    f_ref = np.asarray(eng0.force_fn(s1, eng0.rebuild_fn(s1, None)).forces)
    f_stale = np.asarray(engs.force_fn(s1, nb_stale).forces)
    np.testing.assert_allclose(f_stale, f_ref, atol=1e-10)
    # large drift > skin/2 on one atom: must trigger a rebuild
    pos2 = pos + drift
    pos2[7] += 0.9
    s2 = sys_at(pos2)
    nb2 = engs.rebuild_fn(s2, nb_stale)
    f_ref2 = np.asarray(eng0.force_fn(s2, eng0.rebuild_fn(s2, None)).forces)
    f2 = np.asarray(engs.force_fn(s2, nb2).forces)
    np.testing.assert_allclose(f2, f_ref2, atol=1e-10)


def test_mixed_pbc_engine_matches_oracle(rng):
    """`boundary p p s` (mixed): the engine must not min-image the open axis
    — slab geometry with atoms interacting across the periodic axes only."""
    import jax
    import jax.numpy as jnp
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
    from pair_allegro_tpu.system import System

    cell = np.diag([9.0, 9.0, 30.0])
    n = 60
    pos = rng.rand(n, 3) * [9.0, 9.0, 6.0]  # thin slab
    pos[:, 2] += 1.0
    types = np.zeros(n, np.int32)
    pbc = (True, True, False)
    cfg = AllegroConfig(type_names=("X",), r_max=3.0, l_max=1, num_layers=1,
                        num_scalar_features=8, num_tensor_features=4,
                        avg_num_neighbors=6.0)
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    system = System.create(pos, types, cell=cell, pbc=pbc, dtype=jnp.float64)
    eng = AllegroEngine(cfg, params, system)
    nb = eng.rebuild_fn(system, None)
    out = eng.force_fn(system, nb)

    ei, sh = neighbor_list_np(pos, cell, pbc, cfg.r_max)
    assert np.all(sh[:, 2] == 0)  # open axis: no images
    ref = allegro_energy(params, cfg, jnp.asarray(pos), jnp.asarray(types),
                         jnp.asarray(ei), cell=jnp.asarray(cell),
                         edge_shifts=jnp.asarray(sh, jnp.float64))
    np.testing.assert_allclose(float(out.total_energy), float(ref["total_energy"]), rtol=1e-12)


def test_reverse_table_and_gather_backward(rng):
    """reverse_table maps every real TABLE edge to its reverse (j -> i,
    -shift), and the gather-based force backward (ops.scatter.table_edge_vec)
    matches the plain scatter-add transpose to f64 exactness."""
    from pair_allegro_tpu.neighbors.device import reverse_table
    from pair_allegro_tpu.ops.scatter import table_edge_vec

    n = 200
    cell = np.diag([13.0, 11.0, 12.0])
    pos = rng.rand(n, 3) @ cell
    rc = 3.5
    grid = choose_grid(cell, rc)
    assert grid is not None
    nd = cell_list_neighbors(
        jnp.asarray(pos), jnp.asarray(cell), rc, grid,
        cell_capacity=64, max_neighbors=48, flatten=False,
    )
    assert not bool(nd.overflow)
    j_idx = np.asarray(nd.edge_index)
    shf = np.asarray(nd.edge_shifts)
    mask = np.asarray(nd.edge_mask)
    rev = np.asarray(reverse_table(nd.edge_index, nd.edge_shifts))
    k = j_idx.shape[1]
    n_real = 0
    for a in range(n):
        for kk in range(k):
            if not mask[a, kk]:
                assert rev[a, kk] == n * k  # pads -> zero row
                continue
            r = rev[a, kk]
            assert r < n * k, (a, kk)
            ra, rk = divmod(r, k)
            # reverse edge: starts at j, points back at a, opposite shift
            assert ra == j_idx[a, kk]
            assert j_idx[ra, rk] == a
            np.testing.assert_array_equal(shf[ra, rk], -shf[a, kk])
            n_real += 1
    assert n_real > 100  # the box actually has edges

    # VJP parity vs the plain expression (f64 CPU)
    posj = jnp.asarray(pos)
    cot = jnp.asarray(rng.randn(n, k, 3))

    rev_j = reverse_table(nd.edge_index, nd.edge_shifts)

    def via_gather(p):
        return jnp.sum(table_edge_vec(p, nd.edge_index, rev_j, nd.edge_mask)
                       * cot)

    def via_scatter(p):
        return jnp.sum((p[nd.edge_index] - p[:, None, :]) * cot)

    g1 = jax.grad(via_gather)(posj)
    g2 = jax.grad(via_scatter)(posj)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-12, rtol=1e-12)


def test_round_k_kernel_legal():
    """Per-atom table capacity rounds to the smallest KERNEL-LEGAL K: some m
    must give a 128-aligned edge block (128 | K*m) within the fused kernels'
    512-lane scoped-VMEM cap (ops/pallas_stack._env_block_geometry).  The
    padding matters: every padded slot computes, so K=48 instead of 64 at a
    typical ~44-neighbor metal config cuts 25% of all per-edge kernel work
    (the analog of the reference's 1.05 padding slack,
    pair_nequip_allegro_kokkos.cpp:218-229)."""
    from pair_allegro_tpu.engine import _round_k

    # small K rounds to a multiple of 8 (m = 128/gcd(K,128) keeps the block
    # 128-aligned within the cap) — reachable at ANY system size now that
    # typed-cutoff builds can produce small per-atom counts
    assert _round_k(20) == 24
    assert any(24 * m % 128 == 0 and 24 * m <= 512 for m in range(1, 17))
    for k_req, want in [(25, 32), (44, 48), (48, 48), (49, 64), (65, 96),
                        (97, 128), (130, 192), (200, 256), (513, 640)]:
        got = _round_k(k_req)
        assert got == want, (k_req, got, want)
        if want <= 512:  # legality invariant the kernels rely on
            assert any(got * m % 128 == 0 and got * m <= 512
                       for m in range(1, 9)), got
