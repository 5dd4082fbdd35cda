"""Fused NequIP convolution kernel correctness (ops/pallas_nequip.py).

CPU tier: interpret-mode kernel vs the XLA fast path at f64 (energies,
forces, virial-relevant position grads) for both parities.  TPU tier
(PAT_TEST_TPU=1): the REAL Mosaic kernel vs the XLA path at f32 — the gate
for the miscompile class interpret mode cannot see (same policy as
tests/test_stack_fused.py; rides `make verify-tpu`).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_energy, nequip_init
from pair_allegro_tpu.neighbors.device import reverse_table
from pair_allegro_tpu.neighbors.naive import neighbor_list_np

ON_TPU = jax.default_backend() == "tpu"
DTYPE = jnp.float32 if ON_TPU else jnp.float64
ATOL_E = 5e-4 if ON_TPU else 1e-12
ATOL_F = 5e-4 if ON_TPU else 1e-12


def _table_system(rng, n=40, K=20, box=7.0, r_cut=3.0):
    pos = rng.rand(n, 3) * box
    cell = np.eye(3) * box
    ei, sh = neighbor_list_np(pos, cell, (True,) * 3, r_cut)
    j_tab = np.zeros((n, K), np.int32)
    s_tab = np.zeros((n, K, 3))
    m_tab = np.zeros((n, K), bool)
    cnt = np.zeros(n, int)
    for (i, j), s in zip(ei.T, sh):
        assert cnt[i] < K, "raise K for this fixture"
        j_tab[i, cnt[i]] = j
        s_tab[i, cnt[i]] = s
        m_tab[i, cnt[i]] = True
        cnt[i] += 1
    for i in range(n):
        j_tab[i, cnt[i] :] = i
    rev = reverse_table(jnp.asarray(j_tab), jnp.asarray(s_tab))
    return pos, cell, j_tab, s_tab, m_tab, rev


def _cfg(parity, **kw):
    kw.setdefault("remat", False)
    kw.setdefault("l_max", 1)
    return NequIPConfig(
        type_names=("A", "B"), r_max=3.0, num_layers=2,
        num_features=8, avg_num_neighbors=6.0, parity=parity, **kw,
    )


def _eval(cfg, params, sysargs, fused, monkeypatch):
    pos, cell, j_tab, s_tab, m_tab, rev = sysargs
    if fused:
        monkeypatch.setenv("PAT_FORCE_NEQUIP_FUSED", "1")
    else:
        monkeypatch.delenv("PAT_FORCE_NEQUIP_FUSED", raising=False)
    types = jnp.asarray((np.arange(len(pos)) % 2).astype(np.int32))
    ccfg = cfg if fused else dataclasses.replace(cfg, fused_conv=False)

    def etot(p):
        return nequip_energy(
            params, ccfg, p, types, jnp.asarray(j_tab),
            cell=jnp.asarray(cell, DTYPE),
            edge_shifts=jnp.asarray(s_tab, DTYPE),
            edge_mask=jnp.asarray(m_tab), edge_rev=rev,
        )["total_energy"]

    p0 = jnp.asarray(pos, DTYPE)
    e = etot(p0)
    g = jax.grad(etot)(p0)
    return np.asarray(e), np.asarray(g)


@pytest.mark.parametrize("parity", [False, True])
def test_fused_conv_matches_xla_path(rng, parity, monkeypatch):
    """Kernel (interpret on CPU, real Mosaic on TPU) == XLA fast path."""
    if ON_TPU and DTYPE != jnp.float32:
        pytest.skip("TPU tier is f32")
    sysargs = _table_system(rng)
    cfg = _cfg(parity)
    params = nequip_init(jax.random.PRNGKey(0), cfg, dtype=DTYPE)
    e0, g0 = _eval(cfg, params, sysargs, fused=False, monkeypatch=monkeypatch)
    e1, g1 = _eval(cfg, params, sysargs, fused=True, monkeypatch=monkeypatch)
    assert abs(float(e0) - float(e1)) <= ATOL_E * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(g1, g0, atol=ATOL_F)


def test_weight_grads_nan_poisoned_under_kernel(rng, monkeypatch):
    """The kernel's custom VJP must NaN-poison weight cotangents (loud
    failure, the Allegro kernels' policy), and for_training() must restore
    exact finite weight grads via the XLA path."""
    sysargs = _table_system(rng)
    pos, cell, j_tab, s_tab, m_tab, rev = sysargs
    cfg = _cfg(parity=True)
    params = nequip_init(jax.random.PRNGKey(1), cfg, dtype=DTYPE)
    types = jnp.asarray((np.arange(len(pos)) % 2).astype(np.int32))
    monkeypatch.setenv("PAT_FORCE_NEQUIP_FUSED", "1")

    def etot(prm, c):
        return nequip_energy(
            prm, c, jnp.asarray(pos, DTYPE), types, jnp.asarray(j_tab),
            cell=jnp.asarray(cell, DTYPE),
            edge_shifts=jnp.asarray(s_tab, DTYPE),
            edge_mask=jnp.asarray(m_tab), edge_rev=rev,
        )["total_energy"]

    g_k = jax.grad(lambda p: etot(p, cfg))(params)
    radial_leaves = jax.tree.leaves(
        [layer["radial_mlp"] for layer in g_k["layers"]]
    )
    assert all(bool(jnp.all(jnp.isnan(g))) for g in radial_leaves)
    g_t = jax.grad(lambda p: etot(p, cfg.for_training()))(params)
    assert all(
        bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(g_t)
    )


@pytest.mark.parametrize("parity", [False, True])
def test_fused_conv_matches_xla_path_lmax2(rng, parity, monkeypatch):
    """l_max=2 generic entry-table kernel (r5: the fused conv is no longer
    l_max=1-only) vs the channels-last XLA path — energies + forces."""
    if ON_TPU and DTYPE != jnp.float32:
        pytest.skip("TPU tier is f32")
    if ON_TPU and parity:
        pytest.skip(
            "two-track l_max=2 kernel is interpret-only: Mosaic compile "
            "crash on chip (models/nequip.py kernel_ok gate, r5)"
        )
    sysargs = _table_system(rng)
    cfg = _cfg(parity, l_max=2)
    params = nequip_init(jax.random.PRNGKey(4), cfg, dtype=DTYPE)
    e0, g0 = _eval(cfg, params, sysargs, fused=False, monkeypatch=monkeypatch)
    e1, g1 = _eval(cfg, params, sysargs, fused=True, monkeypatch=monkeypatch)
    assert abs(float(e0) - float(e1)) <= ATOL_E * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(g1, g0, atol=ATOL_F)


@pytest.mark.parametrize("parity", [False, True])
def test_cl_fast_path_matches_generic_lmax2(rng, parity, monkeypatch):
    """The l_max=2 channels-last fast path (generic entry-table unroll)
    vs the channels-first generic layer (PAT_NEQUIP_GENERIC=1) — the same
    oracle relationship the l_max=1 fast path is pinned by in
    tests/test_nequip.py; f64 on CPU so reassociation noise is ~1e-15."""
    if ON_TPU:
        pytest.skip("f64 oracle leg")
    pos, cell, j_tab, s_tab, m_tab, rev = _table_system(rng)
    cfg = _cfg(parity, l_max=2, fused_conv=False)
    params = nequip_init(jax.random.PRNGKey(5), cfg, dtype=DTYPE)
    types = jnp.asarray((np.arange(len(pos)) % 2).astype(np.int32))

    def etot(p):
        return nequip_energy(
            params, cfg, p, types, jnp.asarray(j_tab),
            cell=jnp.asarray(cell, DTYPE),
            edge_shifts=jnp.asarray(s_tab, DTYPE),
            edge_mask=jnp.asarray(m_tab), edge_rev=rev,
        )["total_energy"]

    p0 = jnp.asarray(pos, DTYPE)
    monkeypatch.delenv("PAT_NEQUIP_GENERIC", raising=False)
    e_cl, g_cl = jax.value_and_grad(etot)(p0)
    monkeypatch.setenv("PAT_NEQUIP_GENERIC", "1")
    e_gen, g_gen = jax.value_and_grad(etot)(p0)
    np.testing.assert_allclose(float(e_cl), float(e_gen), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_cl), np.asarray(g_gen), atol=1e-10
    )


@pytest.mark.parametrize("parity", [False, True])
def test_fused_conv_bf16_hj_boundary(rng, parity, monkeypatch):
    """PAT_NEQUIP_HJ=bf16 gather-boundary tier (models/nequip._hj_bf16):
    the h[j] gather and its reverse-table transpose ride bf16, the kernel
    upcasts in VMEM.  Checks the dtype plumbing end to end (custom-VJP dhj
    dtype, f32-accumulated reverse reduce) and bf16-scale agreement with
    the full-f32 fused path; the tier's real accuracy number is measured on
    chip vs the f64 oracle (BASELINE.md)."""
    pos, cell, j_tab, s_tab, m_tab, rev = _table_system(rng)
    cfg = _cfg(parity)
    params = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    types = jnp.asarray((np.arange(len(pos)) % 2).astype(np.int32))
    monkeypatch.setenv("PAT_FORCE_NEQUIP_FUSED", "1")

    def etot(p):
        return nequip_energy(
            params, cfg, p, types, jnp.asarray(j_tab),
            cell=jnp.asarray(cell, jnp.float32),
            edge_shifts=jnp.asarray(s_tab, jnp.float32),
            edge_mask=jnp.asarray(m_tab), edge_rev=rev,
        )["total_energy"]

    p0 = jnp.asarray(pos, jnp.float32)
    e0, g0 = jax.value_and_grad(etot)(p0)
    monkeypatch.setenv("PAT_NEQUIP_HJ", "bf16")
    e1, g1 = jax.value_and_grad(etot)(p0)
    assert bool(jnp.isfinite(e1)) and bool(jnp.all(jnp.isfinite(g1)))
    scale = max(1.0, float(jnp.max(jnp.abs(g0))))
    assert abs(float(e1) - float(e0)) <= 3e-2 * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), atol=5e-2 * scale
    )


@pytest.mark.parametrize("parity", [False, True])
def test_fused_conv_pad_once_rows(rng, parity, monkeypatch):
    """Atom counts that are NOT a conv-block multiple take the pad-once path
    (nequip_energy pads the table to a CN multiple outside the layer loop —
    the r5 fix for ~85 ms/step of per-layer pad/slice formatting) and must
    match the XLA path exactly, including forces through the padded
    u/Y/bessel and the remapped reverse-table sentinel."""
    if ON_TPU and DTYPE != jnp.float32:
        pytest.skip("TPU tier is f32")
    sysargs = _table_system(rng, n=44, K=20)  # 44 % cn(40) != 0 -> pad_n > 0
    cfg = _cfg(parity)
    params = nequip_init(jax.random.PRNGKey(2), cfg, dtype=DTYPE)
    # confirm the fixture actually exercises the padding branch
    from pair_allegro_tpu.ops.pallas_nequip import conv_viable

    n_tracks = 2 if parity else 1
    cn = conv_viable(44, 20, 4 * n_tracks * cfg.num_features)
    assert cn is not None and 44 % cn != 0
    e0, g0 = _eval(cfg, params, sysargs, fused=False, monkeypatch=monkeypatch)
    e1, g1 = _eval(cfg, params, sysargs, fused=True, monkeypatch=monkeypatch)
    assert abs(float(e0) - float(e1)) <= ATOL_E * max(1.0, abs(float(e0)))
    np.testing.assert_allclose(g1, g0, atol=ATOL_F)
