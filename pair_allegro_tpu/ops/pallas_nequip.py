"""Fused NequIP convolution kernel (TABLE layout, edge-major).

One Pallas kernel computes, per message-passing layer, the whole per-edge
pipeline — radial MLP of the (envelope-weighted) Bessel basis, the tensor
product (l_max=1: the five hand-derived closed forms; l_max=2: the generic
entry-table unroll of the same real-3j contraction,
models/nequip._tp_entry_table), and the K-group aggregation — with every
per-edge intermediate living in VMEM.  Motivation (measured, benchmarks/profile_step.py PAT_PROFILE_MODEL=
nequip, v5e, 5,324 atoms / 340k edges, l_max=1 parity 3x64 — the reference's
NequIP config of record, /root/reference/tests/test_data/
test_repro_nequip.yaml:83-100): the XLA path spends ~300 ms/step streaming
~100 (E, 512)-class tensors through HBM in the force VJP — the radial-weight
tensor alone is (E, 640) written+read per layer — while the useful math is
tiny.  The kernel reduces per-layer HBM traffic to: read the pre-gathered
neighbor features hj (E, DF) + edge scalars, write agg (N, DF).

Layout: EDGE-major — rows are edges (BE = CN*K per block, complete K-groups,
like the Allegro kernels' center-aligned blocks), lanes are features with
channels minor: hj lane (d*T + tau)*C + c, radial lane (tau*P + p)*C + c (the
trace-time column permutation models/nequip._radial_cl already applies).
Aggregation over each center's K contiguous edge rows is one MXU matmul
against the (CN, BE) group-indicator matrix (the Allegro kernels'
_s_matrix pattern).

Backward: recompute-based custom VJP (same decision as the Allegro stack
kernels — storing per-edge residuals loses to recompute at v5e bandwidth).
Weight cotangents are NaN-poisoned exactly like the Allegro kernels; the
training path runs the XLA graph (NequIPConfig.for_training flips
fused_conv off).

The reference's analog of this file is the Kokkos device path of the pair
style (/root/reference/pair_nequip_allegro_kokkos.cpp:87-353) — there the
model itself is a TorchScript black box; here the model IS the kernel.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.mlp import silu_norm_const

_ACT_C = silu_norm_const()


def _consts():
    from pair_allegro_tpu.models.nequip import _lmax1_consts

    return _lmax1_consts()


def _entry_table(lmax: int):
    from pair_allegro_tpu.models.nequip import _tp_entry_table

    return _tp_entry_table(lmax)


def _num_paths(lmax: int) -> int:
    return sum(n for (n, _rows) in _entry_table(lmax))


def _silu(z):
    return z * (1.0 / (1.0 + jnp.exp(-z)))


def _dsilu(z):
    s = 1.0 / (1.0 + jnp.exp(-z))
    return s * (1.0 + z * (1.0 - s))


def _kprec(dtype):
    from pair_allegro_tpu.ops.pallas_tp import _kernel_precision

    return _kernel_precision(dtype)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _dg(a, b, dims, prec):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32
        if a.dtype in (jnp.float32, jnp.bfloat16)
        else None,
        precision=prec,
    )


def _dot(a, b, trans_a: bool = False):
    """a @ b (or aT @ b) at the policy precision (pallas_tp._kernel_precision
    — bf16x3 under the default kernel_high tier, emulated manually because
    Mosaic rejects native Precision.HIGH; the Allegro kernels' _mm twin).
    Was hard-coded HIGHEST through r4 — 6 MXU passes where 3 give ~1e-6 rel."""
    dims = (((0,) if trans_a else (1,)), (0,))
    prec = _kprec(a.dtype)
    if prec == jax.lax.Precision.HIGH:
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        d = jax.lax.Precision.DEFAULT
        return _dg(a_hi, b_hi, dims, d) + _dg(a_hi, b_lo, dims, d) + _dg(
            a_lo, b_hi, dims, d
        )
    return _dg(a, b, dims, prec)


def _agg_mode() -> str:
    return os.environ.get("PAT_NEQUIP_AGG_MM", "split2")


def _agg_dot(r, x, trans_r: bool = False):
    """Aggregation matmul against the 0/1 group-indicator R (or its
    transpose-broadcast in the backward): R is EXACT in bf16, so splitting
    the DATA operand hi/lo bf16 gives ~f32 products in 2 DEFAULT passes
    instead of HIGHEST's 6 — the Allegro kernels' _mm_env split2 pattern
    (measured there: no visible contribution to the force error floor).
    f64 (CPU interpret tier) stays exact; PAT_NEQUIP_AGG_MM=highest
    restores the r4 formulation."""
    dims = (((0,) if trans_r else (1,)), (0,))
    if x.dtype != jnp.float32 or _agg_mode() == "highest":
        return _dg(r, x, dims, jax.lax.Precision.HIGHEST)
    # r arrives PRE-CAST bf16 from _conv_call (0/1 entries, exact): an
    # in-kernel astype copy of the (CN, BE) matrix cost 124 KB of scoped
    # VMEM over the 32 MB limit at the bench block geometry (measured OOM)
    r16 = r if r.dtype == jnp.bfloat16 else r.astype(jnp.bfloat16)
    acc = None
    rem = x
    for _ in range(2):
        hi = rem.astype(jnp.bfloat16)
        rem = rem - hi.astype(jnp.float32)
        t = _dg(r16, hi, dims, jax.lax.Precision.DEFAULT)
        acc = t if acc is None else acc + t
    return acc


def _group_matrix(cn: int, K: int) -> np.ndarray:
    """(CN, BE) indicator: row c sums edge rows [c*K, (c+1)*K)."""
    r = np.zeros((cn, cn * K), np.float32)
    for c in range(cn):
        r[c, c * K : (c + 1) * K] = 1.0
    return r


def _radial(ws, bes):
    """Normalized silu MLP, final layer linear (ops.mlp.mlp_apply twin)."""
    x = bes
    n = len(ws)
    for i, w in enumerate(ws):
        x = _dot(x, w) * (1.0 / math.sqrt(w.shape[0]))
        if i < n - 1:
            x = _silu(x) * _ACT_C
    return x


def _radial_saved(ws, bes):
    """Forward keeping pre-activation z per hidden layer (for the VJP)."""
    x = bes
    zs, hs = [], [bes]
    n = len(ws)
    for i, w in enumerate(ws):
        z = _dot(x, w) * (1.0 / math.sqrt(w.shape[0]))
        if i < n - 1:
            zs.append(z)
            x = _silu(z) * _ACT_C
            hs.append(x)
        else:
            x = z
    return x, zs, hs


def _dot_t(a, w):
    """a @ w.T without materializing the transpose: contract lane dims —
    at the policy precision like :func:`_dot`."""
    dims = ((1,), (1,))
    prec = _kprec(a.dtype)
    if prec == jax.lax.Precision.HIGH:
        a_hi, a_lo = _split_bf16(a)
        w_hi, w_lo = _split_bf16(w)
        d = jax.lax.Precision.DEFAULT
        return _dg(a_hi, w_hi, dims, d) + _dg(a_hi, w_lo, dims, d) + _dg(
            a_lo, w_hi, dims, d
        )
    return _dg(a, w, dims, prec)


def _msg_terms(hj, w, y, C, n_tracks, c3):
    """Shared closed-form l_max=1 message, lane-sliced.

    hj: (BE, 4*T*C); w: (BE, T*5*C); y: (BE, 4).
    Returns the dict {(d, tau): (BE, C)} of lane-group parts (the packed
    msg lane order is (d*T + tau)*C; callers consume parts one at a time).
    """
    c000, c110, c011, c101, C111 = c3
    n0, n1 = 1.0 / math.sqrt(2.0), 1.0 / math.sqrt(3.0)
    T = n_tracks

    def hsl(d, tau):
        o = (d * T + tau) * C
        return hj[:, o : o + C]

    def wsl(pi, p):
        o = (pi * 5 + p) * C
        return w[:, o : o + C]

    y0 = y[:, 0:1]
    yv = [y[:, 1 + i : 2 + i] for i in range(3)]

    def cross_k(vs, k):
        acc = None
        for i in range(3):
            for j in range(3):
                cc = float(C111[i, j, k])
                if abs(cc) < 1e-14:
                    continue
                t = cc * vs[i] * yv[j]
                acc = t if acc is None else acc + t
        return acc

    parts = {}
    for tau in range(T):
        pe, po = (tau, 1 - tau) if T == 2 else (0, 0)
        s_e, s_o = hsl(0, pe), hsl(0, po)
        v_e = [hsl(1 + i, pe) for i in range(3)]
        v_o = [hsl(1 + i, po) for i in range(3)]
        dot_vy = v_o[0] * yv[0] + v_o[1] * yv[1] + v_o[2] * yv[2]
        parts[(0, tau)] = n0 * (
            wsl(pe, 0) * (c000 * s_e * y0) + wsl(po, 1) * (c110 * dot_vy)
        )
        for k in range(3):
            parts[(1 + k, tau)] = n1 * (
                wsl(po, 2) * (c011 * s_o) * yv[k]
                + wsl(pe, 3) * (c101 * v_e[k]) * y0
                + wsl(po, 4) * cross_k(v_o, k)
            )
    return parts


def _msg_terms_generic(hj, w, y, C, n_tracks, lmax):
    """Generic-l_max message parts {(d3, tau): (BE, C)} from the unrolled
    entry table (models/nequip._tp_entry_table) — the lmax==1 closed forms
    (_msg_terms) are this table's hand-derived instance; routing and norms
    match models/nequip._msg_generic_*_cl exactly."""
    T = n_tracks
    P = _num_paths(lmax)

    def hsl(d, tau):
        o = (d * T + tau) * C
        return hj[:, o : o + C]

    def wsl(pi, p):
        o = (pi * P + p) * C
        return w[:, o : o + C]

    parts = {}
    for l3, (n_paths, rows) in enumerate(_entry_table(lmax)):
        norm = 1.0 / math.sqrt(max(n_paths, 1))
        for k in range(2 * l3 + 1):
            d3 = l3 * l3 + k
            accs = [None] * T
            for (pg, l1, l2, entries) in rows:
                for pi in range(T):
                    tau = (pi ^ (l2 % 2)) if T == 2 else 0
                    t = None
                    for (d1, d2, kk, c) in entries:
                        if kk != k:
                            continue
                        term = (c * hsl(d1, pi)) * y[:, d2 : d2 + 1]
                        t = term if t is None else t + term
                    if t is None:
                        continue
                    contrib = wsl(pi, pg) * t
                    accs[tau] = contrib if accs[tau] is None else accs[tau] + contrib
            for tau in range(T):
                parts[(d3, tau)] = (
                    accs[tau] * norm
                    if accs[tau] is not None
                    else jnp.zeros_like(hsl(0, 0))
                )
    return parts


def _conv_fwd_kernel(C, n_tracks, n_ws, inv_avg, lmax, *refs):
    hj_ref, bes_ref, u_ref, y_ref, r_ref = refs[:5]
    ws = [refs[5 + i][:] for i in range(n_ws)]
    out_ref = refs[5 + n_ws]
    w = _radial(ws, bes_ref[:]) * u_ref[:]
    # bf16 hj boundary tier (PAT_NEQUIP_HJ=bf16): the gather operand arrives
    # half-width; upcast once in VMEM, compute in f32
    hj = hj_ref[:]
    if hj.dtype == jnp.bfloat16:
        hj = hj.astype(jnp.float32)
    y = y_ref[:]
    r = r_ref[:]
    # one (d, tau) part at a time, each consumed by its own R matmul into an
    # output lane slice: the live set stays ~3 (BE, DF)-class blocks (vs the
    # build-msg-then-concat form that OOMed scoped VMEM at BE=2048)
    if lmax == 1:
        parts = _msg_terms(hj, w, y, C, n_tracks, _consts())
    else:
        parts = _msg_terms_generic(hj, w, y, C, n_tracks, lmax)
    T = n_tracks
    for d in range((lmax + 1) ** 2):
        for tau in range(T):
            o = (d * T + tau) * C
            out_ref[:, o : o + C] = _agg_dot(r, parts[(d, tau)]) * inv_avg


def _bwd_accum_generic(hj, w, dmsg, y, C, T, lmax):
    """Generic-l_max backward accumulation from the entry table: returns
    (dh {(d1, track)}, dw {(pi, p_global)}, dy list over D of (BE, C) or
    None) — the hand-written lmax==1 block below is this logic's derived
    instance (same recompute-for-dw policy)."""
    P = _num_paths(lmax)

    def hsl(d, tau):
        o = (d * T + tau) * C
        return hj[:, o : o + C]

    def wsl(pi, p):
        o = (pi * P + p) * C
        return w[:, o : o + C]

    def msl(d, tau):
        o = (d * T + tau) * C
        return dmsg[:, o : o + C]

    dh, dw = {}, {}
    dy = [None] * ((lmax + 1) ** 2)

    def add(dic, key, val):
        dic[key] = val if key not in dic else dic[key] + val

    for l3, (n_paths, rows) in enumerate(_entry_table(lmax)):
        norm = 1.0 / math.sqrt(max(n_paths, 1))
        for k in range(2 * l3 + 1):
            d3 = l3 * l3 + k
            for (pg, l1, l2, entries) in rows:
                ent_k = [e for e in entries if e[2] == k]
                if not ent_k:
                    continue
                for pi in range(T):
                    tau = (pi ^ (l2 % 2)) if T == 2 else 0
                    g3 = msl(d3, tau) * norm
                    gw = g3 * wsl(pi, pg)
                    t = None
                    for (d1, d2, _kk, c) in ent_k:
                        hv = hsl(d1, pi)
                        yv = y[:, d2 : d2 + 1]
                        term = (c * hv) * yv
                        t = term if t is None else t + term
                        add(dh, (d1, pi), (c * gw) * yv)
                        tyd = (c * gw) * hv
                        dy[d2] = tyd if dy[d2] is None else dy[d2] + tyd
                    add(dw, (pi, pg), g3 * t)
    return dh, dw, dy


def _bwd_epilogue(dh, dw, dy_cols, w_raw, u, ws, zs, T, lmax,
                  dhj_ref, dbes_ref, du_ref, dy_ref):
    """Shared backward epilogue: pack dh/dw/dy into the output refs and run
    the radial-MLP bessel backward (weight grads NaN at the wrapper)."""
    D = (lmax + 1) ** 2
    P = _num_paths(lmax)
    zero = None
    for v in dh.values():
        zero = jnp.zeros_like(v)
        break
    dhj_ref[:] = jnp.concatenate(
        [dh.get((d, tau), zero) for d in range(D) for tau in range(T)], axis=1
    ).astype(dhj_ref.dtype)
    dw_full = jnp.concatenate(
        [dw[(pi, p)] for pi in range(T) for p in range(P)], axis=1
    )
    du_ref[:] = jnp.sum(dw_full * w_raw, axis=1, keepdims=True)
    zcol = jnp.zeros_like(du_ref[:])
    dy_ref[:] = jnp.concatenate(
        [
            jnp.sum(dy_cols[d], axis=1, keepdims=True)
            if dy_cols[d] is not None
            else zcol
            for d in range(D)
        ],
        axis=1,
    )
    g = dw_full * u
    n = len(ws)
    for i in range(n - 1, -1, -1):
        g = _dot_t(g, ws[i]) * (1.0 / math.sqrt(ws[i].shape[0]))
        if i > 0:
            g = g * _dsilu(zs[i - 1]) * _ACT_C
    dbes_ref[:] = g


def _conv_bwd_kernel(C, n_tracks, n_ws, inv_avg, lmax, *refs):
    hj_ref, bes_ref, u_ref, y_ref, r_ref = refs[:5]
    ws = [refs[5 + i][:] for i in range(n_ws)]
    dagg_ref = refs[5 + n_ws]
    dhj_ref, dbes_ref, du_ref, dy_ref = refs[6 + n_ws : 10 + n_ws]
    c3 = _consts()
    c000, c110, c011, c101, C111 = c3
    n0, n1 = 1.0 / math.sqrt(2.0), 1.0 / math.sqrt(3.0)
    T = n_tracks

    hj = hj_ref[:]
    if hj.dtype == jnp.bfloat16:
        hj = hj.astype(jnp.float32)
    u = u_ref[:]
    y = y_ref[:]
    w_raw, zs, hs = _radial_saved(ws, bes_ref[:])
    w = w_raw * u

    # dmsg = R^T @ dagg (broadcast each center's cotangent to its K rows)
    dmsg = _agg_dot(r_ref[:], dagg_ref[:], trans_r=True) * inv_avg

    def hsl(d, tau):
        o = (d * T + tau) * C
        return hj[:, o : o + C]

    def wsl(pi, p):
        o = (pi * 5 + p) * C
        return w[:, o : o + C]

    def msl(d, tau):
        o = (d * T + tau) * C
        return dmsg[:, o : o + C]

    if lmax != 1:
        dh, dw, dy_cols = _bwd_accum_generic(hj, w, dmsg, y, C, T, lmax)
        _bwd_epilogue(
            dh, dw, dy_cols, w_raw, u, ws, zs, T, lmax,
            dhj_ref, dbes_ref, du_ref, dy_ref,
        )
        return

    y0 = y[:, 0:1]
    yv = [y[:, 1 + i : 2 + i] for i in range(3)]

    dh = {}  # (d, tau) -> (BE, C)
    dw = {}  # (pi, p) -> (BE, C)
    dy0 = None
    dyv = [None, None, None]

    def add(dic, key, val):
        dic[key] = val if key not in dic else dic[key] + val

    for tau in range(T):
        pe, po = (tau, 1 - tau) if T == 2 else (0, 0)
        s_e, s_o = hsl(0, pe), hsl(0, po)
        v_e = [hsl(1 + i, pe) for i in range(3)]
        v_o = [hsl(1 + i, po) for i in range(3)]
        g0 = msl(0, tau) * n0
        # d=0 term 1: w[pe,0] * c000 * s_e * y0
        add(dh, (0, pe), g0 * wsl(pe, 0) * (c000 * y0))
        add(dw, (pe, 0), g0 * (c000 * s_e * y0))
        t_y0 = g0 * wsl(pe, 0) * (c000 * s_e)
        dy0 = t_y0 if dy0 is None else dy0 + t_y0
        # d=0 term 2: w[po,1] * c110 * (v_o . yv)
        gv = g0 * wsl(po, 1) * c110
        dot_vy = v_o[0] * yv[0] + v_o[1] * yv[1] + v_o[2] * yv[2]
        add(dw, (po, 1), g0 * (c110 * dot_vy))
        for i in range(3):
            add(dh, (1 + i, po), gv * yv[i])
            t = gv * v_o[i]
            dyv[i] = t if dyv[i] is None else dyv[i] + t
        for k in range(3):
            gk = msl(1 + k, tau) * n1
            # term a: w[po,2] * c011 * s_o * yv_k
            add(dh, (0, po), gk * wsl(po, 2) * (c011 * yv[k]))
            add(dw, (po, 2), gk * (c011 * s_o) * yv[k])
            dyv[k] = dyv[k] + gk * wsl(po, 2) * (c011 * s_o)
            # term b: w[pe,3] * c101 * v_e[k] * y0
            add(dh, (1 + k, pe), gk * wsl(pe, 3) * (c101 * y0))
            add(dw, (pe, 3), gk * (c101 * v_e[k]) * y0)
            dy0 = dy0 + gk * wsl(pe, 3) * (c101 * v_e[k])
            # term c: w[po,4] * cross_k(v_o, yv)
            gc = gk * wsl(po, 4)
            cross = None
            for i in range(3):
                for j in range(3):
                    cc = float(C111[i, j, k])
                    if abs(cc) < 1e-14:
                        continue
                    t = cc * v_o[i] * yv[j]
                    cross = t if cross is None else cross + t
                    add(dh, (1 + i, po), (cc * gc) * yv[j])
                    dyv[j] = dyv[j] + (cc * gc) * v_o[i]
            add(dw, (po, 4), gk * cross)

    dhj_ref[:] = jnp.concatenate(
        [dh[(d, tau)] for d in range(4) for tau in range(T)], axis=1
    ).astype(dhj_ref.dtype)
    dw_full = jnp.concatenate(
        [dw[(pi, p)] for pi in range(T) for p in range(5)], axis=1
    )
    du_ref[:] = jnp.sum(dw_full * w_raw, axis=1, keepdims=True)
    dy_ref[:] = jnp.concatenate(
        [jnp.sum(dy0, axis=1, keepdims=True)]
        + [jnp.sum(dyv[i], axis=1, keepdims=True) for i in range(3)],
        axis=1,
    )
    # radial MLP backward (w.r.t. bessel only; weight grads NaN at wrapper)
    g = dw_full * u
    n = len(ws)
    for i in range(n - 1, -1, -1):
        g = _dot_t(g, ws[i]) * (1.0 / math.sqrt(ws[i].shape[0]))
        if i > 0:
            g = g * _dsilu(zs[i - 1]) * _ACT_C
    dbes_ref[:] = g


def _pick_cn(n_atoms: int, K: int, df: int) -> int | None:
    """Largest multiple-of-8 CN (sublane tiling of the (CN, DF) output
    block) with BE=CN*K edge rows per block within the VMEM budget.  The
    wrapper zero-pads the edge rows up to a CN multiple of centers (padded
    edges carry u=0, so they contribute nothing)."""
    # with the part-wise forward (one (d,tau) R-matmul at a time) the live
    # set is ~4 (BE, DF)-class blocks; 4 MB of rows*DF keeps scoped VMEM
    # inside the 32 MB limit (the build-msg-then-concat form measured 40 MB
    # at BE=2048 and OOMed)
    # 3.5 MB of rows*DF (was 4 MB through r4): the split2 aggregation's
    # hi/lo bf16 temporaries measured the 4 MB geometry 124 KB over the
    # 32 MB scoped-VMEM limit on chip at the 500-atom accuracy config
    budget_rows = max(256, min(2048, (7 * 2**19) // (df * 4)))
    cn = (budget_rows // K) // 8 * 8
    if cn < 8:
        return None
    return min(cn, max(8, n_atoms // 8 * 8) or 8)


def _conv_call(kernel, C, n_tracks, n_ws, inv_avg, lmax, edge_args, ws, out_shapes, cn, K, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = edge_args[0].shape[0]
    be = cn * K
    grid = (e // be,)
    # compute dtype: f32 even when hj rides the bf16 boundary tier
    cdt = (
        jnp.float32
        if edge_args[0].dtype == jnp.bfloat16
        else edge_args[0].dtype
    )
    # under split2 aggregation R rides as bf16 (0/1 entries, exact) — saves
    # the (CN, BE) f32 block AND the in-kernel astype copy (see _agg_dot)
    r_dt = (
        jnp.bfloat16
        if cdt == jnp.float32 and _agg_mode() != "highest"
        else cdt
    )
    r = jnp.asarray(_group_matrix(cn, K), r_dt)

    def espec(a):
        return pl.BlockSpec((be, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def cspec(cols):
        return pl.BlockSpec((cn, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def fullspec(w):
        return pl.BlockSpec(w.shape, lambda i: tuple(0 for _ in w.shape),
                            memory_space=pltpu.VMEM)

    def espec_cols(cols):
        return pl.BlockSpec((be, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [espec(a) for a in edge_args[:4]]
    in_specs.append(fullspec(r))
    in_specs += [fullspec(w) for w in ws]
    extra_edge = edge_args[4:]  # bwd: dagg rides as a center-blocked input
    in_specs += [cspec(a.shape[1]) for a in extra_edge]
    out_specs = []
    shapes = []
    n_centers = e // K
    for (rows, cols, dt) in out_shapes:
        if rows == "c":
            out_specs.append(cspec(cols))
            shapes.append(jax.ShapeDtypeStruct((n_centers, cols), dt))
        else:
            out_specs.append(espec_cols(cols))
            shapes.append(jax.ShapeDtypeStruct((e, cols), dt))
    # above the 16 MB default for the unrolled live set; 32 MB measured safe
    # on v5e (the Allegro stack kernels' setting) — higher values compile
    # but fault at runtime
    params = pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20)
    return pl.pallas_call(
        functools.partial(kernel, C, n_tracks, n_ws, inv_avg, lmax),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=shapes if len(shapes) > 1 else shapes[0],
        compiler_params=params,
        interpret=interpret,
    )(*edge_args[:4], r, *ws, *extra_edge)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _conv(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta):
    """meta = (inv_avg, interpret, lmax)."""
    return _conv_fwd_impl(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta)


def _conv_fwd_impl(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta):
    inv_avg, interpret, lmax = meta
    # agg stays full-width even when hj rides the bf16 boundary (it feeds
    # the self-connection/mix matmuls directly)
    agg_dt = jnp.float32 if hjf.dtype == jnp.bfloat16 else hjf.dtype
    return _conv_call(
        _conv_fwd_kernel, C, n_tracks, len(ws_flat), inv_avg, lmax,
        (hjf, bes, u, Y), ws_flat,
        [("c", hjf.shape[1], agg_dt)], cn, K, interpret,
    )


def _conv_fwd(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta):
    out = _conv_fwd_impl(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta)
    return out, (hjf, bes, u, Y, ws_flat)


def _conv_bwd(C, n_tracks, cn, K, meta, res, dagg):
    hjf, bes, u, Y, ws_flat = res
    inv_avg, interpret, lmax = meta
    # the backward holds ~3x the forward's live set (dmsg/dhj/dw blocks):
    # shrink the block to stay inside the VMEM budget.  cn_b must (a) divide
    # cn so the padded edge array tiles exactly and (b) be a multiple of 8
    # (Mosaic sublane tiling of the center-blocked dagg input — cn//4 alone
    # failed lowering at cn=40 on-chip, caught by the verify-tpu gate)
    cn_b = 8
    for d in range(max(8, cn // 4 // 8 * 8), 7, -8):
        if cn % d == 0:
            cn_b = d
            break
    dhj, dbes, du, dy = _conv_call(
        _conv_bwd_kernel, C, n_tracks, len(ws_flat), inv_avg, lmax,
        (hjf, bes, u, Y, dagg), ws_flat,
        [("e", hjf.shape[1], hjf.dtype), ("e", bes.shape[1], bes.dtype),
         ("e", 1, u.dtype), ("e", Y.shape[1], Y.dtype)],
        cn_b, K, interpret,
    )
    # weight cotangents NaN-poisoned (training uses the XLA path; silent
    # zeros were the round-1 footgun — same policy as the Allegro kernels)
    dws = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), ws_flat)
    return dhj, dbes, du, dy, dws


_conv.defvjp(_conv_fwd, _conv_bwd)


def conv_viable(n_atoms: int, K: int, df: int) -> int | None:
    """CN (centers per block) if the kernel can run at these shapes."""
    return _pick_cn(n_atoms, K, df)


def nequip_conv_fused(
    hj, bessel, u, Y, radial_ws, *,
    C: int, n_tracks: int, K: int, cn: int, avg_num_neighbors: float,
    interpret: bool = False, lmax: int = 1,
):
    """Fused message+aggregate: hj (N, K, DF) channels-last pre-gathered
    neighbor features (DF = 4*n_tracks*C), bessel (N, K, B), u (N, K),
    Y (N, K, 4), radial_ws = column-permuted radial MLP weight list
    (models/nequip._radial_cl).  Returns agg (N, DF).
    """
    n, k = u.shape
    hjf = hj.reshape(n * k, -1)
    bes = bessel.reshape(n * k, -1)
    uf = u.reshape(n * k, 1)
    yf = Y.reshape(n * k, -1)
    # pad centers up to a CN multiple: padded edges have u=0 (dead envelope),
    # so they contribute nothing; pad cost <= (CN-1)*K rows (a few MB)
    n_pad = -n % cn
    if n_pad:
        pe = n_pad * k
        pad = lambda a: jnp.pad(a, ((0, pe), (0, 0)))  # noqa: E731
        hjf, bes, uf, yf = pad(hjf), pad(bes), pad(uf), pad(yf)
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    out = _conv(
        hjf, bes, uf, yf, tuple(radial_ws), C, n_tracks, cn, K,
        (inv_avg, interpret, lmax),
    )
    return out[:n].reshape(n, hjf.shape[1]) if n_pad else out.reshape(n, hjf.shape[1])
