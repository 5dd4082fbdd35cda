"""Fused NequIP convolution kernel (l_max=1, TABLE layout, edge-major).

One Pallas kernel computes, per message-passing layer, the whole per-edge
pipeline — radial MLP of the (envelope-weighted) Bessel basis, the five
closed-form l_max=1 tensor-product paths (see models/nequip.py's fast path),
and the K-group aggregation — with every per-edge intermediate living in
VMEM.  Motivation (measured, benchmarks/profile_step.py PAT_PROFILE_MODEL=
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

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.mlp import silu_norm_const

_ACT_C = silu_norm_const()


def _consts():
    from pair_allegro_tpu.models.nequip import _lmax1_consts

    return _lmax1_consts()


def _silu(z):
    return z * (1.0 / (1.0 + jnp.exp(-z)))


def _dsilu(z):
    s = 1.0 / (1.0 + jnp.exp(-z))
    return s * (1.0 + z * (1.0 - s))


def _dot(a, b, trans_a: bool = False):
    dims = (((0,) if trans_a else (1,)), (0,))
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32 if a.dtype == jnp.float32 else None,
        precision=jax.lax.Precision.HIGHEST,
    )


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
    """a @ w.T without materializing the transpose: contract lane dims."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32 if a.dtype == jnp.float32 else None,
        precision=jax.lax.Precision.HIGHEST,
    )


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


def _conv_fwd_kernel(C, n_tracks, n_ws, inv_avg, *refs):
    hj_ref, bes_ref, u_ref, y_ref, r_ref = refs[:5]
    ws = [refs[5 + i][:] for i in range(n_ws)]
    out_ref = refs[5 + n_ws]
    c3 = _consts()
    w = _radial(ws, bes_ref[:]) * u_ref[:]
    hj = hj_ref[:]
    y = y_ref[:]
    r = r_ref[:]
    # one (d, tau) part at a time, each consumed by its own R matmul into an
    # output lane slice: the live set stays ~3 (BE, DF)-class blocks (vs the
    # build-msg-then-concat form that OOMed scoped VMEM at BE=2048)
    parts = _msg_terms(hj, w, y, C, n_tracks, c3)
    T = n_tracks
    for d in range(4):
        for tau in range(T):
            o = (d * T + tau) * C
            out_ref[:, o : o + C] = _dot(r, parts[(d, tau)]) * inv_avg


def _conv_bwd_kernel(C, n_tracks, n_ws, inv_avg, *refs):
    hj_ref, bes_ref, u_ref, y_ref, r_ref = refs[:5]
    ws = [refs[5 + i][:] for i in range(n_ws)]
    dagg_ref = refs[5 + n_ws]
    dhj_ref, dbes_ref, du_ref, dy_ref = refs[6 + n_ws : 10 + n_ws]
    c3 = _consts()
    c000, c110, c011, c101, C111 = c3
    n0, n1 = 1.0 / math.sqrt(2.0), 1.0 / math.sqrt(3.0)
    T = n_tracks

    hj = hj_ref[:]
    u = u_ref[:]
    y = y_ref[:]
    w_raw, zs, hs = _radial_saved(ws, bes_ref[:])
    w = w_raw * u

    # dmsg = R^T @ dagg (broadcast each center's cotangent to its K rows)
    dmsg = (
        jax.lax.dot_general(
            r_ref[:], dagg_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
            if hj.dtype == jnp.float32
            else None,
            precision=jax.lax.Precision.HIGHEST,
        )
        * inv_avg
    )

    def hsl(d, tau):
        o = (d * T + tau) * C
        return hj[:, o : o + C]

    def wsl(pi, p):
        o = (pi * 5 + p) * C
        return w[:, o : o + C]

    def msl(d, tau):
        o = (d * T + tau) * C
        return dmsg[:, o : o + C]

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
    )
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
    budget_rows = max(256, min(2048, (4 * 2**20) // (df * 4)))
    cn = (budget_rows // K) // 8 * 8
    if cn < 8:
        return None
    return min(cn, max(8, n_atoms // 8 * 8) or 8)


def _conv_call(kernel, C, n_tracks, n_ws, inv_avg, edge_args, ws, out_shapes, cn, K, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = edge_args[0].shape[0]
    be = cn * K
    grid = (e // be,)
    r = jnp.asarray(_group_matrix(cn, K), edge_args[0].dtype)

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
    for (rows, cols) in out_shapes:
        if rows == "c":
            out_specs.append(cspec(cols))
            shapes.append(jax.ShapeDtypeStruct((n_centers, cols), edge_args[0].dtype))
        else:
            out_specs.append(espec_cols(cols))
            shapes.append(jax.ShapeDtypeStruct((e, cols), edge_args[0].dtype))
    # above the 16 MB default for the unrolled live set; 32 MB measured safe
    # on v5e (the Allegro stack kernels' setting) — higher values compile
    # but fault at runtime
    params = pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20)
    return pl.pallas_call(
        functools.partial(kernel, C, n_tracks, n_ws, inv_avg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=shapes if len(shapes) > 1 else shapes[0],
        compiler_params=params,
        interpret=interpret,
    )(*edge_args[:4], r, *ws, *extra_edge)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _conv(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta):
    """meta = (inv_avg, interpret)."""
    return _conv_fwd_impl(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta)


def _conv_fwd_impl(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta):
    inv_avg, interpret = meta
    return _conv_call(
        _conv_fwd_kernel, C, n_tracks, len(ws_flat), inv_avg,
        (hjf, bes, u, Y), ws_flat,
        [("c", hjf.shape[1])], cn, K, interpret,
    )


def _conv_fwd(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta):
    out = _conv_fwd_impl(hjf, bes, u, Y, ws_flat, C, n_tracks, cn, K, meta)
    return out, (hjf, bes, u, Y, ws_flat)


def _conv_bwd(C, n_tracks, cn, K, meta, res, dagg):
    hjf, bes, u, Y, ws_flat = res
    inv_avg, interpret = meta
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
        _conv_bwd_kernel, C, n_tracks, len(ws_flat), inv_avg,
        (hjf, bes, u, Y, dagg), ws_flat,
        [("e", hjf.shape[1]), ("e", bes.shape[1]), ("e", 1), ("e", Y.shape[1])],
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
    interpret: bool = False,
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
        (inv_avg, interpret),
    )
    return out[:n].reshape(n, hjf.shape[1]) if n_pad else out.reshape(n, hjf.shape[1])
