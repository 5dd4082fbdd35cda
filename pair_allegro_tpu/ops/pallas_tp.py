"""Fused tensor-product + channel-mix Pallas kernel — THE hot op of Allegro.

Per edge: T[p,k,c] = Σ_{i,j} w3j[i,j,k] V[i,c] env[j,c] (all triangle paths),
then inv = T[l3=0] flattened and V'[k,c] = Σ_{p,c'} T[p,k,c'] Wmix[(p,c'),c].

Measured on v5e at 300k edges: the unfused XLA lowering (one einsum per path)
costs ~30-55 ms/layer because every intermediate (T is ~2 GB at 300k edges)
round-trips HBM and the tiny trailing dims underfill vector lanes.  This
kernel keeps T entirely in VMEM per edge-block: HBM traffic drops to the
V/env reads + V'/inv writes (~1 GB -> ~1.4 ms floor), the 3j contraction is
~140 unrolled lane FMAs, and the mix is an MXU matmul per l3.

Layout is channels-LAST: V, env are (E, D, C) with C in the lane dimension.

Autodiff: pallas_call is not differentiable; a custom VJP supplies the
backward pass (also a Pallas kernel).  The VJP treats the mix weights as
CONSTANTS (zero cotangent) — exact for MD forces -dE/dpos (weights never
depend on positions), wrong for training; training-side code must not
differentiate through this op (use tp_mix_fused_ref).

The pure-jnp reference `tp_mix_fused_ref` is the correctness oracle and the
CPU/non-TPU fallback; `tp_mix_fused` dispatches on backend.

Reference context: this replaces the e3nn tensor products inside the
compiled models the reference runs via libtorch (pair_nequip_allegro.cpp:425).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.so3 import real_wigner_3j, sh_dim, sh_slice
from pair_allegro_tpu.ops.tp import paths_to_l


@functools.lru_cache(maxsize=None)
def _nonzeros(lmax: int):
    """Per l3: list of (p, i, j, k, w) nonzero 3j entries (global i/j/k)."""
    table = {}
    for l3 in range(lmax + 1):
        entries = []
        for p, (l1, l2) in enumerate(paths_to_l(lmax, lmax, l3)):
            C = real_wigner_3j(l1, l2, l3)
            for i, j, k in zip(*np.nonzero(C)):
                entries.append(
                    (p, int(i) + sh_slice(l1).start, int(j) + sh_slice(l2).start,
                     int(k), float(C[i, j, k]))
                )
        table[l3] = tuple(entries)
    return table


def _tp_blocks(V, env, lmax: int):
    """Unrolled 3j contraction on (..., D, C) operands.

    Returns per-l3 arrays (..., 2l3+1, P_l3, C) — k-major then path, the
    row-ordering the mix matmul consumes ((p, c) flattened)."""
    nz = _nonzeros(lmax)
    out = []
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3))
        acc = [[None] * P for _ in range(2 * l3 + 1)]
        for (p, i, j, k, w) in nz[l3]:
            term = w * V[..., i, :] * env[..., j, :]
            acc[k][p] = term if acc[k][p] is None else acc[k][p] + term
        zero = jnp.zeros_like(V[..., 0, :])
        rows = [
            jnp.stack([a if a is not None else zero for a in krow], axis=-2)
            for krow in acc
        ]  # each (..., P, C)
        out.append(jnp.stack(rows, axis=-3))  # (..., K3, P, C)
    return out


def _mix(T_blocks, ws, lmax: int):
    """Per-l3 (path, channel) -> channel mix; returns (..., D, C)."""
    from pair_allegro_tpu.ops.prec import get_matmul_precision

    pieces = []
    for l3, t in enumerate(T_blocks):
        k3, p, c = t.shape[-3], t.shape[-2], t.shape[-1]
        w = ws[f"l{l3}"]  # (p*c, c_out), rows (p, c)-major
        flat = t.reshape(*t.shape[:-2], p * c)
        m = jnp.dot(flat, w.astype(t.dtype), precision=get_matmul_precision()) * (
            1.0 / math.sqrt(p * c)
        )
        pieces.append(m)  # (..., K3, c_out)
    return jnp.concatenate(pieces, axis=-2)


def tp_mix_fused_ref(V, env, ws, lmax: int):
    """Pure-jnp reference: (V' (..., D, C), inv (..., P0*C))."""
    T = _tp_blocks(V, env, lmax)
    inv = T[0][..., 0, :, :]
    inv = inv.reshape(*inv.shape[:-2], -1)  # (..., P0*C)
    return _mix(T, ws, lmax), inv


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(lmax, ws_keys, V_ref, env_ref, *rest):
    """Forward: T in VMEM registers, mix via per-path MXU matmuls.

    Mosaic cannot collapse non-128-aligned minor dims, so everything is
    expressed with leading-dim-only reshapes and per-path 2-D dots.
    """
    from pair_allegro_tpu.ops.prec import get_matmul_precision

    n_w = len(ws_keys)
    w_refs = rest[:n_w]
    out_ref, inv_ref = rest[n_w], rest[n_w + 1]
    V = V_ref[:]
    env = env_ref[:]
    be, _, c = V.shape
    nz = _nonzeros(lmax)

    off = 0
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3))
        k3 = 2 * l3 + 1
        w = w_refs[ws_keys.index(f"l{l3}")][:]  # (P*C, Cout)
        # T for this l3: per (k, p) accumulation of lane FMAs
        acc = [[None] * P for _ in range(k3)]
        for (p, i, j, k, wv) in nz[l3]:
            term = wv * V[:, i, :] * env[:, j, :]
            acc[k][p] = term if acc[k][p] is None else acc[k][p] + term
        zero = jnp.zeros((be, c), V.dtype)
        if l3 == 0:
            inv_ref[:] = jnp.stack(
                [a if a is not None else zero for a in acc[0]], axis=1
            )  # (BE, P0, C)
        # mix: out[k] = Σ_p T[k,p] @ W_p / sqrt(P*C)
        inv_norm = 1.0 / math.sqrt(P * c)
        for k in range(k3):
            m = None
            for p in range(P):
                t = acc[k][p] if acc[k][p] is not None else zero  # (BE, C)
                mp = jnp.dot(
                    t, w[p * c : (p + 1) * c, :], precision=get_matmul_precision()
                )
                m = mp if m is None else m + mp
            out_ref[:, off + k, :] = m * inv_norm
        off += k3


def _bwd_kernel(lmax, ws_keys, V_ref, env_ref, *rest):
    n_w = len(ws_keys)
    w_refs = rest[:n_w]
    dout_ref, dinv_ref, dV_ref, denv_ref = rest[n_w : n_w + 4]
    V = V_ref[:]
    env = env_ref[:]
    dout = dout_ref[:]  # (BE, D, C)
    dinv = dinv_ref[:]  # (BE, P0, C)
    from pair_allegro_tpu.ops.prec import get_matmul_precision

    nz = _nonzeros(lmax)
    d_dim, c = V.shape[-2], V.shape[-1]
    # accumulate rows python-side (static i/j) — no scatter in the kernel
    dV_rows = [None] * d_dim
    denv_rows = [None] * d_dim
    off = 0
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3))
        k3 = 2 * l3 + 1
        w = w_refs[ws_keys.index(f"l{l3}")][:]  # (P*C, Cout)
        inv_norm = 1.0 / math.sqrt(P * c)
        # dT[k][p] = dout[:, off+k, :] @ W_p^T / sqrt(P*C)  (+ dinv for l3=0)
        dT = [[None] * P for _ in range(k3)]
        for k in range(k3):
            d_m = dout[:, off + k, :]  # (BE, Cout)
            for p in range(P):
                g = jnp.dot(
                    d_m, w[p * c : (p + 1) * c, :].T, precision=get_matmul_precision()
                ) * inv_norm
                if l3 == 0:
                    g = g + dinv[:, p, :]
                dT[k][p] = g
        for (p, i, j, k, wv) in nz[l3]:
            g = wv * dT[k][p]
            tv = g * env[:, j, :]
            te = g * V[:, i, :]
            dV_rows[i] = tv if dV_rows[i] is None else dV_rows[i] + tv
            denv_rows[j] = te if denv_rows[j] is None else denv_rows[j] + te
        off += k3
    zero = jnp.zeros((V.shape[0], c), V.dtype)
    dV_ref[:] = jnp.stack([r if r is not None else zero for r in dV_rows], axis=1)
    denv_ref[:] = jnp.stack([r if r is not None else zero for r in denv_rows], axis=1)


def _pad_to(x, n, axis=0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _use_pallas():
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tp_mix_fused(V, env, ws_flat, lmax: int, block_e: int = 256):
    """Fused TP+mix: (V (E, D, C), env (E, D, C), ws) -> (V' (E, D, C),
    inv (E, P0*C)).  ws_flat is the tuple of mix weight arrays ordered
    l3 = 0..lmax (rows (p, c)-major)."""
    return _fused_fwd_impl(V, env, ws_flat, lmax, block_e)


def _fused_fwd_impl(V, env, ws_flat, lmax, block_e):
    ws_keys = tuple(f"l{l3}" for l3 in range(lmax + 1))
    ws = dict(zip(ws_keys, ws_flat))
    if not _use_pallas():
        return tp_mix_fused_ref(V, env, ws, lmax)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, d, c = V.shape
    p0 = len(paths_to_l(lmax, lmax, 0))
    e_pad = -(-e // block_e) * block_e
    Vp, envp = _pad_to(V, e_pad), _pad_to(env, e_pad)
    grid = (e_pad // block_e,)
    edge_spec = pl.BlockSpec((block_e, d, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(ws[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for k in ws_keys
    ]
    out, inv = pl.pallas_call(
        functools.partial(_fwd_kernel, lmax, ws_keys),
        grid=grid,
        in_specs=[edge_spec, edge_spec] + w_specs,
        out_specs=[
            pl.BlockSpec((block_e, d, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, p0, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, d, c), V.dtype),
            jax.ShapeDtypeStruct((e_pad, p0, c), V.dtype),
        ],
    )(Vp, envp, *[ws[k] for k in ws_keys])
    # collapse (P0, C) outside the kernel (Mosaic can't reshape minor dims)
    return out[:e], inv[:e].reshape(e, p0 * c)


def _fused_fwd(V, env, ws_flat, lmax, block_e):
    out = _fused_fwd_impl(V, env, ws_flat, lmax, block_e)
    return out, (V, env, ws_flat)


def _fused_bwd(lmax, block_e, res, cots):
    V, env, ws_flat = res
    dout, dinv = cots
    ws_keys = tuple(f"l{l3}" for l3 in range(lmax + 1))
    ws = dict(zip(ws_keys, ws_flat))
    if not _use_pallas():
        # reference backward via jax.vjp of the reference forward
        def f(v, e):
            return tp_mix_fused_ref(v, e, ws, lmax)

        _, vjp = jax.vjp(f, V, env)
        dV, denv = vjp((dout, dinv))
        return dV, denv, tuple(jnp.zeros_like(w) for w in ws_flat)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, d, c = V.shape
    p0 = len(paths_to_l(lmax, lmax, 0))
    e_pad = -(-e // block_e) * block_e
    Vp, envp = _pad_to(V, e_pad), _pad_to(env, e_pad)
    doutp = _pad_to(dout, e_pad)
    dinvp = _pad_to(dinv.reshape(e, p0, c), e_pad)
    grid = (e_pad // block_e,)
    edge_spec = pl.BlockSpec((block_e, d, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((block_e, p0, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(ws[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for k in ws_keys
    ]
    dV, denv = pl.pallas_call(
        functools.partial(_bwd_kernel, lmax, ws_keys),
        grid=grid,
        in_specs=[edge_spec, edge_spec] + w_specs + [edge_spec, inv_spec],
        out_specs=[edge_spec, edge_spec],
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, d, c), V.dtype),
            jax.ShapeDtypeStruct((e_pad, d, c), V.dtype),
        ],
    )(Vp, envp, *[ws[k] for k in ws_keys], doutp, dinvp)
    # mix weights are parameters, not functions of positions: zero cotangent
    # (exact for -dE/dpos; do NOT use this op to train weights)
    return dV[:e], denv[:e], tuple(jnp.zeros_like(w) for w in ws_flat)


tp_mix_fused.defvjp(_fused_fwd, _fused_bwd)
