"""Fused tensor-product + channel-mix Pallas kernel — THE hot op of Allegro.

Per edge: T[p,k,c] = Σ_{i,j} w3j[i,j,k] V[i,c] env[j,c] (all triangle paths),
then inv = T[l3=0] and V'[k,c'] = Σ_{p,c} T[p,k,c] Wmix[(c,p),c'].

Why a kernel, and why this layout: the XLA per-path einsum lowering measures
~49 ms/layer forward at 300k edges on v5e — ~15x above the HBM floor —
because every lane-level op runs on (edges, C=32) tiles that use 32 of 128
vector lanes.  This kernel runs TRANSPOSED: operands are staged as
(D, C, E_block) with EDGES in the lane dimension, so the ~140 unrolled 3j
FMAs run on fully-occupied (C, E_block) tiles, and the mix contraction is an
MXU matmul per (l3, m) with N = E_block.  T never leaves VMEM.

Autodiff: pallas_call is not differentiable; a custom VJP supplies the
backward pass (same structure).  The VJP treats the mix weights as
CONSTANTS — exact for MD forces -dE/dpos — and NaN-POISONS the weight
cotangents so training-style differentiation fails loudly instead of
silently returning zeros; training-side code must use tp_mix_fused_ref.

Public API works on the MODEL layout (E, C, D) channels-first; the HBM
transposes happen at the XLA level around the kernel.  The pure-jnp
reference `tp_mix_fused_ref` is the correctness oracle and the non-TPU
fallback.

Reference context: this replaces the e3nn tensor products inside the
compiled models the reference runs via libtorch (pair_nequip_allegro.cpp:425).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.so3 import sh_slice
from pair_allegro_tpu.ops.tp import paths_to_l


@functools.lru_cache(maxsize=None)
def _nonzeros(lmax: int, parity: bool = False):
    """Per l3: tuple of (p, i, j, k, w) nonzero 3j entries (global i/j)."""
    from pair_allegro_tpu.ops.so3 import real_wigner_3j

    table = {}
    for l3 in range(lmax + 1):
        entries = []
        for p, (l1, l2) in enumerate(paths_to_l(lmax, lmax, l3, parity)):
            C = real_wigner_3j(l1, l2, l3)
            for i, j, k in zip(*np.nonzero(C)):
                entries.append(
                    (p, int(i) + sh_slice(l1).start, int(j) + sh_slice(l2).start,
                     int(k), float(C[i, j, k]))
                )
        table[l3] = tuple(entries)
    return table


def _kernel_precision(dtype):
    """MXU precision for in-kernel dots, from the global policy (ops/prec.py).

    Mosaic's DEFAULT f32 pass is bf16 (1e-2 rel error) — never acceptable
    silently, so f32 maps to the policy: 'highest' = exact-f32 (6 bf16
    passes), 'high' = bf16x3 (~1e-6 rel, ~2x faster) — the accuracy/speed
    tier knob.  bf16 operands always use the native pass (Mosaic rejects
    multi-pass emulation on bf16).
    """
    if dtype != jnp.float32:
        return jax.lax.Precision.DEFAULT
    from pair_allegro_tpu.ops.prec import get_precision_policy

    return {
        "highest": jax.lax.Precision.HIGHEST,
        "mixed": jax.lax.Precision.HIGHEST,  # kernels stay exact (see prec.py)
        "kernel_high": jax.lax.Precision.HIGH,  # ONLY kernels drop to bf16x3
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[get_precision_policy()]


def _kdot(a, b, prec):
    """In-kernel dot at `prec`; Precision.HIGH is emulated as manual bf16x3
    (Mosaic raises NotImplementedError on native HIGH)."""
    if prec == jax.lax.Precision.HIGH:
        def split(x):
            hi = x.astype(jnp.bfloat16)
            return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        a_hi, a_lo = split(a)
        b_hi, b_lo = split(b)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def tp_mix_fused_ref(V, env, ws, lmax: int, parity: bool = False):
    """Pure-jnp reference on the model layout: V, env (..., C, D) ->
    (V' (..., C_out, D), inv (..., C*P0)).  Matches
    uniform_tp + tp_mix_apply + scalar_part exactly."""
    from pair_allegro_tpu.ops.tp import scalar_part, tp_mix_apply, uniform_tp

    T = uniform_tp(V, env, lmax, parity)
    return tp_mix_apply(ws, T), scalar_part(T)


# ---------------------------------------------------------------------------
# Pallas kernels (transposed layout: (D, C, E_block), edges in lanes)
# ---------------------------------------------------------------------------


def _fwd_kernel(lmax, parity, V_ref, env_ref, *rest):
    n_w = lmax + 1
    w_refs = rest[:n_w]
    out_ref, inv_ref = rest[n_w], rest[n_w + 1]
    V = V_ref[:]      # (D, C, BE)
    env = env_ref[:]  # (D, C, BE)
    _, c, be = V.shape
    nz = _nonzeros(lmax, parity)
    zero = jnp.zeros((c, be), V.dtype)
    mm_prec = _kernel_precision(V.dtype)

    off = 0
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = w_refs[l3][:].astype(V.dtype)  # (C*P, Cout), rows (c, p)-major
        inv_norm = 1.0 / math.sqrt(P * c)
        acc = [[None] * P for _ in range(k3)]
        for (p, i, j, k, wv) in nz[l3]:
            term = wv * V[i] * env[j]  # (C, BE) — full-lane FMA
            acc[k][p] = term if acc[k][p] is None else acc[k][p] + term
        for k in range(k3):
            # T_k: (C, P, BE) -> (C*P, BE); leading-dim reshape only
            t_k = jnp.stack(
                [a if a is not None else zero for a in acc[k]], axis=1
            ).reshape(c * P, be)
            if l3 == 0 and k == 0:
                inv_ref[:] = t_k  # (C*P0, BE), rows (c, p)-major
            # mix: (Cout, C*P) @ (C*P, BE) on the MXU.  Precision must be
            # explicit: Mosaic's default f32 pass is bf16 (1e-2 rel error).
            out_ref[off + k] = (
                _kdot(w.T, t_k, mm_prec).astype(V.dtype) * inv_norm
            )
        off += k3


def _bwd_kernel(lmax, parity, V_ref, env_ref, *rest):
    n_w = lmax + 1
    w_refs = rest[:n_w]
    dout_ref, dinv_ref, dV_ref, denv_ref = rest[n_w : n_w + 4]
    V = V_ref[:]
    env = env_ref[:]
    d_dim, c, be = V.shape
    nz = _nonzeros(lmax, parity)
    mm_prec = _kernel_precision(V.dtype)
    # accumulate straight into the output refs (read-modify-write) so the
    # unrolled body does not hold 2*D long-lived SSA accumulators — that
    # blew the scoped-VMEM stack
    dV_ref[:] = jnp.zeros((d_dim, c, be), V.dtype)
    denv_ref[:] = jnp.zeros((d_dim, c, be), V.dtype)
    off = 0
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = w_refs[l3][:].astype(V.dtype)  # (C*P, Cout)
        inv_norm = 1.0 / math.sqrt(P * c)
        for k in range(k3):
            # dT_k = W @ dout_k / sqrt(PC): (C*P, Cout) @ (Cout, BE)
            g_flat = (
                _kdot(w, dout_ref[off + k], mm_prec).astype(V.dtype) * inv_norm
            )
            if l3 == 0 and k == 0:
                g_flat = g_flat + dinv_ref[:]
            dT = g_flat.reshape(c, P, be)
            for (p, i, j, kk, wv) in nz[l3]:
                if kk != k:
                    continue
                g = wv * dT[:, p, :]
                dV_ref[i] = dV_ref[i] + g * env[j]
                denv_ref[j] = denv_ref[j] + g * V[i]
        off += k3


def _use_pallas():
    return jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tp_mix_fused(V, env, ws_flat, lmax: int, block_e: int = 512, parity: bool = False):
    """Fused TP+mix on the model layout: V, env (E, C, D) -> (V' (E, C_out, D),
    inv (E, C*P0)).  ws_flat: tuple of mix weights ordered l3=0..lmax, each
    (C*P_l3, C_out) with rows (c, p)-major (the tp_mix_init convention)."""
    return _fused_fwd_impl(V, env, ws_flat, lmax, block_e, parity)


def _pad_lanes(x, e_pad):
    e = x.shape[-1]
    if e_pad == e:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, e_pad - e)]
    return jnp.pad(x, widths)


def _fwd_call_t(Vt, envt, ws_flat, lmax, block_e, parity=False):
    """Kernel-layout forward: Vt, envt (D, C, E) -> (Vt' (D, C_out, E),
    invt (C*P0, E))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, c, e = Vt.shape
    c_out = ws_flat[0].shape[1]
    p0 = len(paths_to_l(lmax, lmax, 0, parity))
    e_pad = -(-e // block_e) * block_e
    Vp, ep = _pad_lanes(Vt, e_pad), _pad_lanes(envt, e_pad)
    grid = (e_pad // block_e,)

    def espec(rows, cols):
        return pl.BlockSpec((rows, cols, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws_flat
    ]
    outt, invt = pl.pallas_call(
        functools.partial(_fwd_kernel, lmax, parity),
        grid=grid,
        in_specs=[espec(d, c), espec(d, c)] + w_specs,
        out_specs=[
            espec(d, c_out),
            pl.BlockSpec((c * p0, block_e), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, c_out, e_pad), Vt.dtype),
            jax.ShapeDtypeStruct((c * p0, e_pad), Vt.dtype),
        ],
    )(Vp, ep, *ws_flat)
    return outt[..., :e], invt[..., :e]


def _bwd_call_t(Vt, envt, ws_flat, doutt, dinvt, lmax, block_e, parity=False):
    """Kernel-layout backward: cotangents in kernel layout -> (dVt, denvt)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d, c, e = Vt.shape
    c_out = ws_flat[0].shape[1]
    p0 = len(paths_to_l(lmax, lmax, 0, parity))
    # backward holds ~2x the live tensors of forward: shrink the block
    block_e = max(block_e // 2, 128)
    e_pad = -(-e // block_e) * block_e
    Vp, ep = _pad_lanes(Vt, e_pad), _pad_lanes(envt, e_pad)
    dop, dip = _pad_lanes(doutt, e_pad), _pad_lanes(dinvt, e_pad)
    grid = (e_pad // block_e,)

    def espec(rows, cols):
        return pl.BlockSpec((rows, cols, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws_flat
    ]
    dVt, denvt = pl.pallas_call(
        functools.partial(_bwd_kernel, lmax, parity),
        grid=grid,
        in_specs=[espec(d, c), espec(d, c)] + w_specs + [
            espec(d, c_out),
            pl.BlockSpec((c * p0, block_e), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[espec(d, c), espec(d, c)],
        out_shape=[
            jax.ShapeDtypeStruct((d, c, e_pad), Vt.dtype),
            jax.ShapeDtypeStruct((d, c, e_pad), Vt.dtype),
        ],
    )(Vp, ep, *ws_flat, dop, dip)
    return dVt[..., :e], denvt[..., :e]


def _fused_fwd_impl(V, env, ws_flat, lmax, block_e, parity=False):
    ws = {f"l{l3}": ws_flat[l3] for l3 in range(lmax + 1)}
    if not _use_pallas():
        return tp_mix_fused_ref(V, env, ws, lmax, parity)
    e = V.shape[0]
    outt, invt = _fwd_call_t(
        jnp.transpose(V, (2, 1, 0)), jnp.transpose(env, (2, 1, 0)), ws_flat, lmax,
        block_e, parity,
    )
    return jnp.transpose(outt, (2, 1, 0)), jnp.transpose(invt, (1, 0))


def _fused_fwd(V, env, ws_flat, lmax, block_e, parity):
    return _fused_fwd_impl(V, env, ws_flat, lmax, block_e, parity), (V, env, ws_flat)


def _fused_bwd(lmax, block_e, parity, res, cots):
    V, env, ws_flat = res
    dout, dinv = cots
    ws = {f"l{l3}": ws_flat[l3] for l3 in range(lmax + 1)}
    if not _use_pallas():

        def f(v, e):
            return tp_mix_fused_ref(v, e, ws, lmax, parity)

        _, vjp = jax.vjp(f, V, env)
        dV, denv = vjp((dout, dinv))
        return dV, denv, tuple(jnp.full_like(w, jnp.nan) for w in ws_flat)
    dVt, denvt = _bwd_call_t(
        jnp.transpose(V, (2, 1, 0)),
        jnp.transpose(env, (2, 1, 0)),
        ws_flat,
        jnp.transpose(dout, (2, 1, 0)),
        jnp.transpose(dinv, (1, 0)),
        lmax,
        block_e,
        parity,
    )
    dV = jnp.transpose(dVt, (2, 1, 0))
    denv = jnp.transpose(denvt, (2, 1, 0))
    # mix weights are parameters, not functions of positions: NaN-poisoned
    # cotangent (exact for -dE/dpos; training w.r.t. weights fails loudly)
    return dV, denv, tuple(jnp.full_like(w, jnp.nan) for w in ws_flat)


tp_mix_fused.defvjp(_fused_fwd, _fused_bwd)


# --- t-layout API: V persists in kernel layout across layers -----------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def tp_mix_fused_t(Vt, envt, ws_flat, lmax: int, block_e: int = 512, parity: bool = False):
    """Fused TP+mix on the KERNEL layout: Vt, envt (D, C, E) ->
    (Vt' (D, C_out, E), inv (E, C*P0)).  Weight cotangents NaN-poisoned
    (see module doc).

    Avoids the two 350 MB/layer HBM transposes of the (E, C, D) API when the
    caller keeps V in kernel layout across layers (the Allegro layer stack
    does: only the small inv crosses back to edge-major).
    """
    return _fused_t_fwd_impl(Vt, envt, ws_flat, lmax, block_e, parity)


def _fused_t_fwd_impl(Vt, envt, ws_flat, lmax, block_e, parity=False):
    if not _use_pallas():
        ws = {f"l{l3}": ws_flat[l3] for l3 in range(lmax + 1)}
        out, inv = tp_mix_fused_ref(
            jnp.transpose(Vt, (2, 1, 0)), jnp.transpose(envt, (2, 1, 0)), ws, lmax,
            parity,
        )
        return jnp.transpose(out, (2, 1, 0)), inv
    outt, invt = _fwd_call_t(Vt, envt, ws_flat, lmax, block_e, parity)
    return outt, jnp.transpose(invt, (1, 0))


def _fused_t_fwd(Vt, envt, ws_flat, lmax, block_e, parity):
    return _fused_t_fwd_impl(Vt, envt, ws_flat, lmax, block_e, parity), (Vt, envt, ws_flat)


def _fused_t_bwd(lmax, block_e, parity, res, cots):
    Vt, envt, ws_flat = res
    doutt, dinv = cots
    if not _use_pallas():
        ws = {f"l{l3}": ws_flat[l3] for l3 in range(lmax + 1)}

        def f(v, e):
            out, inv = tp_mix_fused_ref(
                jnp.transpose(v, (2, 1, 0)), jnp.transpose(e, (2, 1, 0)), ws, lmax,
                parity,
            )
            return jnp.transpose(out, (2, 1, 0)), inv

        _, vjp = jax.vjp(f, Vt, envt)
        dVt, denvt = vjp((doutt, dinv))
        return dVt, denvt, tuple(jnp.full_like(w, jnp.nan) for w in ws_flat)
    dVt, denvt = _bwd_call_t(
        Vt, envt, ws_flat, doutt, jnp.transpose(dinv, (1, 0)), lmax, block_e, parity
    )
    return dVt, denvt, tuple(jnp.full_like(w, jnp.nan) for w in ws_flat)


tp_mix_fused_t.defvjp(_fused_t_fwd, _fused_t_bwd)
