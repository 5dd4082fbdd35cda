"""Equivariant tensor products on the TPU-friendly *uniform* irreps layout.

Layout: features are dense arrays ``(..., C, D)`` where ``D = (lmax+1)^2`` and
every channel ``c`` carries one copy of each l = 0..lmax (m = -l..l packed).
This rectangular layout is the TPU-first answer to e3nn's ragged irreps
buffers: static shapes, contiguous lanes, and the channel-mixing step becomes
one big MXU matmul per output l.

The reference gets this math from compiled e3nn models inside libtorch
(/root/reference/pair_nequip_allegro.cpp:425 treats the model as a black box);
here it is native XLA (Pallas fusion hooks come in via ops/pallas_tp.py once
profiles justify them).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.prec import get_matmul_precision, matmul_precision_for
from pair_allegro_tpu.ops.so3 import real_wigner_3j, sh_dim, sh_slice


@functools.lru_cache(maxsize=None)
def tp_paths(
    lmax_in1: int, lmax_in2: int, lmax_out: int, parity: bool = False
) -> tuple[tuple[int, int, int], ...]:
    """All triangle-valid (l1, l2, l3) paths between uniform-layout operands.

    With ``parity=True``, odd-sum paths (l1+l2+l3 odd) are dropped: in the
    single-track uniform layout those mix pseudo-tensor character into the
    features, which eventually leaks parity-ODD terms into the energy
    (reflection non-invariance).  Pruning them restores strict O(3)
    equivariance — matching the e3nn-parity models the reference consumes —
    and removes ~1/3 of the tensor-product work."""
    paths = []
    for l1 in range(lmax_in1 + 1):
        for l2 in range(lmax_in2 + 1):
            for l3 in range(abs(l1 - l2), min(lmax_out, l1 + l2) + 1):
                if parity and (l1 + l2 + l3) % 2:
                    continue
                paths.append((l1, l2, l3))
    return tuple(paths)


@functools.lru_cache(maxsize=None)
def paths_to_l(
    lmax_in1: int, lmax_in2: int, l3: int, parity: bool = False
) -> tuple[tuple[int, int], ...]:
    return tuple(
        (l1, l2)
        for (l1, l2, l) in tp_paths(lmax_in1, lmax_in2, max(l3, lmax_in1), parity)
        if l == l3  # noqa: E741
    )


def num_paths_per_l(
    lmax_in1: int, lmax_in2: int, lmax_out: int, parity: bool = False
) -> list[int]:
    return [
        len(paths_to_l(lmax_in1, lmax_in2, l3, parity)) for l3 in range(lmax_out + 1)
    ]


def _w3j(l1, l2, l3, dtype):
    return jnp.asarray(real_wigner_3j(l1, l2, l3), dtype=dtype)


def uniform_tp(x, y, lmax_out: int, parity: bool = False):
    """Channelwise tensor product on the uniform layout, all paths kept.

    Args:
      x: (..., C, D1) with D1 = (lx+1)^2.
      y: (..., C, D2) or (..., D2) (broadcast over channels, e.g. spherical
         harmonics of the edge).
    Returns:
      list over l3 = 0..lmax_out of arrays (..., C, P_l3, 2*l3+1), where P_l3
      is the number of (l1,l2) paths feeding l3.
    """
    lx = int(math.isqrt(x.shape[-1])) - 1
    if y.ndim == x.ndim - 1:
        y = y[..., None, :]
    ly = int(math.isqrt(y.shape[-1])) - 1
    out = []
    for l3 in range(lmax_out + 1):
        blocks = []
        for (l1, l2) in paths_to_l(lx, ly, l3, parity):
            C = _w3j(l1, l2, l3, x.dtype)
            blocks.append(
                jnp.einsum(
                    "...ci,...cj,ijk->...ck",
                    x[..., sh_slice(l1)],
                    y[..., sh_slice(l2)],
                    C,
                    precision=matmul_precision_for(x.dtype),
                )
            )
        out.append(jnp.stack(blocks, axis=-2) if blocks else None)
    return out


def tp_mix_init(key, lmax_in1: int, lmax_in2: int, lmax_out: int, c_in: int, c_out: int, dtype=jnp.float32, parity: bool = False):
    """Per-l3 channel+path mixing weights for the output of uniform_tp."""
    ws = {}
    for l3 in range(lmax_out + 1):
        p = len(paths_to_l(lmax_in1, lmax_in2, l3, parity))
        if p == 0:
            continue
        key, sub = jax.random.split(key)
        # Flattened (c_in, p) row ordering — must match tp_mix_apply's reshape.
        ws[f"l{l3}"] = jax.random.normal(sub, (c_in * p, c_out), dtype=dtype)
    return ws


def tp_mix_apply(ws: dict, tp_out: list):
    """Mix (channel, path) -> channel per output l, recombining into the
    uniform layout (..., c_out, (lmax_out+1)^2).

    The contraction is an MXU matmul with M = batch*(2l3+1) rows.
    """
    pieces = []
    for l3, t in enumerate(tp_out):
        if t is None:
            continue
        w = ws[f"l{l3}"]
        batch = t.shape[:-3]
        c_in, p, k = t.shape[-3], t.shape[-2], t.shape[-1]
        t = jnp.moveaxis(t, -1, -3)  # (..., k, c, p)
        t = t.reshape(*batch, k, c_in * p)
        m = jnp.dot(t, w.astype(t.dtype), precision=matmul_precision_for(t.dtype)) * (
            1.0 / math.sqrt(c_in * p)
        )
        pieces.append(jnp.moveaxis(m, -1, -2))  # (..., c_out, k)
    return jnp.concatenate(pieces, axis=-1)


def scalar_part(tp_out: list):
    """Extract the l3=0 invariants as (..., C*P0)."""
    t = tp_out[0][..., 0]  # (..., C, P0)
    return t.reshape(*t.shape[:-2], -1)


# (A uniform_tp_table variant contracting the per-center env directly —
# avoiding the (N, K, C, D) broadcast — was tried and measured ~25% SLOWER
# end to end on v5e: XLA re-broadcasts env once per path instead of once.)


# ---------------------------------------------------------------------------
# Packed (MXU) formulation.
#
# uniform_tp dispatches one einsum per (l1,l2,l3) path; each is a tiny
# contraction (last dims 1..5) that lowers to low-lane-utilization VPU code —
# measured ~30 ms per layer at 300k edges on v5e, 90% of the model.  The TP
# is linear in the outer product O[c, i*j] = x[c,i] * y[c,j], so ALL paths
# collapse into ONE matmul against a cached dense block-sparse 3j matrix
# W (D1*D2, OUT), OUT = Σ_l3 P_l3 (2l3+1) — exactly MXU-shaped work.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def packed_tp_table(lmax_x: int, lmax_y: int, lmax_out: int, parity: bool = False):
    """Dense 3j matrix W (Dx*Dy, OUT) + per-l3 (offset, num_paths) layout.

    OUT columns are ordered l3-major, then path (paths_to_l order), then m3 —
    the fixed convention mix weights are stored in.
    """
    from pair_allegro_tpu.ops.so3 import sh_dim

    dx, dy = sh_dim(lmax_x), sh_dim(lmax_y)
    cols = []
    layout = []
    off = 0
    for l3 in range(lmax_out + 1):
        paths = paths_to_l(lmax_x, lmax_y, l3, parity)
        layout.append((off, len(paths)))
        for (l1, l2) in paths:
            blk = np.zeros((dx, dy, 2 * l3 + 1))
            blk[sh_slice(l1), sh_slice(l2), :] = real_wigner_3j(l1, l2, l3)
            cols.append(blk.reshape(dx * dy, 2 * l3 + 1))
        off += len(paths) * (2 * l3 + 1)
    W = np.concatenate(cols, axis=1) if cols else np.zeros((dx * dy, 0))
    return W, tuple(layout)


def uniform_tp_packed(x, y, lmax_out: int, parity: bool = False):
    """All-path channelwise TP as one MXU matmul.

    Args:
      x: (..., C, D1); y: (..., C, D2) or (..., D2).
    Returns:
      (..., C, OUT) packed per the packed_tp_table layout — numerically
      identical (up to f.p. reassociation) to uniform_tp + stacking.
    """
    lx = int(math.isqrt(x.shape[-1])) - 1
    if y.ndim == x.ndim - 1:
        y = y[..., None, :]
    ly = int(math.isqrt(y.shape[-1])) - 1
    W, _ = packed_tp_table(lx, ly, lmax_out, parity)
    outer = x[..., :, None] * y[..., None, :]  # (..., C, D1, D2)
    outer = outer.reshape(*outer.shape[:-2], -1)
    return jnp.dot(
        outer, jnp.asarray(W, x.dtype), precision=get_matmul_precision()
    )


def packed_scalar_part(T, lmax_x: int, lmax_y: int, lmax_out: int, parity: bool = False):
    """l3=0 invariant columns of a packed TP output, as (..., C*P0)."""
    _, layout = packed_tp_table(lmax_x, lmax_y, lmax_out, parity)
    off, p0 = layout[0]
    t = T[..., off : off + p0]  # (..., C, P0)
    return t.reshape(*t.shape[:-2], -1)


def combined_tp_mix_matrix(ws: dict, lmax: int, dtype=jnp.float32, parity: bool = False):
    """Fold the dense 3j table and the per-l3 mix weights into ONE matrix
    M ((C*81), (D*C_out)) so TP+mix is a single MXU matmul:

      V'[e, k, c'] = Σ_{c, ij} O[e, c, ij] · M[(c,ij), (k,c')],
      O[e, c, ij] = V[e, c, i] * env[e, c, j].

    The per-path einsum formulation underfills vector lanes (trailing dims
    1..5) and measures 30-55 ms/layer at 300k edges on v5e; this form does
    ~6x the minimal FLOPs but all of them on the MXU — measured ~4x faster
    end to end.  Normalization 1/sqrt(P*C) is folded in per l3.
    """
    W3, layout = packed_tp_table(lmax, lmax, lmax, parity)
    d = sh_dim(lmax)
    # infer c_in from l0 weights: rows = C * P0
    p0 = layout[0][1]
    c_in = ws["l0"].shape[0] // p0
    c_out = ws["l0"].shape[1]
    blocks = []
    for l3, (off, p) in enumerate(layout):
        k3 = 2 * l3 + 1
        w3_l = W3[:, off : off + p * k3].reshape(d * d, p, k3)
        wmix = ws[f"l{l3}"].reshape(c_in, p, c_out)  # rows (c, p)-major
        m_l = jnp.einsum(
            "xpk,cpd->cxkd",
            jnp.asarray(w3_l, dtype),
            wmix.astype(dtype),
            precision="highest",
        ) * (1.0 / math.sqrt(c_in * p))
        blocks.append(m_l.reshape(c_in, d * d, k3 * c_out))
    M = jnp.concatenate(blocks, axis=-1)  # (C, 81, D*C_out)
    return M.reshape(c_in * d * d, d * c_out)


def tp_mix_combined(V, env, ws: dict, lmax: int, M=None, parity: bool = False):
    """Fused TP+mix+invariants via the combined matrix (see
    combined_tp_mix_matrix).  V, env: (..., C, D) channels-first.

    Returns (V' (..., C_out, D), inv (..., C*P0)).  Weight-convention note:
    mix rows are (c, p)-major here (matching tp_mix_init/tp_mix_apply).
    """
    *batch, c, d = V.shape
    if M is None:
        M = combined_tp_mix_matrix(ws, lmax, V.dtype, parity)
    outer = V[..., :, None] * env[..., None, :]  # (..., C, D, D)
    O = outer.reshape(*batch, c * d * d)
    out = jnp.dot(O, M.astype(V.dtype), precision=get_matmul_precision())
    out = out.reshape(*batch, d, -1)  # (..., D(k), C_out)
    Vp = jnp.swapaxes(out, -1, -2)  # (..., C_out, D)
    # invariants: l3=0 rows of T (pre-mix): inv[e, c, p0] = Σ_ij O Wl0
    W3, layout = packed_tp_table(lmax, lmax, lmax, parity)
    p0 = layout[0][1]
    w0 = jnp.asarray(W3[:, : p0], V.dtype)  # (81, P0)
    inv = jnp.dot(
        outer.reshape(*batch, c, d * d), w0, precision=get_matmul_precision()
    )  # (..., C, P0)
    inv = inv.reshape(*batch, c * p0)
    return Vp, inv


def tp_mix_apply_packed(ws: dict, T, lmax_x: int, lmax_y: int, lmax_out: int, parity: bool = False):
    """Per-l3 (channel, path) -> channel mix on a packed TP output.

    Consumes the same weight dict as tp_mix_apply (rows ordered (c_in, p))
    and returns the uniform layout (..., c_out, (lmax_out+1)^2).
    """
    _, layout = packed_tp_table(lmax_x, lmax_y, lmax_out, parity)
    c_in = T.shape[-2]
    pieces = []
    for l3, (off, p) in enumerate(layout):
        if p == 0:
            continue
        k = 2 * l3 + 1
        t = T[..., off : off + p * k].reshape(*T.shape[:-2], c_in, p, k)
        w = ws[f"l{l3}"]
        batch = t.shape[:-3]
        t = jnp.moveaxis(t, -1, -3).reshape(*batch, k, c_in * p)
        m = jnp.dot(t, w.astype(t.dtype), precision=get_matmul_precision()) * (
            1.0 / math.sqrt(c_in * p)
        )
        pieces.append(jnp.moveaxis(m, -1, -2))  # (..., c_out, k)
    return jnp.concatenate(pieces, axis=-1)
