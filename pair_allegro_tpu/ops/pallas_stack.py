"""Fused Allegro kernels v2: in-kernel environment + (parked) full stack.

PRODUCTION PATH: ``tp_mix_env_fused_t`` — the per-layer TP+mix kernel with
the per-center environment aggregated and broadcast INSIDE the kernel over
center-aligned edge blocks (BE = m*K lanes make every cross-edge
interaction block-local).  Nothing (E, C, D)-sized is ever materialized at
the XLA level; measured 146 -> ~80 ms/step at the 5,324-atom bench on v5e
together with the feature-major model tier.

PARKED: ``allegro_stack_apply`` — the fully-fused layer STACK (everything
below).  It measured 2.5x SLOWER than the per-layer kernels: the workload
is VPU-FMA-bound, not HBM-bound, so the saved layer-boundary traffic did
not pay for Mosaic's scheduling of the huge unrolled body; it also faults
under donated-buffer scan chunks.  Kept as a tested opt-in
(cfg.fused_stack) for future tuning.

The original motivation (now superseded by measurement): the per-layer
fused TP kernel (ops/pallas_tp.py) round-trips V (E, C, D) through HBM at
every layer boundary plus the (E, C, D) env broadcast at the XLA level —
fwd 50 ms, fwd+VJP 148 ms at 5,324 atoms.

This kernel exploits the TABLE edge layout's key property: with edge blocks
aligned to whole center rows (BE = m*K lanes), EVERY cross-edge interaction
of the Allegro interior — the per-center environment sum and its broadcast
back to edges — is block-local.  So the full layer stack runs in one
pallas_call per edge block:

    inputs  (read once):  x0 (two-body latent), p_embed, Y, u
    per layer, in VMEM:   w_env = (Wenv^T x) * u
                          env   = per-center sum (matmul with the K-group
                                  indicator S), broadcast back (S^T)
                          T     = channelwise all-paths TP (unrolled 3j FMAs)
                          V'    = per-l3 MXU mix;  inv = T[l3=0]
                          x     = (x + MLP([x, inv]) * u) / sqrt(2)
    output (write once):  x_final

V, env, T, and the MLP activations never touch HBM; HBM traffic per step
drops from ~4.5 GB/layer to ~200 MB total.  The backward kernel recomputes
the forward per block (storing per-layer x/V/w_env in VMEM only) and emits
cotangents for x0, p_embed, Y, u — NOT for weights: weight cotangents are
NaN-POISONED so any training-style use fails loudly instead of silently
returning zeros (MD forces -dE/dpos never need them).

Numerics match the XLA layer loop exactly (same normalization and op
order up to f.p. reassociation); `allegro_stack_ref` is the pure-jnp oracle
and the non-TPU fallback.

Reference context: replaces the compiled-model interior the reference runs
via libtorch (/root/reference/pair_nequip_allegro.cpp:425); the fixed-shape
block design follows the Kokkos padded-buffer philosophy
(/root/reference/pair_nequip_allegro_kokkos.cpp:218-264).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.mlp import silu_norm_const
from pair_allegro_tpu.ops.so3 import sh_dim
from pair_allegro_tpu.ops.tp import paths_to_l
from pair_allegro_tpu.ops.pallas_tp import _nonzeros, _use_pallas

_SILU_C = silu_norm_const()


# ---------------------------------------------------------------------------
# Pure-jnp reference (the oracle + non-TPU fallback).  Mirrors the layer loop
# in models/allegro.py exactly (table layout).
# ---------------------------------------------------------------------------


def allegro_stack_ref(x0, p_embed, Y, u, layers, lmax: int, avg_num_neighbors: float, parity: bool = False):
    """Args (table layout):
      x0: (Nc, K, ns) two-body latent (already * u)
      p_embed: (Nc, K, C) tensor embedding (already * 1/sqrt(ns))
      Y: (Nc, K, D); u: (Nc, K)
      layers: sequence of {env_weight (ns,C), latent_mlp {w: [...]},
              mix {l0.. (C*P_l, C)}}
    Returns x_final (Nc, K, ns)."""
    from pair_allegro_tpu.ops.mlp import mlp_apply
    from pair_allegro_tpu.ops.prec import matmul_precision_for
    from pair_allegro_tpu.ops.tp import scalar_part, tp_mix_apply, uniform_tp

    prec = matmul_precision_for(x0.dtype)
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    x = x0
    V = p_embed[..., :, None] * Y[..., None, :]  # (Nc, K, C, D)
    cns = 1.0 / math.sqrt(x.shape[-1])
    for layer in layers:
        w_env = (
            jnp.einsum(
                "nks,sc->nkc", x, layer["env_weight"].astype(x.dtype), precision=prec
            )
            * cns
        )
        w_env = w_env * u[..., None]
        env = jnp.einsum("nkc,nkd->ncd", w_env, Y, precision=prec) * inv_avg
        env_e = jnp.broadcast_to(env[:, None], V.shape)
        T = uniform_tp(V, env_e, lmax, parity)
        inv = scalar_part(T)
        V = tp_mix_apply(layer["mix"], T)
        x_new = mlp_apply(layer["latent_mlp"], jnp.concatenate([x, inv], axis=-1))
        x = (x + x_new * u[..., None]) * (1.0 / math.sqrt(2.0))
    return x


# ---------------------------------------------------------------------------
# Kernel-side shared pieces
# ---------------------------------------------------------------------------


def _mm(a, b):
    """MXU matmul at the policy precision (see pallas_tp._kernel_precision).

    The 'high' tier (bf16x3, ~1e-6 rel — XLA supports it natively but Mosaic
    raises NotImplementedError on Precision.HIGH) is implemented MANUALLY:
    both operands split hi/lo bf16, three DEFAULT passes with f32
    accumulation — half the MXU passes of HIGHEST."""
    from pair_allegro_tpu.ops.pallas_tp import _kernel_precision

    prec = _kernel_precision(a.dtype)
    if prec == jax.lax.Precision.HIGH:
        def split(x):
            hi = x.astype(jnp.bfloat16)
            return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        a_hi, a_lo = split(a)
        b_hi, b_lo = split(b)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

        return (d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)).astype(a.dtype)
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=prec
    ).astype(a.dtype)


def _env_mm_mode():
    """Precision of the in-kernel env averaging matmuls (A @ B, denv @ B).

    B = S S^T has only 0/1 entries — EXACTLY representable in bf16 — so
    splitting A into bf16 terms gives near-f32 products at n bf16 passes
    instead of HIGHEST's 6:  "split2" (default, ~1.5e-5 rel), "split3"
    (~f32-exact: 24 mantissa bits across three terms), "highest" (the r2
    formulation).  Measured end-to-end force error vs the f64 oracle
    (500-atom flagship, kernel_high tier): split2 1.51e-5, split3 1.54e-5,
    all-highest 1.48e-5 eV/Å — the env split contributes NOTHING visible
    to the error floor, so the cheaper 2-term form is the default
    (~1 ms/step at the 5,324-atom bench).  Override with PAT_ENV_MM."""
    import os

    return os.environ.get("PAT_ENV_MM", "split2")


def _mm_env(a, b):
    """a @ b for the K-group averaging: b's entries are 0/1 (bf16-exact)."""
    mode = _env_mm_mode()
    if mode == "highest" or a.dtype == jnp.bfloat16:
        return _mm(a, b)
    n_terms = 2 if mode == "split2" else 3
    b16 = b.astype(jnp.bfloat16)
    acc = None
    r = a
    for _ in range(n_terms):
        hi = r.astype(jnp.bfloat16)
        r = r - hi.astype(jnp.float32)
        t = jnp.dot(
            hi, b16, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = t if acc is None else acc + t
    return acc


def _env_avg_mode() -> str:
    """Form of the in-kernel K-group averaging (PAT_ENV_AVG):

    * 'b' (default): ONE (rows, BE) @ (BE, BE) matmul against B = S Sᵀ — the
      round-3 production form ("one well-shaped MXU matmul").
    * 's': TWO chained matmuls against S itself, padded to 128 lanes —
      (rows, BE) @ (BE, 128) then @ (128, BE).  Half the MXU tile-ops of the
      B form whenever BE > 256 (and equal at BE = 256); the round-2 concern
      (a BM≈4-wide intermediate being pure MXU latency) applied to the
      per-d-loop formulation, not the row-batched one — re-measured round 4
      via benchmarks/env_avg.py.
    Both are exact-math equivalent (S entries are 0/1, bf16-exact)."""
    import os

    return os.environ.get("PAT_ENV_AVG", "b")


def _b_matrix(be: int, K: int, dtype):
    """The averaging operand handed to the kernels: B = S Sᵀ (BE, BE) in 'b'
    mode, or S zero-padded to 128 columns in 's' mode (extra columns are
    all-zero ⇒ contribute nothing).  Kernels dispatch on squareness."""
    S = _s_matrix(be, be // K, K)
    if _env_avg_mode() == "s":
        bm = S.shape[1]
        pad = (-bm) % 128
        if bm + pad < be:  # otherwise the chain costs >= the B form
            return jnp.asarray(np.pad(S, ((0, 0), (0, pad))), dtype)
    return jnp.asarray(S @ S.T, dtype)


def _env_avg(A, B):
    """K-group sum-broadcast of A's lanes via the operand from _b_matrix."""
    if B.shape[0] == B.shape[1]:
        return _mm_env(A, B)
    return _mm_env(_mm_env(A, B), B.T)


def _env_row(env, j, c):
    """Row-block j of an environment held as (D, C, BE) or flat (D*C, BE).
    In-kernel (D*C, BE) -> (D, C, BE) reshapes miscompile on Mosaic
    (verified against interpret mode), so flat env is sliced directly."""
    return env[j] if env.ndim == 3 else env[j * c : (j + 1) * c]


def _kmm_batch() -> str:
    """Lane-concat gate: batch the k3 SH rows of each l3 so the per-l3 mix
    runs as ONE (Cout, C*P) @ (C*P, k3*BE) matmul instead of k3 small-N
    calls — fewer MXU invocations at M=Cout=32.  Measured at the bench
    shapes (kernel_high tier): pure-forward wins (7.69 -> 7.24
    ms/layer-call) but the production fwd+VJP path does NOT (11.78 -> 11.86
    fwd-only, -> 12.50 both — concat/slice traffic outweighs the saved
    invocations in the bwd body), so the default is OFF; MD steps always
    run fwd+VJP.  Values: '0' (default), 'fwd' (forward kernel only —
    the choice for energy-only evaluation loops), '1' (both)."""
    import os

    return os.environ.get("PAT_KMM_BATCH", "0")


def _bwd_ablate() -> frozenset:
    """TIMING-ONLY ablations of the one-layer bwd kernel (PAT_BWD_ABLATE,
    comma-separated) — each drops one piece of the body, replacing its value
    with a shape-compatible proxy, so `benchmarks/bwd_ablate.py` can measure
    the piece's true marginal cost under Mosaic's scheduling (analytic FLOP
    counts have repeatedly mispredicted which pieces dominate — see the
    all-MXU and kmm notes).  Output is WRONG MATH under any ablation; never
    set outside the harness.  Pieces: envmm wzmm latfwd tpinv (the forward
    recompute) / latbwd mixbwd tpbwd envbwd tail (the reverse)."""
    import os

    v = os.environ.get("PAT_BWD_ABLATE", "")
    return frozenset(p for p in v.split(",") if p)


def _mix_layout() -> str:
    """Row layout of the mix weights INSIDE the kernels (PAT_MIX_LAYOUT):
    'pmajor' (default, row = p*C + c) or 'cmajor' (row = c*P + p, the
    tp_mix_init contract) — with p-major rows the forward's per-k3 TP tile
    is a contiguous concat of (C, BE) path tiles instead of a stack(axis=1)
    + interleaving reshape, and the backward's per-path slice is a
    contiguous sublane range instead of a stride-P gather.  Measured at the
    bench shapes (kernel_high tier): fwd 7.73 -> 5.51, fwd+VJP 11.58 ->
    6.98 ms/layer-call — bit-identical outputs; the sublane interleaves
    were the dominant non-FLOP cost of both kernels.  The weights are
    permuted OUTSIDE the pallas_call (tp_mix_env_fused_t) — a one-off
    transform of (C*P, Cout) constants; the `inv` output and its cotangent
    stay c-major (the scalar_part contract with the XLA-level latent
    MLP)."""
    import os

    return os.environ.get("PAT_MIX_LAYOUT", "pmajor")


def _to_pmajor(w, c):
    """(c*P, Cout) c-major rows -> (P*c, Cout) p-major rows."""
    cp, cout = w.shape
    return w.reshape(c, cp // c, cout).swapaxes(0, 1).reshape(cp, cout)


def _tp_mix_block(V, env, mix_ws, lmax, parity=False, pmajor=False,
                  inv_pmajor=False):
    """TP + per-l3 mix on kernel-layout block values.

    V: (D, C, BE); env: (D, C, BE) or flat (D*C, BE).
    Returns (V_new (D, Cout, BE), inv (C*P0, BE)).  With pmajor=True,
    mix_ws rows must already be p-major (_to_pmajor).  inv_pmajor=True
    (requires pmajor) returns inv in p-major (P0*c) rows WITHOUT the
    c-major interleave — in-kernel consumers (the one-layer fused kernel)
    must permute their downstream weight rows to match; Mosaic MISCOMPILES
    the stack(axis=1)+reshape interleave when its result is consumed inside
    the same kernel body (measured 0.07 abs fwd error on v5e; storing the
    interleave to a ref output is fine — the per-layer env-fused kernel
    path), so the interleave must not be used in-body.

    V may also be a LIST of D (C, BE) rows — used by the first-layer fused
    kernel which builds V0[d] = pT * Y[d] lazily in-body."""
    if isinstance(V, (list, tuple)):
        d_dim, (c, be) = len(V), V[0].shape
        dtype = V[0].dtype
    else:
        d_dim, c, be = V.shape
        dtype = V.dtype
    nz = _nonzeros(lmax, parity)
    zero = jnp.zeros((c, be), dtype)
    out_rows = []
    inv = None
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = mix_ws[l3].astype(dtype)  # (C*P, Cout)
        norm = 1.0 / math.sqrt(P * c)
        acc = [[None] * P for _ in range(k3)]
        for (p, i, j, k, wv) in nz[l3]:
            term = wv * V[i] * _env_row(env, j, c)
            acc[k][p] = term if acc[k][p] is None else acc[k][p] + term
        t_ks = []
        for k in range(k3):
            tiles = [a if a is not None else zero for a in acc[k]]
            if pmajor:
                t_k = jnp.concatenate(tiles, axis=0)  # (P*c, be), contiguous
            else:
                t_k = jnp.stack(tiles, axis=1).reshape(c * P, be)
            if l3 == 0 and k == 0:
                # inv keeps the c-major scalar_part contract unless the
                # caller asked for p-major (see docstring)
                inv = (t_k if (inv_pmajor or not pmajor)
                       else jnp.stack(tiles, axis=1).reshape(c * P, be))
            t_ks.append(t_k)
        if k3 > 1 and _kmm_batch() in ("1", "fwd"):
            o = _mm(w.T, jnp.concatenate(t_ks, axis=1)) * norm  # (Cout, k3*BE)
            out_rows.extend(o[:, k * be : (k + 1) * be] for k in range(k3))
        else:
            out_rows.extend(_mm(w.T, t_k) * norm for t_k in t_ks)
    return jnp.stack(out_rows, axis=0), inv  # (D, Cout, BE)


def _tp_inv_block(V, env, lmax, parity=False):
    """ONLY the invariant TP tile (l3=0, k=0 — the scalar part), p-major
    (P0*C, BE) rows.  The last-layer fused kernel needs no V output, hence
    no mix matmuls and no l3>0 TP tiles; the backward kernels of all fused
    layers recompute only this tile (the mix outputs of the forward are not
    residuals of anything).  V as in _tp_mix_block (array or list of rows)."""
    if isinstance(V, (list, tuple)):
        c, be = V[0].shape
        dtype = V[0].dtype
    else:
        c, be = V.shape[1:]
        dtype = V.dtype
    nz = _nonzeros(lmax, parity)
    p0 = len(paths_to_l(lmax, lmax, 0, parity))
    zero = jnp.zeros((c, be), dtype)
    acc = [None] * p0
    for (p, i, j, k, wv) in nz[0]:  # k == 0 always at l3 = 0
        term = wv * V[i] * _env_row(env, j, c)
        acc[p] = term if acc[p] is None else acc[p] + term
    return jnp.concatenate([a if a is not None else zero for a in acc], axis=0)


def _tp_mix_block_bwd(V, env, mix_ws, lmax, dVout, dinv, parity=False,
                      pmajor=False):
    """Backward of _tp_mix_block w.r.t. V and env (weights are constants).

    Accumulates into per-SH-row SSA lists (stacked once at the end) —
    .at[].add accumulators inside the unrolled body overflow the scoped-VMEM
    stack (same lesson as ops/pallas_tp._bwd_kernel).  `denv` is returned in
    the same layout env was given in (3-D stacked, or flat 2-D concat)."""
    d_dim, c, be = V.shape
    nz = _nonzeros(lmax, parity)
    dV_rows = [None] * d_dim
    denv_rows = [None] * d_dim
    zero = jnp.zeros((c, be), V.dtype)

    def acc(rows, idx, term):
        rows[idx] = term if rows[idx] is None else rows[idx] + term

    if pmajor and dinv is not None:
        p0 = dinv.shape[0] // c
        dinv = dinv.reshape(c, p0, be).swapaxes(0, 1).reshape(p0 * c, be)
    row = 0
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = mix_ws[l3].astype(V.dtype)
        norm = 1.0 / math.sqrt(P * c)
        for k in range(k3):
            g_flat = _mm(w, dVout[row]) * norm  # (C*P, BE)
            if l3 == 0 and k == 0 and dinv is not None:
                g_flat = g_flat + dinv
            dT = None if pmajor else g_flat.reshape(c, P, be)
            for (p, i, j, kk, wv) in nz[l3]:
                if kk != k:
                    continue
                g = wv * (g_flat[p * c : (p + 1) * c] if pmajor
                          else dT[:, p, :])
                acc(dV_rows, i, g * _env_row(env, j, c))
                acc(denv_rows, j, g * V[i])
            row += 1
    dV = jnp.stack([r if r is not None else zero for r in dV_rows], axis=0)
    denv_parts = [r if r is not None else zero for r in denv_rows]
    denv = (
        jnp.stack(denv_parts, axis=0)
        if env.ndim == 3
        else jnp.concatenate(denv_parts, axis=0)
    )
    return dV, denv


def _silu(z):
    return jax.nn.silu(z)


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _mm_exact(a, b):
    """Exact-f32 in-kernel matmul (Precision.HIGHEST, the 6-pass form Mosaic
    DOES support) — for the fused readout heads, whose XLA twins run
    exact-f32: keeps the readout fusion bit-compatible with the unfused
    epilogue.  Head MACs are small next to the layer body (~2k vs ~70k/lane),
    so the extra passes are noise."""
    if a.dtype == jnp.bfloat16:
        return _mm(a, b)
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mm_embed(a, b):
    """Precision of the in-kernel two-body/tensor-embed dots (PAT_EMBED_PREC):
    'policy' (default) = the kernel tier's _mm (bf16x3 under kernel_high —
    half the MXU passes of HIGHEST; the embed recompute at HIGHEST measured
    +1.6 ms/step on the first-layer backward), 'highest' = exact-f32,
    bit-compatible with the XLA prologue.  Accuracy at policy is gated by
    benchmarks/accuracy.py vs the f64 oracle (see BASELINE.md r5 notes)."""
    import os

    if os.environ.get("PAT_EMBED_PREC", "policy") == "highest":
        return _mm_exact(a, b)
    return _mm(a, b)


def _latent_fwd(cat, lat_ws, mm=None):
    """Normalized silu MLP on (rows, BE) kernel-layout values; returns
    (x_new, zs, hs) with pre-activations for the backward.

    Width-1 layers (the readout/charge heads' final (in, 1) linear) run on
    the VPU as a weighted row-sum — an M=1 MXU dot is a latency-bound
    pipeline drain per block (measured +3.5 ms/step on the readout-fused
    last backward before this special case)."""
    mm = mm or _mm
    h = cat
    zs, hs = [], [cat]
    n = len(lat_ws)
    for i, w in enumerate(lat_ws):
        wt = w.astype(h.dtype)
        if w.shape[1] == 1:
            z = jnp.sum(wt * h, axis=0, keepdims=True) * (
                1.0 / math.sqrt(w.shape[0])
            )
        else:
            z = mm(wt.T, h) * (1.0 / math.sqrt(w.shape[0]))
        zs.append(z)
        h = _silu(z) * _SILU_C if i < n - 1 else z
        hs.append(h)
    return h, zs, hs


def _latent_bwd(lat_ws, zs, hs, dxn, mm=None):
    """Backward of _latent_fwd; returns dcat.  Width-1 layers transpose as a
    VPU broadcast-multiply (outer product), not an MXU dot — see
    _latent_fwd."""
    mm = mm or _mm
    n = len(lat_ws)
    g = dxn
    for i in range(n - 1, -1, -1):
        w = lat_ws[i]
        if i < n - 1:
            g = g * _dsilu(zs[i]) * _SILU_C
        wt = w.astype(g.dtype)
        if w.shape[1] == 1:
            g = (wt * g) * (1.0 / math.sqrt(w.shape[0]))  # (in,1)*(1,BE)
        else:
            g = mm(wt, g) * (1.0 / math.sqrt(w.shape[0]))
    return g


def _env_fwd(w_env, Y, S, inv_avg):
    """Per-center env sum + broadcast back, block-local.

    w_env: (C, BE); Y: (D, BE); S: (BE, BM) K-group indicator.
    Returns env FLAT (D*C, BE) (in-kernel 3-D reshapes miscompile — see
    _env_row).  All d-rows batched into TWO matmuls — a per-d loop is 2*D
    tiny MXU calls per layer per block, measured latency-dominated."""
    d_dim, be = Y.shape
    A = jnp.concatenate([w_env * Y[d] for d in range(d_dim)], axis=0)  # (D*C, BE)
    env_c = _mm(A, S) * inv_avg  # (D*C, BM)
    return _mm(env_c, S.T)  # flat (D*C, BE)


def _env_bwd(w_env, Y, S, inv_avg, denv):
    """Backward of _env_fwd (denv flat (D*C, BE)): returns
    (dw_env, dY_partial (D, BE) summed over C)."""
    d_dim = Y.shape[0]
    c = w_env.shape[0]
    dc = _mm(denv, S)  # (D*C, BM)
    dA = _mm(dc, S.T) * inv_avg  # flat (D*C, BE)
    dw = None
    dY_rows = []
    for d in range(d_dim):
        dA_d = dA[d * c : (d + 1) * c]
        t = dA_d * Y[d]
        dw = t if dw is None else dw + t
        dY_rows.append(jnp.sum(dA_d * w_env, axis=0, keepdims=True))  # (1, BE)
    return dw, jnp.concatenate(dY_rows, axis=0)  # (D, BE)


def _unpack_ws(rest, n_layers, n_lat, lmax):
    """Split the flat weight-ref tuple back into per-layer groups."""
    per = 1 + n_lat + (lmax + 1)
    layers = []
    for li in range(n_layers):
        grp = rest[li * per : (li + 1) * per]
        layers.append(
            (grp[0], tuple(grp[1 : 1 + n_lat]), tuple(grp[1 + n_lat :]))
        )
    return layers, rest[n_layers * per :]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _stack_fwd_kernel(lmax, parity, n_layers, n_lat, inv_avg, *refs):
    x0_ref, p_ref, y_ref, u_ref, s_ref = refs[:5]
    w_layers, rest = _unpack_ws(refs[5:], n_layers, n_lat, lmax)
    (x_out_ref,) = rest

    x = x0_ref[:]  # (ns, BE)
    p = p_ref[:]  # (C, BE)
    Y = y_ref[:]  # (D, BE)
    u = u_ref[:]  # (1, BE)
    S = s_ref[:].astype(x.dtype)  # (BE, BM)
    ns = x.shape[0]
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)

    pmajor = _mix_layout() == "pmajor"
    V = p[None, :, :] * Y[:, None, :]  # (D, C, BE)
    for (env_w_ref, lat_refs, mix_refs) in w_layers:
        env_w = env_w_ref[:].astype(x.dtype)
        w_env = _mm(env_w.T, x) * cns * u  # (C, BE)
        env = _env_fwd(w_env, Y, S, inv_avg)
        V_new, inv = _tp_mix_block(V, env, [m[:] for m in mix_refs], lmax, parity,
                                   pmajor=pmajor)
        cat = jnp.concatenate([x, inv], axis=0)
        x_new, _, _ = _latent_fwd(cat, [w[:] for w in lat_refs])
        x = (x + x_new * u) * r2
        V = V_new
    x_out_ref[:] = x


# ---------------------------------------------------------------------------
# Backward kernel: recompute forward per block, then reverse.
# ---------------------------------------------------------------------------


def _stack_bwd_kernel(lmax, parity, n_layers, n_lat, inv_avg, *refs):
    # ref order: edge operands (x0, p, Y, u, dxout), then (S, *weights),
    # then outputs (dx0, dp, dY, du) — must match _stack_call's args
    x0_ref, p_ref, y_ref, u_ref, dxout_ref, s_ref = refs[:6]
    w_layers, rest = _unpack_ws(refs[6:], n_layers, n_lat, lmax)
    dx0_ref, dp_ref, dy_ref, du_ref = rest

    x = x0_ref[:]
    p = p_ref[:]
    Y = y_ref[:]
    u = u_ref[:]
    S = s_ref[:].astype(x.dtype)
    ns = x.shape[0]
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)

    # --- forward pass, stashing per-layer inputs ---------------------------
    pmajor = _mix_layout() == "pmajor"
    V = p[None, :, :] * Y[:, None, :]
    saved = []  # per layer: (x_in, V_in, wz)
    for (env_w_ref, lat_refs, mix_refs) in w_layers:
        env_w = env_w_ref[:].astype(x.dtype)
        wz = _mm(env_w.T, x) * cns  # pre-u
        w_env = wz * u
        env = _env_fwd(w_env, Y, S, inv_avg)
        V_new, inv = _tp_mix_block(V, env, [m[:] for m in mix_refs], lmax, parity,
                                   pmajor=pmajor)
        cat = jnp.concatenate([x, inv], axis=0)
        x_new, _, _ = _latent_fwd(cat, [w[:] for w in lat_refs])
        saved.append((x, V, wz))
        x = (x + x_new * u) * r2
        V = V_new

    # --- backward ----------------------------------------------------------
    dx = dxout_ref[:]
    dV = jnp.zeros_like(V)
    du = jnp.zeros_like(u)
    dY = jnp.zeros_like(Y)
    for li in range(n_layers - 1, -1, -1):
        env_w_ref, lat_refs, mix_refs = w_layers[li]
        env_w = env_w_ref[:].astype(x.dtype)
        lat_ws = [w[:] for w in lat_refs]
        mix_ws = [m[:] for m in mix_refs]
        x_in, V_in, wz = saved[li]
        # recompute layer intermediates (cheap relative to storing them)
        w_env = wz * u
        env = _env_fwd(w_env, Y, S, inv_avg)
        _, inv = _tp_mix_block(V_in, env, mix_ws, lmax, parity, pmajor=pmajor)
        cat = jnp.concatenate([x_in, inv], axis=0)
        x_new, zs, hs = _latent_fwd(cat, lat_ws)

        # x_out = (x_in + x_new * u) * r2
        dxn = dx * u * r2
        du = du + jnp.sum(dx * x_new, axis=0, keepdims=True) * r2
        dx_in = dx * r2
        dcat = _latent_bwd(lat_ws, zs, hs, dxn)
        dx_in = dx_in + dcat[:ns]
        dinv = dcat[ns:]
        dV_in, denv = _tp_mix_block_bwd(V_in, env, mix_ws, lmax, dV, dinv, parity,
                                        pmajor=pmajor)
        dwe, dY_part = _env_bwd(w_env, Y, S, inv_avg, denv)
        dY = dY + dY_part
        du = du + jnp.sum(dwe * wz, axis=0, keepdims=True)
        dx_in = dx_in + _mm(env_w, dwe * u) * cns
        dx, dV = dx_in, dV_in

    # V0 = p (x) Y — unrolled per SH row (Mosaic rejects 3-D multi_reductions)
    d_dim = Y.shape[0]
    dp = None
    dy_rows = []
    for d in range(d_dim):
        term = dV[d] * Y[d : d + 1]  # (C, BE)
        dp = term if dp is None else dp + term
        dy_rows.append(jnp.sum(dV[d] * p, axis=0, keepdims=True))  # (1, BE)
    dY = dY + jnp.concatenate(dy_rows, axis=0)
    dx0_ref[:] = dx
    dp_ref[:] = dp
    dy_ref[:] = dY
    du_ref[:] = du


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# ---------------------------------------------------------------------------


def _block_geometry(K: int, n_centers: int):
    """Pick edge-block lanes BE = m*K near 512, 128-aligned (Mosaic requires
    lane-dim blocks divisible by 128 unless they span the full array).
    Callers pad K to a multiple of 32 so m stays small."""
    e = n_centers * K
    g = math.gcd(K, 128)
    m0 = 128 // g  # smallest m with 128 | K*m
    m = m0 * max(1, round(512 / (K * m0)))
    if m >= n_centers or (K * m) >= e:
        return e, n_centers  # single block spanning the whole array
    return K * m, m


def _bwd_block(be: int, K: int, e: int, d_dim: int, c: int, n_layers: int):
    """Backward block: the recompute-and-reverse kernel's unrolled SSA live
    set scales ~linearly in lanes; halve (keeping 128-alignment) until the
    empirical per-lane stack estimate fits the ~16 MB scoped-VMEM budget
    (measured ~88 KB/lane at D=9, C=32, 3 layers on v5e)."""
    lane_bytes = 150_000.0 * (d_dim * c / 288.0) * (n_layers / 3.0)
    budget = 26 * 2**20
    m = be // K
    while be != e and lane_bytes * be > budget:
        if m % 2 == 0 and (m // 2) * K % 128 == 0 and (m // 2) * K >= 128:
            m //= 2
            be = m * K
        else:
            break
    return be


def _s_matrix(be: int, bm: int, K: int) -> np.ndarray:
    s = np.zeros((be, bm), np.float32)
    s[np.arange(be), np.arange(be) // K] = 1.0
    return s


def _flatten_layer_ws(layers, lmax):
    flat = []
    n_lat = None
    pmajor = _mix_layout() == "pmajor"
    for layer in layers:
        lat = tuple(layer["latent_mlp"]["w"])
        n_lat = len(lat)
        flat += [layer["env_weight"], *lat]
        c = layer["env_weight"].shape[1]
        flat += [
            _to_pmajor(layer["mix"][f"l{l3}"], c) if pmajor
            else layer["mix"][f"l{l3}"]
            for l3 in range(lmax + 1)
        ]
    return tuple(flat), n_lat


def _stack_call(kernel, lmax, parity, n_layers, n_lat, inv_avg, args, extra_in, out_shapes, be):
    """Common pallas_call driver.  args: (ns,E)/(C,E)/(D,E)/(1,E) operands;
    extra_in: (S, *weights); out_shapes: list of (rows, E) outputs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = args[0].shape[-1]
    grid = (e // be,)

    def espec(rows):
        return pl.BlockSpec((rows, be), lambda i: (0, i), memory_space=pltpu.VMEM)

    def fullspec(w):
        return pl.BlockSpec(w.shape, lambda i: tuple(0 for _ in w.shape),
                            memory_space=pltpu.VMEM)

    in_specs = [espec(a.shape[0]) for a in args] + [fullspec(w) for w in extra_in]
    out_specs = [espec(r) for (r, _) in out_shapes]
    # the fully-unrolled layer stack holds a large SSA live set; raise the
    # Mosaic scoped-VMEM limit above the 16 MB default (requesting far more
    # than the chip's physical VMEM compiles but FAULTS at runtime — 32 MB
    # measured safe on v5e)
    params = pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20)
    return pl.pallas_call(
        functools.partial(kernel, lmax, parity, n_layers, n_lat, inv_avg),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=[jax.ShapeDtypeStruct((r, e), args[0].dtype) for (r, _) in out_shapes]
        if len(out_shapes) > 1
        else jax.ShapeDtypeStruct((out_shapes[0][0], e), args[0].dtype),
        compiler_params=params,
    )(*args, *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _stack(x0t, pt, yt, ut, ws_flat, lmax, n_layers, n_lat, meta):
    """Kernel-layout fused stack: operands (rows, E);
    meta = (K, BE, inv_avg, parity)."""
    return _stack_fwd_impl(x0t, pt, yt, ut, ws_flat, lmax, n_layers, n_lat, meta)


def _stack_fwd_impl(x0t, pt, yt, ut, ws_flat, lmax, n_layers, n_lat, meta):
    K, be, inv_avg, parity = meta
    S = jnp.asarray(_s_matrix(be, be // K, K), x0t.dtype)
    return _stack_call(
        _stack_fwd_kernel, lmax, parity, n_layers, n_lat, inv_avg,
        (x0t, pt, yt, ut), (S, *ws_flat),
        [(x0t.shape[0], None)], be,
    )


def _stack_fwd(x0t, pt, yt, ut, ws_flat, lmax, n_layers, n_lat, meta):
    out = _stack_fwd_impl(x0t, pt, yt, ut, ws_flat, lmax, n_layers, n_lat, meta)
    return out, (x0t, pt, yt, ut, ws_flat)


def _stack_bwd(lmax, n_layers, n_lat, meta, res, dxout):
    x0t, pt, yt, ut, ws_flat = res
    K, be, inv_avg, parity = meta
    # backward holds far more live SSA than forward: shrink to the VMEM budget
    be_b = _bwd_block(be, K, x0t.shape[-1], yt.shape[0], pt.shape[0], n_layers)
    S = jnp.asarray(_s_matrix(be_b, be_b // K, K), x0t.dtype)
    dx0, dp, dy, du = _stack_call(
        _stack_bwd_kernel, lmax, parity, n_layers, n_lat, inv_avg,
        (x0t, pt, yt, ut, dxout), (S, *ws_flat),
        [(x0t.shape[0], None), (pt.shape[0], None), (yt.shape[0], None), (1, None)],
        be_b,
    )
    # weight cotangents are NOT computed: NaN-poison them so training-style
    # differentiation fails loudly (silent zeros were the round-1 footgun)
    dws = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), ws_flat)
    # du keeps the primal's (1, E) shape — custom_vjp cotangents must match
    return dx0, dp, dy, du, dws


_stack.defvjp(_stack_fwd, _stack_bwd)


# ---------------------------------------------------------------------------
# Per-layer kernel WITH in-kernel environment (the production path).
#
# The profile of the per-layer tp_mix_fused_t path shows ~45 ms/step of XLA
# data movement around the kernels: the (E, C, D) env broadcast + its
# transpose-reduce, the (Nc, K, C, D) env-edges materialization in make_env,
# and lane pads.  With center-aligned blocks (BE = m*K), the environment is
# block-local: this kernel takes per-EDGE env weights wz (C, E) and Y (D, E)
# and builds/aggregates/broadcasts env entirely in VMEM via the K-group
# indicator matmuls — nothing (E, C, D)-sized ever exists in HBM.
# ---------------------------------------------------------------------------


def _env_layer_fwd_kernel(lmax, parity, inv_avg, *refs):
    v_ref, wz_ref, y_ref, b_ref = refs[:4]
    n_w = lmax + 1
    w_refs = refs[4 : 4 + n_w]
    out_ref, inv_ref = refs[4 + n_w], refs[5 + n_w]
    V = v_ref[:]
    wz = wz_ref[:]
    Y = y_ref[:]
    B = b_ref[:].astype(V.dtype)  # (BE, BE) = S S^T, K-group averaging
    d_dim, c, be = V.shape
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)  # (D*C, BE)
    # ONE well-shaped MXU matmul: the (A@S)(S^T) chain has a BM-wide (~4
    # col) intermediate that is pure MXU latency
    env = _env_avg(A, B) * inv_avg  # flat (D*C, BE); see _env_row
    out, inv = _tp_mix_block(V, env, [w[:] for w in w_refs], lmax, parity,
                             pmajor=_mix_layout() == "pmajor")
    out_ref[:] = out
    inv_ref[:] = inv


def _env_layer_bwd_kernel(lmax, parity, inv_avg, *refs):
    v_ref, wz_ref, y_ref, b_ref = refs[:4]
    n_w = lmax + 1
    w_refs = refs[4 : 4 + n_w]
    (dout_ref, dinv_ref, dv_ref, dwz_ref, dy_ref, denv_ref) = refs[4 + n_w :]
    V = v_ref[:]
    wz = wz_ref[:]
    Y = y_ref[:]
    B = b_ref[:].astype(V.dtype)
    d_dim, c, be = V.shape
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg  # flat (D*C, BE)
    # HYBRID accumulation: SSA row accumulators WITHIN each l3 (register-
    # resident), flushed to the refs once per l3.  Full-SSA across the whole
    # unrolled body blows register/stack pressure (measured 2.5x slower);
    # full per-nz ref RMW pays ~200 VMEM round trips.
    nz = _nonzeros(lmax, parity)
    pmajor = _mix_layout() == "pmajor"
    dv_ref[:] = jnp.zeros((d_dim, c, be), V.dtype)
    denv_ref[:] = jnp.zeros((d_dim * c, be), V.dtype)
    row = 0
    dinv = dinv_ref[:]
    if pmajor:
        # the inv cotangent arrives c-major (scalar_part contract); the
        # g_flat it adds into is p-major under this layout
        p0 = dinv.shape[0] // c
        dinv = dinv.reshape(c, p0, be).swapaxes(0, 1).reshape(p0 * c, be)
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = w_refs[l3][:].astype(V.dtype)
        norm = 1.0 / math.sqrt(P * c)
        dv_acc = [None] * d_dim
        de_acc = [None] * d_dim
        g_all = None
        if k3 > 1 and _kmm_batch() == "1":
            cat = jnp.concatenate(
                [dout_ref[row + k] for k in range(k3)], axis=1
            )  # (Cout, k3*BE)
            g_all = _mm(w, cat) * norm  # (C*P, k3*BE)
        for k in range(k3):
            if g_all is not None:
                g_flat = g_all[:, k * be : (k + 1) * be]
            else:
                g_flat = _mm(w, dout_ref[row]) * norm  # (C*P, BE)
            if l3 == 0 and k == 0:
                g_flat = g_flat + dinv
            dT = None if pmajor else g_flat.reshape(c, P, be)
            for (p, i, j, kk, wv) in nz[l3]:
                if kk != k:
                    continue
                g = wv * (g_flat[p * c : (p + 1) * c] if pmajor
                          else dT[:, p, :])
                t = g * env[j * c : (j + 1) * c]
                dv_acc[i] = t if dv_acc[i] is None else dv_acc[i] + t
                t2 = g * V[i]
                de_acc[j] = t2 if de_acc[j] is None else de_acc[j] + t2
            row += 1
        for i in range(d_dim):
            if dv_acc[i] is not None:
                dv_ref[i] = dv_ref[i] + dv_acc[i]
            if de_acc[i] is not None:
                denv_ref[i * c : (i + 1) * c] = (
                    denv_ref[i * c : (i + 1) * c] + de_acc[i]
                )
    # env = (A B) inv_avg with B symmetric  =>  dA = (denv B) inv_avg
    dA = _env_avg(denv_ref[:], B) * inv_avg  # flat (D*C, BE)
    dwz = None
    dy_rows = []
    for d in range(d_dim):
        dA_d = dA[d * c : (d + 1) * c]
        t = dA_d * Y[d]
        dwz = t if dwz is None else dwz + t
        dy_rows.append(jnp.sum(dA_d * wz, axis=0, keepdims=True))
    dwz_ref[:] = dwz
    dy_ref[:] = jnp.concatenate(dy_rows, axis=0)


def _env_block_geometry(K: int, n_centers: int, d_dim: int = 9, c: int = 32):
    """(BE, pad_centers): prefer an m dividing n_centers with 128 | K*m (no
    lane pads at all); else fall back to padding centers.  BE is capped so
    the backward kernel's scoped-VMEM stack fits the 32 MB limit: measured
    33.05 MB at BE=640 with D*C=288 (so 512 is the cap there), and the live
    set scales ~linearly in both BE and D*C — larger num_tensor_features or
    l_max shrink the cap proportionally (128-aligned; None when even 128
    lanes would overflow, which sends callers to the non-env-fused path)."""
    cap = int(512 * 288.0 / (d_dim * c)) // 128 * 128
    if cap < 128:
        return None, 0
    cands = []
    for m in range(1, n_centers + 1):
        be = K * m
        if be > cap:
            break
        if be % 128 == 0:
            cands.append((abs(be - cap), m, n_centers % m == 0))
    if not cands:
        return None, 0
    divisors = [t for t in cands if t[2]]
    pick = min(divisors or cands)
    m = pick[1]
    return K * m, (-n_centers) % m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _env_fused(Vt, wzt, yt, ws_flat, lmax, meta):
    return _env_fused_fwd_impl(Vt, wzt, yt, ws_flat, lmax, meta)


# debugging escape hatch: run the Pallas kernels in interpreter mode (works
# on CPU; orders of magnitude slower — tests only)
_INTERPRET = False


def _env_fused_call(
    kernel, lmax, parity, inv_avg, edge_ops, B, ws_flat, out_shapes, be,
    scratch=None, kernel_extra=(),
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = edge_ops[0].shape[-1]
    grid = (e // be,)

    def espec(rows):
        return pl.BlockSpec((rows, be), lambda i: (0, i), memory_space=pltpu.VMEM)

    def espec3(r1, r2):
        return pl.BlockSpec((r1, r2, be), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def spec_of(a):
        return espec3(a.shape[0], a.shape[1]) if a.ndim == 3 else espec(a.shape[0])

    def fullspec(w):
        return pl.BlockSpec(w.shape, lambda i: tuple(0 for _ in w.shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(kernel, lmax, parity, inv_avg, *kernel_extra),
        grid=grid,
        in_specs=[spec_of(a) for a in edge_ops[:3]]
        + [fullspec(B)]
        + [fullspec(w) for w in ws_flat]
        + [spec_of(a) for a in edge_ops[3:]],
        out_specs=[
            espec3(s[0], s[1]) if len(s) == 3 else espec(s[0]) for s in out_shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((*s[:-1], e), edge_ops[0].dtype) for s in out_shapes
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20),
        interpret=_INTERPRET,
        scratch_shapes=[pltpu.VMEM(s, edge_ops[0].dtype) for s in (scratch or [])],
    )(*edge_ops[:3], B, *ws_flat, *edge_ops[3:])


def _env_fused_fwd_impl(Vt, wzt, yt, ws_flat, lmax, meta):
    K, be, be_bwd, inv_avg, parity = meta
    c_out = ws_flat[0].shape[1]
    p0 = len(paths_to_l(lmax, lmax, 0, parity))
    d_dim, c, e = Vt.shape
    B = _b_matrix(be, K, Vt.dtype)
    out, inv = _env_fused_call(
        _env_layer_fwd_kernel, lmax, parity, inv_avg, (Vt, wzt, yt), B, ws_flat,
        [(d_dim, c_out, None), (c * p0, None)], be,
    )
    return out, inv


def _env_fused_fwd(Vt, wzt, yt, ws_flat, lmax, meta):
    return _env_fused_fwd_impl(Vt, wzt, yt, ws_flat, lmax, meta), (Vt, wzt, yt, ws_flat)


def _env_fused_bwd(lmax, meta, res, cots):
    Vt, wzt, yt, ws_flat = res
    dout, dinv = cots
    K, be, be_bwd, inv_avg, parity = meta
    d_dim, c, e = Vt.shape
    B = _b_matrix(be_bwd, K, Vt.dtype)
    dV, dwz, dY = _env_fused_call(
        _env_layer_bwd_kernel, lmax, parity, inv_avg, (Vt, wzt, yt, dout, dinv), B,
        ws_flat, [(d_dim, c, None), (c, None), (d_dim, None)], be_bwd,
        scratch=[(d_dim * c, be_bwd)],
    )
    dws = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), ws_flat)
    return dV, dwz, dY, dws


_env_fused.defvjp(_env_fused_fwd, _env_fused_bwd)


def tp_mix_env_fused_t(Vt, wzt, yt, ws_flat, lmax: int, K: int, avg_num_neighbors,
                       parity: bool = False, inv_t: bool = False,
                       mode: str = "paths"):
    """Per-layer fused env+TP+mix on kernel layout.

    Vt (D, C, E); wzt (C, E) per-edge env weights (already * u); yt (D, E);
    E = Nc*K with K | E block-aligned.  Returns (Vt' (D, C_out, E),
    inv (E, C*P0)).  Requires a viable center-aligned 128-multiple block —
    caller checks `env_fused_viable(K, Nc, D, C)` first.  Weight cotangents
    are NaN-poisoned (forces only).

    mode: "paths" (unrolled 3j VPU FMAs + per-l3 mix matmuls — production)
    or "mxu_highest" / "mxu_bf16x3" / "mxu_bf16" (the combined one-matmul
    TP+mix form — see the MXU-variant section above for the measurement)."""
    nc = Vt.shape[-1] // K
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    if mode != "paths":
        # O (dd*C, BE) [+ bf16 splits] dominates scoped VMEM: halve the
        # lane cap relative to the paths kernel
        be, pad_c = _env_block_geometry(K, nc, Vt.shape[0] * 2, Vt.shape[1])
    else:
        be, pad_c = _env_block_geometry(K, nc, Vt.shape[0], Vt.shape[1])
    import os

    # the BACKWARD block is scoped-VMEM capped (hybrid-accumulation live
    # set); the forward's live set is far smaller, so its block may be
    # raised independently (fewer grid steps = less per-block overhead).
    # be_bwd must tile the padding chosen for the forward: use the largest
    # viable block whose m divides the forward's m.
    be_bwd = be
    be_env = int(os.environ.get("PAT_ENV_BE", "0"))
    if be_env:  # experiment override: forced fwd block lanes (m*K, 128|be)
        m = be_env // K
        assert m * K == be_env and be_env % 128 == 0, be_env
        be, pad_c = be_env, (-nc) % m
        m_b = be_bwd // K
        while m % m_b or (m_b * K) % 128:
            m_b -= 1
            if m_b == 0:
                m_b = m
                break
        be_bwd = m_b * K
    if pad_c:
        pe = pad_c * K
        Vt = jnp.pad(Vt, ((0, 0), (0, 0), (0, pe)))
        wzt = jnp.pad(wzt, ((0, 0), (0, pe)))
        yt = jnp.pad(yt, ((0, 0), (0, pe)))
    if mode != "paths":
        m_arrays, _ = _mxu_mats(ws_flat, lmax, parity, mode, Vt.shape[1])
        out, inv = _env_fused_mxu(
            Vt, wzt, yt, m_arrays, lmax, (K, be, float(inv_avg), parity, mode)
        )
    else:
        if _mix_layout() == "pmajor":
            ws_flat = tuple(_to_pmajor(w, Vt.shape[1]) for w in ws_flat)
        out, inv = _env_fused(
            Vt, wzt, yt, ws_flat, lmax, (K, be, be_bwd, float(inv_avg), parity)
        )
    e0 = nc * K
    inv = inv[:, :e0]
    # inv_t=True keeps the kernel layout (C*P0, E) for feature-major callers
    return out[..., :e0], (inv if inv_t else jnp.transpose(inv, (1, 0)))


def env_fused_viable(K: int, n_centers: int, d_dim: int = 9, c: int = 32) -> bool:
    be, _ = _env_block_geometry(K, n_centers, d_dim, c)
    return be is not None


# ---------------------------------------------------------------------------
# ONE-LAYER fully-fused kernel: env + TP + mix + latent MLP + residual in a
# single pallas_call per layer.  Sits between the per-layer env-fused kernel
# (latent at the XLA level — per-layer passes over (features, E) tensors for
# wz/inv/latent/residual are ~2-4 ms/layer of HBM-bound glue) and the parked
# full-stack kernel (all layers in one body — lost 2.5x to Mosaic scheduling
# of the huge unrolled program).  One layer + MLP keeps the body moderate
# while the only per-layer HBM traffic left is x (ns, E) and V (D, C, E).
# ---------------------------------------------------------------------------


def _layer1_fwd_kernel(lmax, parity, inv_avg, n_lat, n_mix, first_v, last,
                       *refs):
    # ref order per _env_fused_call: edge_ops[:3], B, weights, edge_ops[3:]
    x_ref, v_ref, y_ref, b_ref = refs[:4]
    env_w_ref = refs[4]
    lat_refs = refs[5 : 5 + n_lat]
    mix_refs = refs[5 + n_lat : 5 + n_lat + n_mix]
    rest = refs[5 + n_lat + n_mix :]
    u_ref, x_out_ref = rest[0], rest[1]
    x = x_ref[:]          # (ns, BE)
    Y = y_ref[:]          # (D, BE)
    u = u_ref[:]          # (1, BE)
    B = b_ref[:].astype(x.dtype)
    ns = x.shape[0]
    d_dim = Y.shape[0]
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)
    if first_v:
        # first layer: V0[d] = pT * Y[d] built lazily in-body — the (D, C, E)
        # V0 never exists in HBM (saves its materialization + transpose
        # fusions and 4x the kernel input bandwidth)
        pT = v_ref[:]     # (C, BE)
        V = [pT * Y[d] for d in range(d_dim)]
    else:
        V = v_ref[:]      # (D, C, BE)
    env_w = env_w_ref[:].astype(x.dtype)
    wz = _mm(env_w.T, x) * cns * u  # (C, BE)
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg  # flat (D*C, BE)
    # ALWAYS p-major here (weights pre-permuted by allegro_layer_fused_t,
    # including the inv rows of the first latent weight): inv is consumed
    # in-body, and the c-major interleave is miscompiled in that position
    if last:
        # last layer: V output is never consumed (only the scalar track
        # feeds the readout) — skip the mix matmuls and the l3>0 TP tiles
        inv = _tp_inv_block(V, env, lmax, parity)
    else:
        V_new, inv = _tp_mix_block(V, env, [m[:] for m in mix_refs], lmax,
                                   parity, pmajor=True, inv_pmajor=True)
        rest[2][:] = V_new  # v_out_ref
    cat = jnp.concatenate([x, inv], axis=0)
    x_new, _, _ = _latent_fwd(cat, [w[:] for w in lat_refs])
    x_out_ref[:] = (x + x_new * u) * r2


def _layer1_bwd_kernel(lmax, parity, inv_avg, n_lat, n_mix, first_v, last,
                       *refs):
    x_ref, v_ref, y_ref, b_ref = refs[:4]
    env_w_ref = refs[4]
    lat_refs = refs[5 : 5 + n_lat]
    mix_refs = refs[5 + n_lat : 5 + n_lat + n_mix]
    rest = refs[5 + n_lat + n_mix :]
    if last:  # no dvout operand — the V output does not exist
        u_ref, dxout_ref, dx_ref, dv_ref, dy_ref, du_ref = rest
        dvout_ref = None
    else:
        (u_ref, dxout_ref, dvout_ref,
         dx_ref, dv_ref, dy_ref, du_ref) = rest
    x = x_ref[:]
    Y = y_ref[:]
    u = u_ref[:]
    B = b_ref[:].astype(x.dtype)
    ns = x.shape[0]
    d_dim = Y.shape[0]
    if first_v:
        pT = v_ref[:]                     # (C, BE)
        V = [pT * Y[d] for d in range(d_dim)]
        c, be = pT.shape
    else:
        V = v_ref[:]                      # (D, C, BE)
        _, c, be = V.shape
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)
    env_w = env_w_ref[:].astype(x.dtype)
    lat_ws = [w[:] for w in lat_refs]
    ablate = _bwd_ablate()  # TIMING-ONLY harness switch; empty in production
    # --- recompute forward (only what the reverse needs: the mix matmuls
    # of the forward are not residuals of anything — _tp_inv_block) ---
    if "wzmm" in ablate:
        wz0 = x[: env_w.shape[1]]
    else:
        wz0 = _mm(env_w.T, x) * cns  # pre-envelope
    wz = wz0 * u
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = A * inv_avg if "envmm" in ablate else _env_avg(A, B) * inv_avg
    c_dim = env_w.shape[1]
    if "tpinv" in ablate:
        p0 = len(paths_to_l(lmax, lmax, 0, parity))
        inv = jnp.concatenate([env[: c_dim]] * p0, axis=0)
    else:
        inv = _tp_inv_block(V, env, lmax, parity)
    cat = jnp.concatenate([x, inv], axis=0)
    if "latfwd" in ablate:
        x_new = cat[:ns]
        zs = [cat[: w.shape[1]] for w in lat_ws]
        hs = [cat] + [cat[: w.shape[1]] for w in lat_ws]
    else:
        x_new, zs, hs = _latent_fwd(cat, lat_ws)
    # --- reverse ---
    dxout = dxout_ref[:]
    dxn = dxout * u * r2
    du = jnp.sum(dxout * x_new, axis=0, keepdims=True) * r2
    dx = dxout * r2
    if "latbwd" in ablate:
        dcat = cat
    else:
        dcat = _latent_bwd(lat_ws, zs, hs, dxn)
    dx = dx + dcat[:ns]
    dinv = dcat[ns:]
    # TP/mix backward with HYBRID per-l3 accumulation (the measured-fastest
    # form, see _env_layer_bwd_kernel).  When `last`, the V-output cotangent
    # is identically zero, so the only upstream gradient is dinv at
    # (l3=0, k=0) — the whole mix backward and every l3>0 block vanish.
    nz = _nonzeros(lmax, parity)
    # dinv = dcat[ns:] is the cotangent of the p-major inv — no permute
    dv_acc_all = [None] * d_dim
    de_acc_all = [None] * d_dim
    row = 0
    for l3 in range(lmax + 1):
        if last and l3 > 0:
            break
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = None if last else mix_refs[l3][:].astype(x.dtype)
        norm = 1.0 / math.sqrt(P * c)
        dv_acc = [None] * d_dim
        de_acc = [None] * d_dim
        for k in range(k3):
            if last:
                if k > 0:
                    break
                g_flat = dinv
            elif "mixbwd" in ablate:
                g_flat = jnp.concatenate([V[d % d_dim] for d in range(P)], 0)
                if l3 == 0 and k == 0:
                    g_flat = g_flat + dinv
            else:
                g_flat = _mm(w, dvout_ref[row]) * norm
                if l3 == 0 and k == 0:
                    g_flat = g_flat + dinv
            if "tpbwd" in ablate:
                for d in range(d_dim):
                    t = g_flat[:c]
                    dv_acc[d] = t if dv_acc[d] is None else dv_acc[d] + t
                    de_acc[d] = t if de_acc[d] is None else de_acc[d] + t
                row += 1
                continue
            for (p, i, j, kk, wv) in nz[l3]:
                if kk != k:
                    continue
                g = wv * g_flat[p * c : (p + 1) * c]
                t = g * env[j * c : (j + 1) * c]
                dv_acc[i] = t if dv_acc[i] is None else dv_acc[i] + t
                t2 = g * V[i]
                de_acc[j] = t2 if de_acc[j] is None else de_acc[j] + t2
            row += 1
        for i in range(d_dim):
            if dv_acc[i] is not None:
                dv_acc_all[i] = (
                    dv_acc[i] if dv_acc_all[i] is None
                    else dv_acc_all[i] + dv_acc[i]
                )
            if de_acc[i] is not None:
                de_acc_all[i] = (
                    de_acc[i] if de_acc_all[i] is None
                    else de_acc_all[i] + de_acc[i]
                )
    zero = jnp.zeros((c, be), x.dtype)
    denv = jnp.concatenate(
        [r_ if r_ is not None else zero for r_ in de_acc_all], axis=0
    )
    dA = denv if "envbwd" in ablate else _env_avg(denv, B) * inv_avg
    if "tail" in ablate:
        dy_rows = [dA[:1]] * d_dim
        dwz = dA[:c]
    else:
        dwz = None
        dy_rows = []
        for d in range(d_dim):
            dA_d = dA[d * c : (d + 1) * c]
            t = dA_d * Y[d]
            dwz = t if dwz is None else dwz + t
            dy_d = jnp.sum(dA_d * wz, axis=0, keepdims=True)
            if first_v and dv_acc_all[d] is not None:
                # V0[d] = pT * Y[d]:  dY[d] += sum_c dV0[d] * pT
                dy_d = dy_d + jnp.sum(dv_acc_all[d] * pT, axis=0, keepdims=True)
            dy_rows.append(dy_d)
    if first_v:
        # dpT = sum_d dV0[d] * Y[d]
        dp = None
        for d in range(d_dim):
            if dv_acc_all[d] is None:
                continue
            t = dv_acc_all[d] * Y[d]
            dp = t if dp is None else dp + t
        dv_ref[:] = dp if dp is not None else jnp.zeros((c, be), x.dtype)
    else:
        dv_ref[:] = jnp.stack(
            [r_ if r_ is not None else zero for r_ in dv_acc_all], axis=0
        )
    dy_ref[:] = jnp.concatenate(dy_rows, axis=0)
    # wz = wz0 * u:  dx += Wenv @ (dwz * u) * cns;  du += sum(dwz * wz0)
    dx = dx + _mm(env_w, dwz * u) * cns
    du = du + jnp.sum(dwz * wz0, axis=0, keepdims=True)
    dx_ref[:] = dx
    du_ref[:] = du


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _layer1(xt, Vt, yt, ut, ws, lmax, n_lat, meta):
    """ws = (env_w, *lat_ws, *mix_ws);
    meta = (K, be, be_bwd, inv_avg, parity, first_v).  Vt is the (C, E)
    tensor embedding pT when first_v (V0 built in-body), else (D, C, E)."""
    return _layer1_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, meta, last=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _layer1_last(xt, Vt, yt, ut, ws, lmax, n_lat, meta):
    """Last-layer variant: ws carries NO mix weights and only xt' is
    returned — the V output is never consumed downstream, so the kernel
    skips the mix matmuls / l3>0 TP tiles (fwd) and the whole mix backward
    (bwd, where the V cotangent would be identically zero)."""
    return _layer1_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, meta, last=True)


def _layer1_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, meta, last):
    K, be, be_bwd, inv_avg, parity, first_v = meta
    d_dim = yt.shape[0]
    B = _b_matrix(be, K, xt.dtype)
    n_mix = 0 if last else lmax + 1
    out_shapes = [(xt.shape[0], None)]
    if not last:
        c_out = ws[1 + n_lat].shape[1]
        out_shapes.append((d_dim, c_out, None))
    outs = _env_fused_call(
        functools.partial(_layer1_fwd_kernel), lmax, parity, inv_avg,
        (xt, Vt, yt, ut), B, ws, out_shapes, be,
        kernel_extra=(n_lat, n_mix, first_v, last),
    )
    return outs[0] if last else (outs[0], outs[1])


def _layer1_fwd(xt, Vt, yt, ut, ws, lmax, n_lat, meta):
    return _layer1_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, meta, False), (
        xt, Vt, yt, ut, ws,
    )


def _layer1_last_fwd(xt, Vt, yt, ut, ws, lmax, n_lat, meta):
    return _layer1_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, meta, True), (
        xt, Vt, yt, ut, ws,
    )


def _layer1_bwd_impl(lmax, n_lat, meta, res, dxo, dvo, last):
    xt, Vt, yt, ut, ws = res
    K, be, be_bwd, inv_avg, parity, first_v = meta
    d_dim = yt.shape[0]
    c = Vt.shape[0] if first_v else Vt.shape[1]
    B = _b_matrix(be_bwd, K, xt.dtype)
    n_mix = 0 if last else lmax + 1
    cot_ops = (dxo,) if last else (dxo, dvo)
    dv_shape = (c, None) if first_v else (d_dim, c, None)
    dx, dV, dy, du = _env_fused_call(
        functools.partial(_layer1_bwd_kernel), lmax, parity, inv_avg,
        (xt, Vt, yt, ut, *cot_ops), B, ws,
        [(xt.shape[0], None), dv_shape, (d_dim, None), (1, None)],
        be_bwd, kernel_extra=(n_lat, n_mix, first_v, last),
    )
    dws = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), ws)
    return dx, dV, dy, du, dws


def _layer1_bwd(lmax, n_lat, meta, res, cots):
    dxo, dvo = cots
    return _layer1_bwd_impl(lmax, n_lat, meta, res, dxo, dvo, False)


def _layer1_last_bwd(lmax, n_lat, meta, res, dxo):
    return _layer1_bwd_impl(lmax, n_lat, meta, res, dxo, None, True)


_layer1.defvjp(_layer1_fwd, _layer1_bwd)
_layer1_last.defvjp(_layer1_last_fwd, _layer1_last_bwd)


# ---------------------------------------------------------------------------
# Embed-fused FIRST layer and readout-fused LAST layer (r5 glue attack).
#
# The r5 trace attribution (benchmarks/hlo_dump.py) put ~2.5 device-ms/step
# of the remaining XLA glue in the two-body MLP + tensor embed forward and
# backward passes over (64, E) tensors (convolution_multiply_fusion.8-10,
# fusion.355/356) and the readout-head twins.  Both are normalized-silu MLPs
# with the exact structure of the in-kernel latent (_latent_fwd/_latent_bwd),
# so they fuse into the first/last layer kernels' prologue/epilogue:
#
#   first layer (embed):  in_T (2T+nb, E) -> two-body MLP -> *u -> x0;
#                         pT = W_te^T x0 / sqrt(ns); then the first_v body.
#                         The (ns, E) x0 and (C, E) pT never exist in HBM.
#   last layer (readout): after x' = (x + MLP)*r2/..., the readout (and
#                         optional charge) head runs in-body; only (1, E)
#                         energy/charge rows leave the kernel — the (ns, E)
#                         final latent never exists in HBM.
#
# Backward kernels recompute the prologue (same recompute-beats-residuals
# decision as everything else here) and emit d(in_T) / consume (1, E) head
# cotangents.  Weight cotangents stay NaN-poisoned.
# ---------------------------------------------------------------------------


def _layer1e_fwd_kernel(lmax, parity, inv_avg, n_tb, n_lat, n_mix, *refs):
    in_ref, _pv, y_ref, b_ref = refs[:4]
    tb_refs = refs[4 : 4 + n_tb]
    te_ref = refs[4 + n_tb]
    env_w_ref = refs[5 + n_tb]
    lat_refs = refs[6 + n_tb : 6 + n_tb + n_lat]
    mix_refs = refs[6 + n_tb + n_lat : 6 + n_tb + n_lat + n_mix]
    rest = refs[6 + n_tb + n_lat + n_mix :]
    u_ref, x_out_ref, v_out_ref = rest[0], rest[1], rest[2]
    Y = y_ref[:]
    u = u_ref[:]
    B = b_ref[:].astype(Y.dtype)
    d_dim = Y.shape[0]
    # --- embed prologue: two-body MLP + tensor embed, all in VMEM ---
    x0, _, _ = _latent_fwd(in_ref[:], [w[:] for w in tb_refs], mm=_mm_embed)
    x = x0 * u  # (ns, BE)
    ns = x.shape[0]
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)
    te_w = te_ref[:].astype(x.dtype)
    pT = _mm_embed(te_w.T, x) * cns  # (C, BE)
    V = [pT * Y[d] for d in range(d_dim)]
    # --- standard first_v body ---
    env_w = env_w_ref[:].astype(x.dtype)
    wz = _mm(env_w.T, x) * cns * u
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg
    V_new, inv = _tp_mix_block(V, env, [m[:] for m in mix_refs], lmax,
                               parity, pmajor=True, inv_pmajor=True)
    v_out_ref[:] = V_new
    cat = jnp.concatenate([x, inv], axis=0)
    x_new, _, _ = _latent_fwd(cat, [w[:] for w in lat_refs])
    x_out_ref[:] = (x + x_new * u) * r2


def _layer1e_bwd_kernel(lmax, parity, inv_avg, n_tb, n_lat, n_mix, *refs):
    in_ref, _pv, y_ref, b_ref = refs[:4]
    tb_refs = refs[4 : 4 + n_tb]
    te_ref = refs[4 + n_tb]
    env_w_ref = refs[5 + n_tb]
    lat_refs = refs[6 + n_tb : 6 + n_tb + n_lat]
    mix_refs = refs[6 + n_tb + n_lat : 6 + n_tb + n_lat + n_mix]
    rest = refs[6 + n_tb + n_lat + n_mix :]
    (u_ref, dxout_ref, dvout_ref, din_ref, dy_ref, du_ref) = rest
    Y = y_ref[:]
    u = u_ref[:]
    B = b_ref[:].astype(Y.dtype)
    d_dim = Y.shape[0]
    r2 = 1.0 / math.sqrt(2.0)
    tb_ws = [w[:] for w in tb_refs]
    lat_ws = [w[:] for w in lat_refs]
    # --- recompute the embed prologue (keeping MLP residuals in VMEM) ---
    x0, tb_zs, tb_hs = _latent_fwd(in_ref[:], tb_ws, mm=_mm_embed)
    x = x0 * u
    ns = x.shape[0]
    cns = 1.0 / math.sqrt(ns)
    te_w = te_ref[:].astype(x.dtype)
    pT = _mm_embed(te_w.T, x) * cns
    V = [pT * Y[d] for d in range(d_dim)]
    c = pT.shape[0]
    # --- recompute the forward body (as _layer1_bwd_kernel, first_v) ---
    env_w = env_w_ref[:].astype(x.dtype)
    wz0 = _mm(env_w.T, x) * cns
    wz = wz0 * u
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg
    inv = _tp_inv_block(V, env, lmax, parity)
    cat = jnp.concatenate([x, inv], axis=0)
    x_new, zs, hs = _latent_fwd(cat, lat_ws)
    # --- reverse (first_v structure) ---
    dxout = dxout_ref[:]
    dxn = dxout * u * r2
    du = jnp.sum(dxout * x_new, axis=0, keepdims=True) * r2
    dx = dxout * r2
    dcat = _latent_bwd(lat_ws, zs, hs, dxn)
    dx = dx + dcat[:ns]
    dinv = dcat[ns:]
    nz = _nonzeros(lmax, parity)
    dv_acc_all = [None] * d_dim
    de_acc_all = [None] * d_dim
    row = 0
    for l3 in range(lmax + 1):
        P = len(paths_to_l(lmax, lmax, l3, parity))
        k3 = 2 * l3 + 1
        w = mix_refs[l3][:].astype(x.dtype)
        norm = 1.0 / math.sqrt(P * c)
        for k in range(k3):
            g_flat = _mm(w, dvout_ref[row]) * norm
            if l3 == 0 and k == 0:
                g_flat = g_flat + dinv
            for (p, i, j, kk, wv) in nz[l3]:
                if kk != k:
                    continue
                g = wv * g_flat[p * c : (p + 1) * c]
                t = g * env[j * c : (j + 1) * c]
                dv_acc_all[i] = t if dv_acc_all[i] is None else dv_acc_all[i] + t
                t2 = g * V[i]
                de_acc_all[j] = t2 if de_acc_all[j] is None else de_acc_all[j] + t2
            row += 1
    zero = jnp.zeros((c, Y.shape[1]), x.dtype)
    denv = jnp.concatenate(
        [r_ if r_ is not None else zero for r_ in de_acc_all], axis=0
    )
    dA = _env_avg(denv, B) * inv_avg
    dwz = None
    dy_rows = []
    for d in range(d_dim):
        dA_d = dA[d * c : (d + 1) * c]
        t = dA_d * Y[d]
        dwz = t if dwz is None else dwz + t
        dy_d = jnp.sum(dA_d * wz, axis=0, keepdims=True)
        if dv_acc_all[d] is not None:
            dy_d = dy_d + jnp.sum(dv_acc_all[d] * pT, axis=0, keepdims=True)
        dy_rows.append(dy_d)
    # dpT = sum_d dV0[d] * Y[d]
    dp = None
    for d in range(d_dim):
        if dv_acc_all[d] is None:
            continue
        t = dv_acc_all[d] * Y[d]
        dp = t if dp is None else dp + t
    dy_ref[:] = jnp.concatenate(dy_rows, axis=0)
    dx = dx + _mm(env_w, dwz * u) * cns
    du = du + jnp.sum(dwz * wz0, axis=0, keepdims=True)
    # --- embed prologue backward ---
    # pT = te^T x * cns:  dx += te @ dpT * cns
    if dp is not None:
        dx = dx + _mm_embed(te_w, dp) * cns
    # x = x0 * u:  du += sum(dx * x0);  dx0 = dx * u
    du = du + jnp.sum(dx * x0, axis=0, keepdims=True)
    din_ref[:] = _latent_bwd(tb_ws, tb_zs, tb_hs, dx * u, mm=_mm_embed)
    du_ref[:] = du


def _layer1r_fwd_kernel(lmax, parity, inv_avg, n_lat, n_ro, n_q, *refs):
    x_ref, v_ref, y_ref, b_ref = refs[:4]
    env_w_ref = refs[4]
    lat_refs = refs[5 : 5 + n_lat]
    ro_refs = refs[5 + n_lat : 5 + n_lat + n_ro]
    q_refs = refs[5 + n_lat + n_ro : 5 + n_lat + n_ro + n_q]
    rest = refs[5 + n_lat + n_ro + n_q :]
    u_ref, e_out_ref = rest[0], rest[1]
    q_out_ref = rest[2] if n_q else None
    x = x_ref[:]
    V = v_ref[:]
    Y = y_ref[:]
    u = u_ref[:]
    B = b_ref[:].astype(x.dtype)
    ns = x.shape[0]
    d_dim = Y.shape[0]
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)
    env_w = env_w_ref[:].astype(x.dtype)
    wz = _mm(env_w.T, x) * cns * u
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg
    inv = _tp_inv_block(V, env, lmax, parity)
    cat = jnp.concatenate([x, inv], axis=0)
    x_new, _, _ = _latent_fwd(cat, [w[:] for w in lat_refs])
    xf = (x + x_new * u) * r2
    # --- readout epilogue: energy (and optional charge) head in-body ---
    e_row, _, _ = _latent_fwd(xf, [w[:] for w in ro_refs], mm=_mm_exact)
    e_out_ref[:] = e_row * u
    if n_q:
        q_row, _, _ = _latent_fwd(xf, [w[:] for w in q_refs], mm=_mm_exact)
        q_out_ref[:] = q_row * u


def _layer1r_bwd_kernel(lmax, parity, inv_avg, n_lat, n_ro, n_q, *refs):
    x_ref, v_ref, y_ref, b_ref = refs[:4]
    env_w_ref = refs[4]
    lat_refs = refs[5 : 5 + n_lat]
    ro_refs = refs[5 + n_lat : 5 + n_lat + n_ro]
    q_refs = refs[5 + n_lat + n_ro : 5 + n_lat + n_ro + n_q]
    rest = refs[5 + n_lat + n_ro + n_q :]
    if n_q:
        (u_ref, de_ref, dq_ref, dx_ref, dv_ref, dy_ref, du_ref) = rest
    else:
        (u_ref, de_ref, dx_ref, dv_ref, dy_ref, du_ref) = rest
        dq_ref = None
    x = x_ref[:]
    V = v_ref[:]
    Y = y_ref[:]
    u = u_ref[:]
    B = b_ref[:].astype(x.dtype)
    ns = x.shape[0]
    d_dim = Y.shape[0]
    _, c, be = V.shape
    cns = 1.0 / math.sqrt(ns)
    r2 = 1.0 / math.sqrt(2.0)
    env_w = env_w_ref[:].astype(x.dtype)
    lat_ws = [w[:] for w in lat_refs]
    ro_ws = [w[:] for w in ro_refs]
    # --- recompute forward incl. the final latent xf ---
    wz0 = _mm(env_w.T, x) * cns
    wz = wz0 * u
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg
    inv = _tp_inv_block(V, env, lmax, parity)
    cat = jnp.concatenate([x, inv], axis=0)
    x_new, zs, hs = _latent_fwd(cat, lat_ws)
    xf = (x + x_new * u) * r2
    ro_row, ro_zs, ro_hs = _latent_fwd(xf, ro_ws, mm=_mm_exact)
    # --- head backward: e = ro(xf) * u ---
    de = de_ref[:]
    du = jnp.sum(de * ro_row, axis=0, keepdims=True)
    dxf = _latent_bwd(ro_ws, ro_zs, ro_hs, de * u, mm=_mm_exact)
    if n_q:
        q_ws = [w[:] for w in q_refs]
        q_row, q_zs, q_hs = _latent_fwd(xf, q_ws, mm=_mm_exact)
        dq = dq_ref[:]
        du = du + jnp.sum(dq * q_row, axis=0, keepdims=True)
        dxf = dxf + _latent_bwd(q_ws, q_zs, q_hs, dq * u, mm=_mm_exact)
    # --- last-layer backward from dxout = dxf (as _layer1_bwd_kernel last) ---
    dxn = dxf * u * r2
    du = du + jnp.sum(dxf * x_new, axis=0, keepdims=True) * r2
    dx = dxf * r2
    dcat = _latent_bwd(lat_ws, zs, hs, dxn)
    dx = dx + dcat[:ns]
    dinv = dcat[ns:]
    nz = _nonzeros(lmax, parity)
    dv_acc_all = [None] * d_dim
    de_acc_all = [None] * d_dim
    for (p, i, j, kk, wv) in nz[0]:  # last layer: only the l3=0, k=0 tile
        g = wv * dinv[p * c : (p + 1) * c]
        t = g * env[j * c : (j + 1) * c]
        dv_acc_all[i] = t if dv_acc_all[i] is None else dv_acc_all[i] + t
        t2 = g * V[i]
        de_acc_all[j] = t2 if de_acc_all[j] is None else de_acc_all[j] + t2
    zero = jnp.zeros((c, be), x.dtype)
    denv = jnp.concatenate(
        [r_ if r_ is not None else zero for r_ in de_acc_all], axis=0
    )
    dA = _env_avg(denv, B) * inv_avg
    dwz = None
    dy_rows = []
    for d in range(d_dim):
        dA_d = dA[d * c : (d + 1) * c]
        t = dA_d * Y[d]
        dwz = t if dwz is None else dwz + t
        dy_rows.append(jnp.sum(dA_d * wz, axis=0, keepdims=True))
    dv_ref[:] = jnp.stack(
        [r_ if r_ is not None else zero for r_ in dv_acc_all], axis=0
    )
    dy_ref[:] = jnp.concatenate(dy_rows, axis=0)
    dx = dx + _mm(env_w, dwz * u) * cns
    du = du + jnp.sum(dwz * wz0, axis=0, keepdims=True)
    dx_ref[:] = dx
    du_ref[:] = du


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _layer1_embed(in_t, yt, ut, ws, lmax, n_tb, n_lat, meta):
    """Embed-fused first layer: ws = (tb_ws..., tensor_embed, env_w,
    lat_ws..., mix_ws...); in_t (n_in, E).  Returns (xt', Vt')."""
    return _layer1e_fwd_impl(in_t, yt, ut, ws, lmax, n_tb, n_lat, meta)


def _layer1e_fwd_impl(in_t, yt, ut, ws, lmax, n_tb, n_lat, meta):
    K, be, be_bwd, inv_avg, parity, ns, c = meta
    d_dim = yt.shape[0]
    B = _b_matrix(be, K, in_t.dtype)
    n_mix = lmax + 1
    c_out = ws[n_tb + 2 + n_lat].shape[1]
    # dummy second edge op keeps _env_fused_call's (3 edge ops, B, ws, rest)
    # layout; (1, E) of zeros costs one lane row
    dummy = jnp.zeros((1, in_t.shape[-1]), in_t.dtype)
    outs = _env_fused_call(
        functools.partial(_layer1e_fwd_kernel), lmax, parity, inv_avg,
        (in_t, dummy, yt, ut), B, ws,
        [(ns, None), (d_dim, c_out, None)], be,
        kernel_extra=(n_tb, n_lat, n_mix),
    )
    return outs[0], outs[1]


def _layer1e_fwd(in_t, yt, ut, ws, lmax, n_tb, n_lat, meta):
    return _layer1e_fwd_impl(in_t, yt, ut, ws, lmax, n_tb, n_lat, meta), (
        in_t, yt, ut, ws,
    )


def _layer1e_bwd(lmax, n_tb, n_lat, meta, res, cots):
    in_t, yt, ut, ws = res
    dxo, dvo = cots
    K, be, be_bwd, inv_avg, parity, ns, c = meta
    d_dim = yt.shape[0]
    B = _b_matrix(be_bwd, K, in_t.dtype)
    dummy = jnp.zeros((1, in_t.shape[-1]), in_t.dtype)
    din, dy, du = _env_fused_call(
        functools.partial(_layer1e_bwd_kernel), lmax, parity, inv_avg,
        (in_t, dummy, yt, ut, dxo, dvo), B, ws,
        [(in_t.shape[0], None), (d_dim, None), (1, None)],
        be_bwd, kernel_extra=(n_tb, n_lat, lmax + 1),
    )
    dws = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), ws)
    return din, dy, du, dws


_layer1_embed.defvjp(_layer1e_fwd, _layer1e_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _layer1_last_readout(xt, Vt, yt, ut, ws, lmax, n_lat, n_heads, meta):
    """Readout-fused last layer: ws = (env_w, lat_ws..., ro_ws...[, q_ws...]);
    n_heads = (n_ro, n_q).  Returns e_row (1, E) or (e_row, q_row)."""
    return _layer1r_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, n_heads, meta)


def _layer1r_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, n_heads, meta):
    K, be, be_bwd, inv_avg, parity = meta
    n_ro, n_q = n_heads
    B = _b_matrix(be, K, xt.dtype)
    out_shapes = [(1, None)] + ([(1, None)] if n_q else [])
    outs = _env_fused_call(
        functools.partial(_layer1r_fwd_kernel), lmax, parity, inv_avg,
        (xt, Vt, yt, ut), B, ws, out_shapes, be,
        kernel_extra=(n_lat, n_ro, n_q),
    )
    return (outs[0], outs[1]) if n_q else outs[0]


def _layer1r_fwd(xt, Vt, yt, ut, ws, lmax, n_lat, n_heads, meta):
    return _layer1r_fwd_impl(xt, Vt, yt, ut, ws, lmax, n_lat, n_heads, meta), (
        xt, Vt, yt, ut, ws,
    )


def _layer1r_bwd(lmax, n_lat, n_heads, meta, res, cots):
    xt, Vt, yt, ut, ws = res
    K, be, be_bwd, inv_avg, parity = meta
    n_ro, n_q = n_heads
    if n_q:
        de, dq = cots
        cot_ops = (de, dq)
    else:
        de = cots
        cot_ops = (de,)
    d_dim = yt.shape[0]
    c = Vt.shape[1]
    B = _b_matrix(be_bwd, K, xt.dtype)
    dx, dV, dy, du = _env_fused_call(
        functools.partial(_layer1r_bwd_kernel), lmax, parity, inv_avg,
        (xt, Vt, yt, ut, *cot_ops), B, ws,
        [(xt.shape[0], None), (d_dim, c, None), (d_dim, None), (1, None)],
        be_bwd, kernel_extra=(n_lat, n_ro, n_q),
    )
    dws = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), ws)
    return dx, dV, dy, du, dws


_layer1_last_readout.defvjp(_layer1r_fwd, _layer1r_bwd)


def allegro_layer_embed_fused_t(in_t, yt, ut, layer, two_body_ws, tensor_embed,
                                lmax: int, K: int, avg_num_neighbors,
                                parity: bool = False):
    """First Allegro layer with the two-body MLP + tensor embed fused into
    the kernel prologue.  in_t (n_in, E) = [onehot_i; onehot_j; bessel*u]
    feature-major rows; returns (xt', Vt').  Weight cotangents NaN-poisoned."""
    e = in_t.shape[-1]
    nc = e // K
    d_dim = yt.shape[0]
    ns = two_body_ws[-1].shape[1]
    c = layer["env_weight"].shape[1]
    be, pad_c = _env_block_geometry(K, nc, d_dim, c)
    assert pad_c == 0, "caller must pre-pad lanes (models/allegro.py does)"
    import os

    def _ovr(name, default):
        v = int(os.environ.get(name, "0"))
        return v if v and v % K == 0 and v % 128 == 0 and e % v == 0 else default

    be = _ovr("PAT_L1_BE", be)
    be_b = _ovr("PAT_L1_BE_BWD", be)
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    lat = list(layer["latent_mlp"]["w"])
    w0 = lat[0]
    lat[0] = jnp.concatenate([w0[:ns], _to_pmajor(w0[ns:], c)], axis=0)
    mix_ws = tuple(_to_pmajor(layer["mix"][f"l{l}"], c) for l in range(lmax + 1))
    ws = (*two_body_ws, tensor_embed, layer["env_weight"], *lat, *mix_ws)
    return _layer1_embed(
        in_t, yt, ut, ws, lmax, len(two_body_ws), len(lat),
        (K, be, be_b, float(inv_avg), parity, ns, c),
    )


def allegro_layer_readout_fused_t(xt, Vt, yt, ut, layer, readout_ws,
                                  charge_ws, lmax: int, K: int,
                                  avg_num_neighbors, parity: bool = False):
    """Last Allegro layer with the readout (and optional charge) head fused
    into the kernel epilogue.  Returns e_row (1, E), or (e_row, q_row) when
    charge_ws is non-empty — both already multiplied by u."""
    e = Vt.shape[-1]
    nc = e // K
    d_dim = yt.shape[0]
    c = layer["env_weight"].shape[1]
    be, pad_c = _env_block_geometry(K, nc, d_dim, c)
    assert pad_c == 0, "caller must pre-pad lanes (models/allegro.py does)"
    import os

    def _ovr(name, default):
        v = int(os.environ.get(name, "0"))
        return v if v and v % K == 0 and v % 128 == 0 and e % v == 0 else default

    be = _ovr("PAT_L1_BE", be)
    be_b = _ovr("PAT_L1_BE_BWD", be)
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    ns = xt.shape[0]
    lat = list(layer["latent_mlp"]["w"])
    w0 = lat[0]
    lat[0] = jnp.concatenate([w0[:ns], _to_pmajor(w0[ns:], c)], axis=0)
    charge_ws = tuple(charge_ws or ())
    ws = (layer["env_weight"], *lat, *readout_ws, *charge_ws)
    return _layer1_last_readout(
        xt, Vt, yt, ut, ws, lmax, len(lat),
        (len(readout_ws), len(charge_ws)),
        (K, be, be_b, float(inv_avg), parity),
    )


def allegro_layer_fused_t(xt, Vt, yt, ut, layer, lmax: int, K: int,
                          avg_num_neighbors, parity: bool = False,
                          first_v: bool = False, last: bool = False):
    """One Allegro layer — env weights, in-kernel environment, TP, mix,
    latent MLP, residual — as a single kernel call on the feature-major
    layout.  xt (ns, E); Vt (D, C, E); yt (D, E); ut (1, E).
    Returns (xt', Vt').  Weight cotangents NaN-poisoned (forces only).

    first_v: Vt is instead the (C, E) tensor embedding pT and V0 = pT*Y is
    built in-body (first layer — the (D, C, E) V0 never exists in HBM).
    last: no V output is produced or returned (last layer — its V would be
    dead; the kernel skips the mix matmuls and the whole mix backward)."""
    e = Vt.shape[-1]
    nc = e // K
    d_dim = yt.shape[0]
    c = layer["env_weight"].shape[1]
    be, pad_c = _env_block_geometry(K, nc, d_dim, c)
    assert pad_c == 0, "caller must pre-pad lanes (models/allegro.py does)"
    import os

    def _ovr(name, default):
        v = int(os.environ.get(name, "0"))
        return v if v and v % K == 0 and v % 128 == 0 and e % v == 0 else default

    be = _ovr("PAT_L1_BE", be)          # fwd (and default bwd) block lanes
    be_b = _ovr("PAT_L1_BE_BWD", be)    # bwd block lanes
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    lat = list(layer["latent_mlp"]["w"])
    # this kernel is ALWAYS p-major in-body (see _layer1_fwd_kernel): mix
    # rows permuted, and the inv-consuming rows of the first latent weight
    # permuted to match the p-major inv
    ns = xt.shape[0]
    w0 = lat[0]
    lat[0] = jnp.concatenate([w0[:ns], _to_pmajor(w0[ns:], c)], axis=0)
    mix_ws = () if last else tuple(
        _to_pmajor(layer["mix"][f"l{l}"], c) for l in range(lmax + 1)
    )
    ws = (layer["env_weight"], *lat, *mix_ws)
    fn = _layer1_last if last else _layer1
    return fn(
        xt, Vt, yt, ut, ws, lmax, len(lat),
        (K, be, be_b, float(inv_avg), parity, first_v),
    )
#
# The "paths" kernels above run the TP as ~140 unrolled 3j VPU FMAs per
# block; the r2 profile calls the step VPU-bound.  This variant collapses
# TP+mix into ONE MXU matmul per block against the combined constant matrix
# M (ops/tp.combined_tp_mix_matrix):  out[(k,c'), e] = Mt @ O, with
# O[(ij,c), e] = V[i,c,e] * env[j,c,e] the channelwise outer product.
# ~6x the minimal FLOPs, but all of them MXU-shaped (K = d*d*C = 2592).
#
# Precision modes (meta.mode):
#   mxu_highest — f32 O and M, Precision.HIGHEST (6 bf16 passes; exact-f32)
#   mxu_bf16x3  — M pre-split hi/lo bf16 host-side, O split in-kernel; 3
#                 DEFAULT passes with f32 accumulation (~1e-6 rel error —
#                 comfortably inside the 1e-4 eV/A force budget)
#   mxu_bf16    — single DEFAULT pass (fast tier accuracy)
#
# MEASURED (v5e, bench config 5,324 atoms / E=360k / C=32 / D=9 / parity,
# per layer fwd+VJP via the scan harness in /tmp/bench_kernels.py r3):
# the experiment LOSES to the paths kernel — see BASELINE.md round-3 notes
# for numbers and the analysis; kept as a tested opt-in (cfg.tp_mode).
# ---------------------------------------------------------------------------


def _env_mxu_mix(O, m_refs, mode):
    """The combined TP+mix matmul at the requested precision.
    O: (ddc, BE) f32;  m_refs: per-mode constant refs;  returns (dco, BE)."""
    if mode == "mxu_bf16x3":
        mt_hi, mt_lo = m_refs[0][:], m_refs[1][:]
        o_hi = O.astype(jnp.bfloat16)
        o_lo = (O - o_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

        return d(mt_hi, o_hi) + d(mt_hi, o_lo) + d(mt_lo, o_hi)
    mt = m_refs[0][:]
    prec = (
        jax.lax.Precision.HIGHEST if mode == "mxu_highest"
        else jax.lax.Precision.DEFAULT
    )
    if mode == "mxu_bf16":
        O = O.astype(jnp.bfloat16)
    return jnp.dot(mt, O, preferred_element_type=jnp.float32, precision=prec)


def _env_layer_mxu_fwd_kernel(lmax, parity, inv_avg, mode, n_m, *refs):
    v_ref, wz_ref, y_ref, b_ref = refs[:4]
    m_refs = refs[4 : 4 + n_m]
    out_ref, inv_ref = refs[4 + n_m], refs[5 + n_m]
    V = v_ref[:]
    wz = wz_ref[:]
    Y = y_ref[:]
    B = b_ref[:].astype(V.dtype)
    d_dim, c, be = V.shape
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg  # flat (D*C, BE)
    # O rows (ij, c)-major — matches the host-side row reorder of M
    O = jnp.concatenate(
        [V[ij // d_dim] * env[(ij % d_dim) * c : (ij % d_dim + 1) * c]
         for ij in range(d_dim * d_dim)],
        axis=0,
    )  # (ddc, BE) — all VPU products the matmul then consumes
    out2 = _env_mxu_mix(O, m_refs, mode)  # (d*c_out, BE)
    c_out = out2.shape[0] // d_dim
    out_ref[:] = jnp.stack(
        [out2[k * c_out : (k + 1) * c_out] for k in range(d_dim)], axis=0
    )
    # invariants: l3=0 rows of the pre-mix TP — a handful of VPU FMAs on
    # already-computed O rows
    nz = _nonzeros(lmax, parity)
    P0 = len(paths_to_l(lmax, lmax, 0, parity))
    acc = [None] * P0
    for (p, i, j, k, wv) in nz[0]:
        term = wv * O[(i * d_dim + j) * c : (i * d_dim + j + 1) * c]
        acc[p] = term if acc[p] is None else acc[p] + term
    inv_ref[:] = jnp.stack(acc, axis=1).reshape(c * P0, be)


def _env_layer_mxu_bwd_kernel(lmax, parity, inv_avg, mode, n_m, *refs):
    v_ref, wz_ref, y_ref, b_ref = refs[:4]
    m_refs = refs[4 : 4 + n_m]  # [Mt..., M...] (M = un-transposed, for dO)
    dout_ref, dinvp_ref, dv_ref, dwz_ref, dy_ref = refs[4 + n_m :]
    V = v_ref[:]
    wz = wz_ref[:]
    Y = y_ref[:]
    B = b_ref[:].astype(V.dtype)
    d_dim, c, be = V.shape
    A = jnp.concatenate([wz * Y[d] for d in range(d_dim)], axis=0)
    env = _env_avg(A, B) * inv_avg
    half = n_m // 2
    # dO = M @ dout2 (transpose of the forward mix)
    dout2 = jnp.concatenate([dout_ref[k] for k in range(d_dim)], axis=0)
    dO = _env_mxu_mix(dout2, m_refs[half:], mode)  # (ddc, BE)
    # + the invariant path: dinvp (P0, C, BE), pre-transposed at XLA level
    nz = _nonzeros(lmax, parity)
    dv_rows = [None] * d_dim
    de_rows = [None] * d_dim

    def _acc(rows, idx, t):
        rows[idx] = t if rows[idx] is None else rows[idx] + t

    for ij in range(d_dim * d_dim):
        i, j = ij // d_dim, ij % d_dim
        g = dO[ij * c : (ij + 1) * c]
        for (p, ii, jj, k, wv) in nz[0]:
            if ii == i and jj == j:
                g = g + wv * dinvp_ref[p]
        _acc(dv_rows, i, g * env[j * c : (j + 1) * c])
        _acc(de_rows, j, g * V[i])
    zero = jnp.zeros((c, be), V.dtype)
    dv_ref[:] = jnp.stack([r if r is not None else zero for r in dv_rows], axis=0)
    denv = jnp.concatenate([r if r is not None else zero for r in de_rows], axis=0)
    dA = _env_avg(denv, B) * inv_avg
    dwz = None
    dy_rows = []
    for d in range(d_dim):
        dA_d = dA[d * c : (d + 1) * c]
        t = dA_d * Y[d]
        dwz = t if dwz is None else dwz + t
        dy_rows.append(jnp.sum(dA_d * wz, axis=0, keepdims=True))
    dwz_ref[:] = dwz
    dy_ref[:] = jnp.concatenate(dy_rows, axis=0)


def _mxu_mats(ws_flat, lmax, parity, mode, c_in):
    """Host/XLA-side combined matrix in kernel row order + per-mode splits.

    Returns (m_arrays, n_m): for the fwd the first half (Mt, transposed) is
    used; the bwd uses the second half (M)."""
    from pair_allegro_tpu.ops.tp import combined_tp_mix_matrix

    ws = {f"l{l3}": ws_flat[l3] for l3 in range(lmax + 1)}
    M = combined_tp_mix_matrix(ws, lmax, jnp.float32, parity)  # (c*dd, d*c_out)
    dd = sh_dim(lmax) ** 2
    out = M.shape[1]
    # rows (c, ij)-major -> (ij, c)-major to match the kernel's O stacking
    M_k = jnp.transpose(M.reshape(c_in, dd, out), (1, 0, 2)).reshape(dd * c_in, out)
    Mt = M_k.T
    if mode == "mxu_bf16x3":
        def split(a):
            hi = a.astype(jnp.bfloat16)
            return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        mt_hi, mt_lo = split(Mt)
        m_hi, m_lo = split(M_k)
        return (mt_hi, mt_lo, m_hi, m_lo), 2
    if mode == "mxu_bf16":
        return (Mt.astype(jnp.bfloat16), M_k.astype(jnp.bfloat16)), 1
    return (Mt, M_k), 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _env_fused_mxu(Vt, wzt, yt, m_arrays, lmax, meta):
    return _env_fused_mxu_fwd_impl(Vt, wzt, yt, m_arrays, lmax, meta)


def _env_fused_mxu_fwd_impl(Vt, wzt, yt, m_arrays, lmax, meta):
    K, be, inv_avg, parity, mode = meta
    d_dim, c, e = Vt.shape
    n_m = len(m_arrays) // 2
    c_out = m_arrays[0].shape[0] // d_dim
    p0 = len(paths_to_l(lmax, lmax, 0, parity))
    S = _s_matrix(be, be // K, K)
    B = jnp.asarray(S @ S.T, Vt.dtype)
    out, inv = _env_fused_call(
        functools.partial(_env_layer_mxu_fwd_kernel),
        lmax, parity, inv_avg, (Vt, wzt, yt), B, m_arrays[:n_m],
        [(d_dim, c_out, None), (c * p0, None)], be,
        kernel_extra=(mode, n_m),
    )
    return out, inv


def _env_fused_mxu_fwd(Vt, wzt, yt, m_arrays, lmax, meta):
    return _env_fused_mxu_fwd_impl(Vt, wzt, yt, m_arrays, lmax, meta), (
        Vt, wzt, yt, m_arrays,
    )


def _env_fused_mxu_bwd(lmax, meta, res, cots):
    Vt, wzt, yt, m_arrays = res
    dout, dinv = cots
    K, be, inv_avg, parity, mode = meta
    d_dim, c, e = Vt.shape
    p0 = len(paths_to_l(lmax, lmax, 0, parity))
    S = _s_matrix(be, be // K, K)
    B = jnp.asarray(S @ S.T, Vt.dtype)
    # dinv (c*P0, E) rows (c, p)-major -> (P0, C, E) so the kernel reads
    # clean (C, BE) tiles per path (in-kernel strided access is not a thing)
    dinvp = jnp.transpose(dinv.reshape(c, p0, e), (1, 0, 2))
    dV, dwz, dY = _env_fused_call(
        functools.partial(_env_layer_mxu_bwd_kernel),
        lmax, parity, inv_avg, (Vt, wzt, yt, dout, dinvp), B, m_arrays,
        [(d_dim, c, None), (c, None), (d_dim, None)], be,
        kernel_extra=(mode, len(m_arrays)),
    )
    dms = jax.tree.map(lambda w: jnp.full_like(w, jnp.nan), m_arrays)
    return dV, dwz, dY, dms


_env_fused_mxu.defvjp(_env_fused_mxu_fwd, _env_fused_mxu_bwd)


def allegro_stack_apply(x0, p_embed, Y, u, layers, lmax: int,
                        avg_num_neighbors: float, parity: bool = False):
    """Fused Allegro layer stack on the TABLE layout.

    Args: x0 (Nc, K, ns); p_embed (Nc, K, C); Y (Nc, K, D); u (Nc, K);
    layers: the params['layers'] list.  Returns x_final (Nc, K, ns).

    On TPU, runs the whole interior as one Pallas kernel per edge block
    (see module doc); elsewhere — and at f64, which Mosaic does not
    support — falls back to the pure-jnp reference.
    """
    if not _use_pallas() or x0.dtype.itemsize > 4:
        return allegro_stack_ref(
            x0, p_embed, Y, u, layers, lmax, avg_num_neighbors, parity
        )
    nc, K0, ns = x0.shape
    # pad K to a multiple of 32 (keeps blocks 128-aligned with small m);
    # padded slots are u=0 fake edges that contribute exactly nothing
    k_pad = (-K0) % 32
    if k_pad:
        x0 = jnp.pad(x0, ((0, 0), (0, k_pad), (0, 0)))
        p_embed = jnp.pad(p_embed, ((0, 0), (0, k_pad), (0, 0)))
        Y = jnp.pad(Y, ((0, 0), (0, k_pad), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, k_pad)))
    K = K0 + k_pad
    be, m = _block_geometry(K, nc)
    pad = (-nc) % m
    if pad:
        x0 = jnp.pad(x0, ((0, pad), (0, 0), (0, 0)))
        p_embed = jnp.pad(p_embed, ((0, pad), (0, 0), (0, 0)))
        Y = jnp.pad(Y, ((0, pad), (0, 0), (0, 0)))
        u = jnp.pad(u, ((0, pad), (0, 0)))
    e = (nc + pad) * K

    def t(a):  # (Nc, K, F) -> (F, E)
        return a.reshape(e, -1).T

    ws_flat, n_lat = _flatten_layer_ws(layers, lmax)
    inv_avg = 1.0 / math.sqrt(max(avg_num_neighbors, 1e-6))
    xf = _stack(
        t(x0), t(p_embed), t(Y), u.reshape(1, e), ws_flat,
        lmax, len(layers), n_lat, (K, be, float(inv_avg), parity),
    )
    xf = xf.T.reshape(nc + pad, K, ns)
    return xf[:nc, :K0]
