"""Segment (scatter) reductions for edge -> atom accumulation.

The TPU-native replacement for the reference's force write-back loops
(/root/reference/pair_nequip_allegro.cpp:369-380 OpenMP reduction, and the
Kokkos "store forces" kernel pair_nequip_allegro_kokkos.cpp:303-319): XLA
lowers segment_sum over sorted/unsorted indices to on-device scatter-adds.
Padded edges must point at a dump row (index >= num_valid) or carry zero
contributions — callers guarantee envelopes/masks are zero on padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def segment_sum(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    """Sum `data` rows into `num_segments` buckets by `segment_ids`."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


@jax.custom_vjp
def table_edge_vec(positions, j_idx, rev_idx, edge_mask):
    """vec[i, k] = positions[j_idx[i, k]] - positions[i] with a GATHER-based
    backward.

    The plain expression's transpose is a scatter-add of the (N*K, 3)
    edge-vector cotangent into (N, 3) — 2.35 ms at the 5,324-atom bench (TPU
    scatters serialize per element).  Because the neighbor TABLE is symmetric
    (one scalar build cutoff), the edges INTO atom a are exactly the reverses
    of a's own row, located by ``rev_idx`` (neighbors.device.reverse_table):

      dpos[a] = sum_k' dvec_masked_flat[rev_idx[a, k']] - sum_k dvec_masked[a, k]

    — a row gather + axis reduce (~0.5 ms for the same shapes).  The mask
    reproduces the scatter's exact behavior on padded slots (self-edges whose
    two contributions cancel); real edges' cotangents pass through unchanged.
    Only valid when the table rows are ALL atoms (no center window) —
    callers fall back to the plain gather otherwise."""
    return positions[j_idx] - positions[:, None, :]


def _tev_fwd(positions, j_idx, rev_idx, edge_mask):
    return table_edge_vec(positions, j_idx, rev_idx, edge_mask), (
        j_idx, rev_idx, edge_mask,
    )


def _vec_cotangent_to_atoms(dvec, j_idx, rev_idx, edge_mask):
    """The gather-based transpose shared by both table_edge_vec variants."""
    n, k = j_idx.shape
    dm = dvec * edge_mask.astype(dvec.dtype)[..., None]
    dflat = jnp.concatenate(
        [dm.reshape(n * k, 3), jnp.zeros((1, 3), dvec.dtype)], axis=0
    )
    return jnp.sum(dflat[rev_idx], axis=1) - jnp.sum(dm, axis=1)


def _tev_bwd(res, dvec):
    j_idx, rev_idx, edge_mask = res
    dpos = _vec_cotangent_to_atoms(dvec, j_idx, rev_idx, edge_mask)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return dpos, f0(j_idx), f0(rev_idx), f0(edge_mask)


table_edge_vec.defvjp(_tev_fwd, _tev_bwd)


@jax.custom_vjp
def table_edge_vec_typed(pos_t, j_idx, rev_idx, edge_mask):
    """(vec, t_j_float): like :func:`table_edge_vec`, but ``pos_t`` carries
    the per-atom type as a 4th (float) column so ONE row gather serves both
    the edge vectors and the neighbor types.

    MEASURED (round 3, 5,324-atom bench): the standalone ``types[j_idx]``
    s32 gather cost 2.26 ms/step — TPU gathers serialize per element, and a
    scalar s32 gather is the worst case, while the (E, 3) f32 ROW gather of
    the SAME indices costs 0.45 ms.  Packing the type as a trailing float
    column (exact for any realistic type count) rides the row gather nearly
    for free.  The type output is consumed only through ``==`` one-hot
    comparisons (no cotangent), so the backward is table_edge_vec's gather
    transpose with a zero column appended."""
    ext = pos_t[j_idx]
    return ext[..., :3] - pos_t[:, None, :3], ext[..., 3]


def _tevt_fwd(pos_t, j_idx, rev_idx, edge_mask):
    return table_edge_vec_typed(pos_t, j_idx, rev_idx, edge_mask), (
        j_idx, rev_idx, edge_mask,
    )


def _tevt_bwd(res, cot):
    dvec, _dtj = cot  # type output: comparisons only, no cotangent
    j_idx, rev_idx, edge_mask = res
    dpos = _vec_cotangent_to_atoms(dvec, j_idx, rev_idx, edge_mask)
    dpos_t = jnp.concatenate(
        [dpos, jnp.zeros((dpos.shape[0], 1), dpos.dtype)], axis=1
    )
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return dpos_t, f0(j_idx), f0(rev_idx), f0(edge_mask)


table_edge_vec_typed.defvjp(_tevt_fwd, _tevt_bwd)


@jax.custom_vjp
def table_gather_nodes(h, j_idx, rev_idx, edge_mask):
    """out[i, k, ...] = h[j_idx[i, k], ...] with a GATHER-based backward.

    The message-passing layers gather full node-feature rows per edge (the
    NequIP convolution input, models/nequip.py); the plain gather's
    transpose is a scatter-add of the (N, K, feat...) message cotangent into
    (N, feat...) — at the NequIP bench shapes (5,324 atoms, K=64, feat 512
    floats) TPU scatters serialize and dominate the force backward.  The
    neighbor TABLE is symmetric (one scalar build cutoff), so the edges INTO
    atom a are exactly the reverses of a's own row (neighbors.device.
    reverse_table — the same bijection behind table_edge_vec's force
    backward):

      dh[a] = sum_k' dmsg_masked_flat[rev_idx[a, k']]

    — a row gather + axis reduce.  Padded slots are masked (their rev maps
    to the appended zero row).  Only valid when the table rows are ALL atoms
    (no center window) — callers fall back to the plain gather otherwise."""
    return h[j_idx]


def _tgn_fwd(h, j_idx, rev_idx, edge_mask):
    return h[j_idx], (j_idx, rev_idx, edge_mask)


def _tgn_bwd(res, g):
    j_idx, rev_idx, edge_mask = res
    n, k = j_idx.shape
    feat = g.shape[2:]
    # clamp-and-mask instead of appending a sentinel zero row: the append was
    # a CONCATENATE over the full (E, feat) cotangent (~700 MB copied per
    # layer at the NequIP bench shapes — pad.650/662 in the r5 trace), and
    # the edge-mask pre-multiply another full pass.  rev entries reference
    # only REAL mirror edges; masked/padded slots carry the sentinel n*k,
    # which the validity multiply zeroes after the clamped gather — all of
    # it fusable with the K-axis reduce into one pass over the gather.
    gflat = g.reshape(n * k, *feat)
    valid = (rev_idx < n * k).reshape(n, k, *([1] * len(feat)))
    rc = jnp.minimum(rev_idx, n * k - 1)
    # where (not multiply): the clamped sentinel lands on an arbitrary real
    # slot whose cotangent may be non-finite on padded geometry.  f32
    # accumulation: under the bf16 gather-boundary tier (models/nequip.
    # _hj_bf16) g arrives half-width and a K-deep bf16 sum would cost ~1%
    # relative — the reduce upcasts, the output returns to g's dtype
    dh = jnp.sum(
        jnp.where(valid, gflat[rc], 0.0), axis=1,
        dtype=jnp.float32 if g.dtype == jnp.bfloat16 else None,
    ).astype(g.dtype)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    return dh, f0(j_idx), f0(rev_idx), f0(edge_mask)


table_gather_nodes.defvjp(_tgn_fwd, _tgn_bwd)


def masked_mean(x, mask, axis=None, eps: float = 1e-12):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)
