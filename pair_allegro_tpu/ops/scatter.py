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


def segment_sum(data, segment_ids, num_segments: int, indices_are_sorted: bool = False):
    """Sum `data` rows into `num_segments` buckets by `segment_ids`."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def masked_mean(x, mask, axis=None, eps: float = 1e-12):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)
