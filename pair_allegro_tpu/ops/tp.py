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

from pair_allegro_tpu.ops.prec import get_matmul_precision
from pair_allegro_tpu.ops.so3 import real_wigner_3j, sh_slice


@functools.lru_cache(maxsize=None)
def tp_paths(lmax_in1: int, lmax_in2: int, lmax_out: int) -> tuple[tuple[int, int, int], ...]:
    """All triangle-valid (l1, l2, l3) paths between uniform-layout operands."""
    paths = []
    for l1 in range(lmax_in1 + 1):
        for l2 in range(lmax_in2 + 1):
            for l3 in range(abs(l1 - l2), min(lmax_out, l1 + l2) + 1):
                paths.append((l1, l2, l3))
    return tuple(paths)


@functools.lru_cache(maxsize=None)
def paths_to_l(lmax_in1: int, lmax_in2: int, l3: int) -> tuple[tuple[int, int], ...]:
    return tuple(
        (l1, l2) for (l1, l2, l) in tp_paths(lmax_in1, lmax_in2, l3) if l == l3  # noqa: E741
    )


def num_paths_per_l(lmax_in1: int, lmax_in2: int, lmax_out: int) -> list[int]:
    return [len(paths_to_l(lmax_in1, lmax_in2, l3)) for l3 in range(lmax_out + 1)]


def _w3j(l1, l2, l3, dtype):
    return jnp.asarray(real_wigner_3j(l1, l2, l3), dtype=dtype)


def uniform_tp(x, y, lmax_out: int):
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
        for (l1, l2) in paths_to_l(lx, ly, l3):
            C = _w3j(l1, l2, l3, x.dtype)
            blocks.append(
                jnp.einsum(
                    "...ci,...cj,ijk->...ck",
                    x[..., sh_slice(l1)],
                    y[..., sh_slice(l2)],
                    C,
                    precision=get_matmul_precision(),
                )
            )
        out.append(jnp.stack(blocks, axis=-2) if blocks else None)
    return out


def tp_mix_init(key, lmax_in1: int, lmax_in2: int, lmax_out: int, c_in: int, c_out: int, dtype=jnp.float32):
    """Per-l3 channel+path mixing weights for the output of uniform_tp."""
    ws = {}
    for l3 in range(lmax_out + 1):
        p = len(paths_to_l(lmax_in1, lmax_in2, l3))
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
        m = jnp.dot(t, w.astype(t.dtype), precision=get_matmul_precision()) * (
            1.0 / math.sqrt(c_in * p)
        )
        pieces.append(jnp.moveaxis(m, -1, -2))  # (..., c_out, k)
    return jnp.concatenate(pieces, axis=-1)


def scalar_part(tp_out: list):
    """Extract the l3=0 invariants as (..., C*P0)."""
    t = tp_out[0][..., 0]  # (..., C, P0)
    return t.reshape(*t.shape[:-2], -1)
