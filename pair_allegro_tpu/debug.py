"""Debug observability: the edge-dump channel.

The reference's debug mode (env ``_NEQUIP_LOG_LEVEL=DEBUG``) prints every
edge the pair style builds — (i, j, r, cell_shift) — and the tests verify
that dump against an exact oracle multiset
(/root/reference/pair_nequip_allegro.cpp:78-83,562-633;
tests/test_python_repro_allegro.py:197-286).  This module provides the same
channel: canonical edge tuples from a NeighborData (either layout), printed
or returned for differential testing.  Enabled in the CLI via
``PAT_LOG_LEVEL=DEBUG``.
"""

from __future__ import annotations

import os
import sys

import numpy as np

ENV_VAR = "PAT_LOG_LEVEL"


def debug_enabled() -> bool:
    return os.environ.get(ENV_VAR, "").upper() == "DEBUG"


def edge_set(neighbors, positions=None, cell=None):
    """Canonical edge tuples {(i, j, sx, sy, sz[, r])} from a NeighborData.

    Works for both FLAT (2, E) and TABLE (N, K) layouts.  With positions
    (and cell for PBC), each tuple carries the edge length — the quantity
    the reference dumps for distributional comparison when exact index
    equality is unavailable (test_python_repro_allegro.py:240-258).
    """
    ei = np.asarray(neighbors.edge_index)
    mask = np.asarray(neighbors.edge_mask)
    shifts = (
        np.zeros((0, 3)) if neighbors.edge_shifts is None else np.asarray(neighbors.edge_shifts)
    )
    if ei.ndim == 2 and ei.shape[0] == 2:  # flat
        i_arr, j_arr = ei[0], ei[1]
        sh = shifts.reshape(-1, 3) if shifts.size else np.zeros((ei.shape[1], 3))
        m = mask
    else:  # table: rows are centers
        n, k = ei.shape
        i_arr = np.repeat(np.arange(n, dtype=np.int64), k)
        j_arr = ei.reshape(-1)
        sh = shifts.reshape(-1, 3) if shifts.size else np.zeros((n * k, 3))
        m = mask.reshape(-1)
    out = set()
    pos = None if positions is None else np.asarray(positions, np.float64)
    cl = None if cell is None else np.asarray(cell, np.float64)
    for idx in np.nonzero(m)[0]:
        i, j = int(i_arr[idx]), int(j_arr[idx])
        s = tuple(int(round(x)) for x in sh[idx])
        if pos is not None:
            vec = pos[j] - pos[i]
            if cl is not None:
                vec = vec + np.asarray(sh[idx]) @ cl
            out.add((i, j, *s, round(float(np.linalg.norm(vec)), 10)))
        else:
            out.add((i, j, *s))
    return out


def dump_edges(neighbors, positions=None, cell=None, file=None) -> int:
    """Print the canonical edge list (sorted); returns the edge count."""
    file = file or sys.stdout
    edges = sorted(edge_set(neighbors, positions, cell))
    for e in edges:
        print("EDGE " + " ".join(str(x) for x in e), file=file)
    print(f"EDGES TOTAL {len(edges)}", file=file)
    return len(edges)
