"""Native C++ host runtime (csrc/pat_host.cpp) vs the python fallbacks."""

import os

import numpy as np
import pytest

from pair_allegro_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native extension unavailable (no toolchain)"
)


def test_neighbor_stats_matches_python(rng):
    from pair_allegro_tpu.neighbors.naive import neighbor_list_np

    cell = np.diag([16.0, 15.0, 17.0])
    cell[2, 0] = 2.0
    pos = rng.rand(400, 3) @ cell
    pos[:100] += cell[0] * 2  # unwrapped
    rc = 4.0
    res = native.neighbor_stats(pos, cell, rc)
    assert res is not None
    ei, _ = neighbor_list_np(pos, cell, (True,) * 3, rc)
    assert res[0] == ei.shape[1]
    assert res[1] == int(np.bincount(ei[0], minlength=400).max())


def test_neighbor_stats_small_box_falls_back(rng):
    pos = rng.rand(20, 3) * 6.0
    assert native.neighbor_stats(pos, np.eye(3) * 6.0, 4.0) is None


def test_spatial_keys_match_python(rng):
    cell = np.diag([10.0, 11.0, 12.0])
    pos = rng.rand(200, 3) @ cell
    keys = native.spatial_keys(pos, cell, 8)
    assert keys is not None
    frac = pos @ np.linalg.inv(cell)
    frac -= np.floor(frac)
    b = np.clip((frac * 8).astype(np.int64), 0, 7)
    ref = (b[:, 2] * 8 + b[:, 1]) * 8 + b[:, 0]
    np.testing.assert_array_equal(keys, ref)


def test_extxyz_fast_read(tmp_path, rng):
    from pair_allegro_tpu.io.extxyz import write_extxyz

    pos = rng.rand(9, 3) * 5
    syms = np.array(["Cu", "O", "H", "Cu", "Pd", "O", "H", "Cu", "O"])
    p = str(tmp_path / "a.xyz")
    write_extxyz(p, {"symbols": syms, "positions": pos, "cell": np.eye(3) * 5,
                     "pbc": (True,) * 3, "info": {}})
    res = native.read_extxyz_frame(p)
    assert res is not None
    pos2, syms2 = res
    np.testing.assert_allclose(pos2, pos, atol=1e-10)
    assert list(syms2) == list(syms)
