"""IO round-trip tests (extxyz, lammps-data, dump) + reading the reference's
actual test-data structures for shape/semantic parity."""

import os

import numpy as np
import pytest

from pair_allegro_tpu.io import (
    read_extxyz,
    read_lammps_data,
    write_extxyz,
    write_lammps_data,
    DumpWriter,
)

REF_DATA = "/root/reference/tests/test_data"


def test_extxyz_roundtrip(tmp_path, rng):
    pos = rng.rand(7, 3) * 5
    cell = np.diag([5.0, 6.0, 7.0])
    cell[1, 0] = 0.3
    forces = rng.randn(7, 3)
    frame = {
        "symbols": np.asarray(["Cu", "O", "Cu", "H", "H", "O", "Cu"]),
        "positions": pos,
        "cell": cell,
        "pbc": (True, True, False),
        "forces": forces,
        "info": {"energy": "-1.25"},
    }
    p = str(tmp_path / "t.xyz")
    write_extxyz(p, frame)
    back = read_extxyz(p, index=0)
    np.testing.assert_allclose(back["positions"], pos, atol=1e-10)
    np.testing.assert_allclose(back["cell"], cell, atol=1e-10)
    np.testing.assert_allclose(back["forces"], forces, atol=1e-10)
    assert back["pbc"] == (True, True, False)
    assert list(back["symbols"]) == list(frame["symbols"])
    assert float(back["info"]["energy"]) == -1.25


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data not mounted")
@pytest.mark.parametrize(
    "fname,nat",
    [("aspirin.xyz", 21), ("Cu-cubic.xyz", 4), ("CuPd-cubic-big.xyz", 256)],
)
def test_read_reference_structures(fname, nat):
    frames = read_extxyz(os.path.join(REF_DATA, fname))
    fr = frames[0]
    assert fr["positions"].shape == (nat, 3)
    assert len(fr["symbols"]) == nat
    if fr["cell"] is not None:
        assert fr["cell"].shape == (3, 3)


def test_lammps_data_roundtrip(tmp_path, rng):
    pos = rng.rand(9, 3) * 4
    types = rng.randint(0, 3, 9)
    cell = np.array([[4.0, 0, 0], [0.5, 5.0, 0], [-0.25, 0.1, 6.0]])
    vel = rng.randn(9, 3)
    p = str(tmp_path / "data.lmp")
    write_lammps_data(p, pos, types, cell, masses_by_type={0: 1.0, 1: 12.0, 2: 63.5}, velocities=vel)
    back = read_lammps_data(p)
    np.testing.assert_allclose(back["positions"], pos, atol=1e-10)
    np.testing.assert_array_equal(back["types"], types)
    np.testing.assert_allclose(back["cell"], cell, atol=1e-10)
    np.testing.assert_allclose(back["velocities"], vel, atol=1e-10)
    assert back["masses_by_type"][2] == 63.5
    assert back["n_types"] == 3


def test_dump_writer(tmp_path, rng):
    import jax.numpy as jnp
    from pair_allegro_tpu.system import System

    pos = rng.rand(5, 3) * 3
    system = System.create(pos, np.zeros(5, np.int32), cell=np.eye(3) * 3, dtype=jnp.float64)
    p = str(tmp_path / "traj.dump")
    with DumpWriter(p) as dw:
        dw.write_frame(0, system, forces=rng.randn(5, 3), atomic_energy=rng.randn(5))
        dw.write_frame(10, system)
    text = open(p).read()
    assert text.count("ITEM: TIMESTEP") == 2
    assert "fx fy fz" in text and "c_pe" in text
