"""Trajectory dump writer (``write_dump custom``/``dump`` analog).

The reference's tests dump per-atom id/type/positions/forces/energies for
comparison against the Python oracle
(/root/reference/tests/test_python_repro_allegro.py:114-118).  We write the
same LAMMPS dump-custom text format so existing toolchains parse it, plus
extxyz via io.extxyz for modern tools.
"""

from __future__ import annotations

import numpy as np


class DumpWriter:
    """Append LAMMPS dump-custom frames to a file.

    columns: list of (name, array_getter) where getters pull (N,) or (N,3)
    arrays from (system, outputs) each call.
    """

    def __init__(self, path: str, mode: str = "w"):
        self.path = path
        self._fh = open(path, mode)

    def write_frame(
        self, step: int, system, forces=None, atomic_energy=None, extras=None
    ) -> None:
        """extras: optional {name: (N,) or (N,k) array} appended as per-atom
        columns c_<name>[..] — the dump face of compute allegro/atom
        (/root/reference/compute/compute_allegro.cpp:131-156)."""
        pos = np.asarray(system.positions)
        valid = np.asarray(system.valid_mask())
        idx = np.nonzero(valid)[0]
        n = len(idx)
        cell = np.asarray(system.cell)
        fh = self._fh
        fh.write("ITEM: TIMESTEP\n%d\n" % step)
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % n)
        xy, xz, yz = cell[1, 0], cell[2, 0], cell[2, 1]
        if any(abs(v) > 1e-12 for v in (xy, xz, yz)):
            fh.write("ITEM: BOX BOUNDS xy xz yz pp pp pp\n")
            lo = [0.0 + min(0.0, xy, xz, xy + xz), 0.0 + min(0.0, yz), 0.0]
            hi = [cell[0, 0] + max(0.0, xy, xz, xy + xz), cell[1, 1] + max(0.0, yz), cell[2, 2]]
            for d, t in zip(range(3), (xy, xz, yz)):
                fh.write(f"{lo[d]:.10g} {hi[d]:.10g} {t:.10g}\n")
        else:
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                fh.write(f"0 {cell[d, d]:.10g}\n")
        cols = "id type x y z"
        types = np.asarray(system.types)
        f_arr = None if forces is None else np.asarray(forces)
        e_arr = None if atomic_energy is None else np.asarray(atomic_energy)
        if f_arr is not None:
            cols += " fx fy fz"
        if e_arr is not None:
            cols += " c_pe"
        x_arrs = {}
        for name, v in (extras or {}).items():
            v = np.asarray(v).reshape(len(valid), -1)
            x_arrs[name] = v
            cols += " " + " ".join(
                f"c_{name}" if v.shape[1] == 1 else f"c_{name}[{j + 1}]"
                for j in range(v.shape[1])
            )
        fh.write(f"ITEM: ATOMS {cols}\n")
        for k, i in enumerate(idx):
            row = f"{k + 1} {types[i] + 1} " + " ".join(f"{x:.12g}" for x in pos[i])
            if f_arr is not None:
                row += " " + " ".join(f"{x:.12g}" for x in f_arr[i])
            if e_arr is not None:
                row += f" {e_arr[i]:.12g}"
            for v in x_arrs.values():
                row += " " + " ".join(f"{x:.12g}" for x in v[i])
            fh.write(row + "\n")
        fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
