"""LAMMPS data-file reader/writer (``read_data`` analog).

The reference's tests feed LAMMPS with data files written by ASE
(/root/reference/tests/test_python_repro_allegro.py:137-141, ``read_data`` in
the generated script at :100).  Supported subset: 'atoms'/'atom types'
headers, orthogonal + triclinic (xy xz yz) boxes, Masses section, Atoms
section in ``atomic`` style (id type x y z), optional Velocities.

LAMMPS box convention (matching get_cell, pair_nequip_allegro.cpp:652-666):
row-major cell [[lx,0,0],[xy,ly,0],[xz,yz,lz]] with origin (xlo, ylo, zlo).
"""

from __future__ import annotations

import numpy as np


def read_lammps_data(path: str) -> dict:
    """Returns dict with 'positions' (N,3), 'types' (N,) int32 0-based,
    'cell' (3,3), 'origin' (3,), 'masses_by_type' dict, 'velocities'
    (N,3) or None, 'n_types'."""
    with open(path) as f:
        lines = f.read().splitlines()

    n_atoms = n_types = None
    xlo = xhi = ylo = yhi = zlo = zhi = 0.0
    xy = xz = yz = 0.0
    section = None
    masses: dict[int, float] = {}
    ids, types, pos, vel_rows = [], [], [], {}

    i = 1  # skip title line
    while i < len(lines):
        raw = lines[i]
        line = raw.split("#")[0].strip()
        i += 1
        if not line:
            continue
        low = line.lower()
        if low.endswith(" atoms"):
            n_atoms = int(line.split()[0])
            continue
        if low.endswith(" atom types"):
            n_types = int(line.split()[0])
            continue
        if low.endswith("xlo xhi"):
            xlo, xhi = map(float, line.split()[:2])
            continue
        if low.endswith("ylo yhi"):
            ylo, yhi = map(float, line.split()[:2])
            continue
        if low.endswith("zlo zhi"):
            zlo, zhi = map(float, line.split()[:2])
            continue
        if low.endswith("xy xz yz"):
            xy, xz, yz = map(float, line.split()[:3])
            continue
        if low in ("masses", "atoms", "velocities") or low.startswith("atoms"):
            section = low.split()[0]
            continue
        if section == "masses":
            parts = line.split()
            masses[int(parts[0])] = float(parts[1])
        elif section == "atoms":
            parts = line.split()
            # atomic style: id type x y z [image flags]
            ids.append(int(parts[0]))
            types.append(int(parts[1]))
            pos.append([float(parts[2]), float(parts[3]), float(parts[4])])
        elif section == "velocities":
            parts = line.split()
            vel_rows[int(parts[0])] = [float(parts[1]), float(parts[2]), float(parts[3])]

    order = np.argsort(ids)
    positions = np.asarray(pos, np.float64)[order]
    type_arr = (np.asarray(types, np.int32) - 1)[order]
    vel = None
    if vel_rows:
        vel = np.asarray([vel_rows[ids[k]] for k in order], np.float64)
    cell = np.array(
        [[xhi - xlo, 0.0, 0.0], [xy, yhi - ylo, 0.0], [xz, yz, zhi - zlo]], np.float64
    )
    return {
        "positions": positions,
        "types": type_arr,
        "cell": cell,
        "origin": np.array([xlo, ylo, zlo]),
        "masses_by_type": {t - 1: m for t, m in masses.items()},
        "velocities": vel,
        "n_types": n_types if n_types is not None else int(type_arr.max()) + 1,
    }


def write_lammps_data(path: str, positions, types, cell, masses_by_type=None, velocities=None, origin=(0.0, 0.0, 0.0)) -> None:
    """Write an atomic-style data file.  `types` 0-based (written 1-based);
    `cell` must be LAMMPS upper-triangular row-major."""
    positions = np.asarray(positions, np.float64)
    types = np.asarray(types)
    cell = np.asarray(cell, np.float64)
    if abs(cell[0, 1]) > 1e-12 or abs(cell[0, 2]) > 1e-12 or abs(cell[1, 2]) > 1e-12:
        raise ValueError("cell must be LAMMPS-form [[lx,0,0],[xy,ly,0],[xz,yz,lz]]")
    n = positions.shape[0]
    n_types = int(types.max()) + 1 if len(types) else 0
    ox, oy, oz = origin
    with open(path, "w") as f:
        f.write("written by pair_allegro_tpu\n\n")
        f.write(f"{n} atoms\n{n_types} atom types\n\n")
        f.write(f"{ox:.10g} {ox + cell[0,0]:.10g} xlo xhi\n")
        f.write(f"{oy:.10g} {oy + cell[1,1]:.10g} ylo yhi\n")
        f.write(f"{oz:.10g} {oz + cell[2,2]:.10g} zlo zhi\n")
        if any(abs(v) > 1e-12 for v in (cell[1, 0], cell[2, 0], cell[2, 1])):
            f.write(f"{cell[1,0]:.10g} {cell[2,0]:.10g} {cell[2,1]:.10g} xy xz yz\n")
        if masses_by_type:
            f.write("\nMasses\n\n")
            for t in range(n_types):
                f.write(f"{t + 1} {masses_by_type.get(t, 1.0):.10g}\n")
        f.write("\nAtoms\n\n")
        for i in range(n):
            x, y, z = positions[i]
            f.write(f"{i + 1} {int(types[i]) + 1} {x:.12g} {y:.12g} {z:.12g}\n")
        if velocities is not None:
            f.write("\nVelocities\n\n")
            for i in range(n):
                vx, vy, vz = np.asarray(velocities)[i]
                f.write(f"{i + 1} {vx:.12g} {vy:.12g} {vz:.12g}\n")
