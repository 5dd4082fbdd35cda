"""Extended-XYZ reader/writer.

The reference's test fixtures are extxyz files read through ASE
(/root/reference/tests/conftest.py:99-109, tests/test_data/*.xyz); this is a
self-contained implementation of the subset those files use: a `Lattice=`
cell, `Properties=species:S:1:pos:R:3[:...]`, `pbc=` flags, and arbitrary
scalar comment-line key=values.
"""

from __future__ import annotations

import re

import numpy as np

_KV_RE = re.compile(r'(\w[\w-]*)\s*=\s*(?:"([^"]*)"|(\S+))')


def _parse_comment(line: str) -> dict:
    out = {}
    for m in _KV_RE.finditer(line):
        key = m.group(1)
        val = m.group(2) if m.group(2) is not None else m.group(3)
        out[key] = val
    return out


def _parse_properties(spec: str):
    """'species:S:1:pos:R:3:forces:R:3' -> [(name, kind, ncols), ...]"""
    parts = spec.split(":")
    return [(parts[i], parts[i + 1], int(parts[i + 2])) for i in range(0, len(parts), 3)]


def read_extxyz(path: str, index: int | None = None):
    """Read extxyz frames.

    Returns a list of frame dicts (or one dict if `index` given) with keys:
    'symbols' (N,) str array, 'positions' (N,3) f64, 'cell' (3,3) f64 or
    None, 'pbc' (3,) bool, 'info' (comment key/values), plus any extra
    per-atom columns by name (e.g. 'forces').
    """
    frames = []
    with open(path) as f:
        lines = f.read().splitlines()
    k = 0
    while k < len(lines):
        if not lines[k].strip():
            k += 1
            continue
        nat = int(lines[k].strip())
        info = _parse_comment(lines[k + 1])
        props = _parse_properties(info.get("Properties", "species:S:1:pos:R:3"))
        rows = [lines[k + 2 + i].split() for i in range(nat)]
        frame: dict = {"info": info}
        col = 0
        for (name, kind, ncol) in props:
            block = [r[col : col + ncol] for r in rows]
            col += ncol
            if kind == "S":
                arr = np.asarray([b[0] for b in block])
            elif kind == "I":
                arr = np.asarray(block, dtype=np.int64).reshape(nat, ncol)
            else:
                arr = np.asarray(block, dtype=np.float64).reshape(nat, ncol)
            if ncol == 1 and kind != "S":
                arr = arr[:, 0]
            frame["symbols" if name == "species" else name] = arr
        frame["positions"] = frame.pop("pos")
        if "Lattice" in info:
            # Lattice is ROW-major: "ax ay az bx by bz cx cy cz"
            frame["cell"] = np.fromstring(info["Lattice"], sep=" ").reshape(3, 3)
        else:
            frame["cell"] = None
        pbc_str = info.get("pbc", "T T T" if frame["cell"] is not None else "F F F")
        frame["pbc"] = tuple(tok.upper().startswith("T") for tok in pbc_str.split())
        frames.append(frame)
        k += 2 + nat
    if index is not None:
        return frames[index]
    return frames


def write_extxyz(path: str, frames, mode: str = "w") -> None:
    """Write frames (dicts as produced by read_extxyz; extra (N,) or (N,k)
    float arrays become extra columns)."""
    if isinstance(frames, dict):
        frames = [frames]
    with open(path, mode) as f:
        for fr in frames:
            pos = np.asarray(fr["positions"], dtype=np.float64)
            nat = pos.shape[0]
            sym = fr.get("symbols", np.asarray(["X"] * nat))
            extras = {
                k: np.asarray(v)
                for k, v in fr.items()
                if k not in ("symbols", "positions", "cell", "pbc", "info")
                and hasattr(v, "__len__")
                and len(v) == nat
            }
            props = "species:S:1:pos:R:3"
            for k, v in extras.items():
                ncol = 1 if v.ndim == 1 else v.shape[1]
                props += f":{k}:R:{ncol}"
            comment = f'Properties={props}'
            cell = fr.get("cell")
            if cell is not None:
                flat = " ".join(f"{x:.10g}" for x in np.asarray(cell).reshape(-1))
                comment += f' Lattice="{flat}"'
            pbc = fr.get("pbc")
            if pbc is not None:
                comment += ' pbc="' + " ".join("T" if b else "F" for b in pbc) + '"'
            for k, v in fr.get("info", {}).items():
                if k in ("Properties", "Lattice", "pbc"):
                    continue
                comment += f' {k}={v}'
            f.write(f"{nat}\n{comment}\n")
            for i in range(nat):
                row = f"{sym[i]} " + " ".join(f"{x:.12g}" for x in pos[i])
                for v in extras.values():
                    vals = np.atleast_1d(v[i])
                    row += " " + " ".join(f"{x:.12g}" for x in vals)
                f.write(row + "\n")
