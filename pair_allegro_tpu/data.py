"""Training dataset: extxyz frames -> padded, batchable training Frames.

The reference delegates dataset handling to the nequip package (its test
fixtures train from ``tests/test_data/*.xyz`` via ``nequip-train``,
/root/reference/tests/conftest.py:131-171, with ASE doing the parsing).
This loader is native and TPU-shaped:

* every frame in a dataset is padded to ONE ``(N_pad, E_pad)`` shape so the
  jitted update step compiles once for the whole run (static shapes are the
  XLA contract — a fresh compile per frame geometry would dominate the run);
* frames stack along a leading batch axis (`stack_frames`) for vmapped
  minibatch losses and data-parallel sharding over a device mesh
  (`shard_batch`).

Targets come from the standard extxyz training convention the reference's
own data files use (energy= in the comment line, a forces:R:3 column, e.g.
/root/reference/tests/test_data/Cu-cubic.xyz): total energy, per-atom
forces, and optionally a 9-component ``virial=`` info entry.
"""

from __future__ import annotations

import numpy as np

from pair_allegro_tpu.io.extxyz import read_extxyz
from pair_allegro_tpu.neighbors.naive import neighbor_list_np, pad_edges

__all__ = ["load_frames", "stack_frames", "shard_batch"]


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def load_frames(
    path: str,
    type_names: tuple[str, ...],
    r_max: float,
    *,
    dtype=None,
    n_pad: int | None = None,
    e_pad: int | None = None,
    pad_multiple: int = 8,
    energy_key: str = "energy",
    forces_key: str = "forces",
    virial_key: str = "virial",
    cutoff_matrix: np.ndarray | None = None,
) -> list[dict]:
    """Read an extxyz dataset into training frames with ONE common shape.

    Args:
      path: extxyz file (multi-frame supported).
      type_names: the model's type vocabulary; species are mapped by name
        and unknown species hard-error (the reference's ``coeff`` contract,
        /root/reference/pair_nequip_allegro.cpp:274-294).
      r_max: neighbor cutoff for edge building (the model's r_max).
      dtype: jnp dtype for float arrays (default float32).
      n_pad / e_pad: atom / edge capacities.  Default: the dataset maxima
        rounded up to `pad_multiple` (atoms) and +12.5% headroom (edges).
      cutoff_matrix: optional per-edge-type build cutoffs (same semantics as
        the engine's typed neighbor build).

    Returns:
      list of Frame dicts (see pair_allegro_tpu.train.Frame): positions,
      types, edge_index (2, E_pad), cell, edge_shifts, edge_mask, atom_mask,
      n_atoms, forces, energy (+ virial if present in the file).  All frames
      share identical array shapes.
    """
    import jax.numpy as jnp

    from pair_allegro_tpu.engine import TypeMapper

    dtype = dtype or jnp.float32
    mapper = TypeMapper(type_names)
    raw = read_extxyz(path)
    if not raw:
        raise ValueError(f"no frames in {path}")

    parsed = []
    for fi, fr in enumerate(raw):
        pos = np.asarray(fr["positions"], np.float64)
        cell = fr.get("cell")
        pbc = tuple(bool(b) for b in fr.get("pbc", (False,) * 3))
        types = mapper.map_names(list(fr["symbols"]))
        ei, sh = neighbor_list_np(
            pos,
            None if cell is None else np.asarray(cell, np.float64),
            pbc,
            r_max,
            types=types if cutoff_matrix is not None else None,
            cutoff_matrix=cutoff_matrix,
        )
        info = fr.get("info", {})
        if energy_key not in info:
            raise KeyError(
                f"frame {fi} of {path}: missing '{energy_key}=' in the "
                f"comment line (keys: {sorted(info)})"
            )
        if forces_key not in fr:
            raise KeyError(
                f"frame {fi} of {path}: no '{forces_key}' per-atom column "
                f"(Properties gave: {sorted(k for k in fr if k != 'info')})"
            )
        rec = {
            "pos": pos,
            "cell": cell,
            "types": types,
            "ei": ei,
            "sh": sh,
            "energy": float(info[energy_key]),
            "forces": np.asarray(fr[forces_key], np.float64),
        }
        if virial_key in info:
            v = np.array(str(info[virial_key]).split(), dtype=np.float64)
            if v.size != 9:
                raise ValueError(
                    f"frame {fi}: '{virial_key}=' has {v.size} components, want 9"
                )
            rec["virial"] = v.reshape(3, 3)
        parsed.append(rec)

    max_n = max(r["pos"].shape[0] for r in parsed)
    max_e = max(r["ei"].shape[1] for r in parsed)
    n_pad = n_pad if n_pad is not None else _round_up(max_n, pad_multiple)
    e_pad = e_pad if e_pad is not None else _round_up(max(max_e + max_e // 8, 1), 64)
    if n_pad < max_n:
        raise ValueError(f"n_pad {n_pad} < largest frame ({max_n} atoms)")
    if e_pad < max_e:
        raise ValueError(f"e_pad {e_pad} < largest edge count ({max_e})")

    frames = []
    for rec in parsed:
        n = rec["pos"].shape[0]
        pos = np.zeros((n_pad, 3))
        pos[:n] = rec["pos"]
        types = np.zeros((n_pad,), np.int32)
        types[:n] = rec["types"]
        amask = np.zeros((n_pad,), bool)
        amask[:n] = True
        forces = np.zeros((n_pad, 3))
        forces[:n] = rec["forces"]
        # padded edges are (0,0) self-loops killed by edge_mask; padded atoms
        # appear in NO edge, so only their (masked) per-type bias is computed
        ei, sh, emask = pad_edges(rec["ei"], rec["sh"], e_pad)
        cell = rec["cell"]
        frame = {
            "positions": jnp.asarray(pos, dtype),
            "types": jnp.asarray(types),
            "edge_index": jnp.asarray(ei),
            "cell": None if cell is None else jnp.asarray(cell, dtype),
            "edge_shifts": jnp.asarray(sh, dtype),
            "edge_mask": jnp.asarray(emask),
            "atom_mask": jnp.asarray(amask),
            "n_atoms": jnp.asarray(n, jnp.int32),
            "forces": jnp.asarray(forces, dtype),
            "energy": jnp.asarray(rec["energy"], dtype),
        }
        if "virial" in rec:
            frame["virial"] = jnp.asarray(rec["virial"], dtype)
        frames.append(frame)

    # mixed open/periodic datasets would need per-frame cell presence; keep
    # the batch contract simple and hard-error like the engine does
    has_cell = [f["cell"] is not None for f in frames]
    if any(has_cell) and not all(has_cell):
        raise ValueError("dataset mixes periodic and open frames")
    return frames


def stack_frames(frames: list[dict]) -> dict:
    """Stack same-shape frames along a leading batch axis for vmap/DP.

    Returns one Frame dict whose every array has shape (B, ...).  `None`
    cells stay None (open boundaries).
    """
    import jax.numpy as jnp

    if not frames:
        raise ValueError("empty frame list")
    keys = frames[0].keys()
    for f in frames[1:]:
        if f.keys() != keys:
            raise ValueError("frames disagree on keys; pad/load them together")
    out = {}
    for k in keys:
        vals = [f[k] for f in frames]
        out[k] = None if vals[0] is None else jnp.stack(vals)
    return out


def shard_batch(batch: dict, mesh, axis: str = "dp") -> dict:
    """Place a stacked batch with its leading axis sharded over `mesh[axis]`.

    Params stay replicated (the caller just passes them to the jitted step);
    with the batch sharded, XLA turns the vmapped per-frame gradients into a
    reduce over ICI automatically — the data-parallel recipe, no pmap.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        if x is None:
            return None
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items()}
