"""Native checkpointing: model params and simulation state.

The reference splits this in two (SURVEY §5.4): model "checkpoints" are
compiled .nequip.pth/.pt2 artifacts produced offline (the pair style itself
stores nothing in restarts, restartinfo=0, pair_nequip_allegro.cpp:68), and
trajectory restart is owned by LAMMPS core.  Here both live natively:

* params: a JAX pytree flattened to .npz with '/'-joined path keys, plus a
  JSON header with the model config — self-describing like the reference's
  compiled-artifact metadata (r_max, type_names, ..., pair_nequip_allegro.cpp:214-222).
* simulation state: positions/velocities/types/masses/cell (+ step), the
  LAMMPS restart analog.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from pair_allegro_tpu.system import System

_CFG_KEY = "__config_json__"
_FAMILY_KEY = "__family__"


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def save_params(path: str, params, cfg=None, family: str | None = None) -> None:
    """Save a params pytree (+ model config dataclass) to one .npz file."""
    flat = _flatten(params)
    meta = {}
    if cfg is not None:
        meta[_CFG_KEY] = np.asarray(json.dumps(dataclasses.asdict(cfg)))
        meta[_FAMILY_KEY] = np.asarray(family or type(cfg).__name__)
    np.savez(path, **flat, **meta)


def _unflatten(flat: dict):
    """Rebuild nested dict/list structure from '/'-joined keys."""
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [fix(node[str(i)]) for i in range(len(keys))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def load_params(path: str):
    """Returns (params, cfg, family).  cfg is the raw dict (caller constructs
    the right *Config dataclass; lists are converted back to tuples for
    hashability)."""
    data = np.load(path, allow_pickle=False)
    flat = {}
    cfg = family = None
    for k in data.files:
        if k == _CFG_KEY:
            cfg = json.loads(str(data[k]))
        elif k == _FAMILY_KEY:
            family = str(data[k])
        else:
            flat[k] = data[k]
    params = _unflatten(flat)
    if cfg is not None:
        cfg = {k: tuple(v) if isinstance(v, list) else v for k, v in cfg.items()}
    return params, cfg, family


def make_config(cfg_dict: dict, family: str, params=None):
    """Rebuild the config dataclass saved by save_params.

    With ``params`` (the pytree loaded alongside), a missing ``parity`` field
    (checkpoints written before the parity default flipped to True) is
    inferred from the saved mix-weight row counts (C * P_l1, which differ
    between the parity-pruned and full path sets) instead of silently taking
    the new default and shape-erroring at trace time."""
    if family in ("AllegroConfig", "allegro"):
        from pair_allegro_tpu.models.allegro import AllegroConfig

        if "parity" not in cfg_dict and params is not None:
            from pair_allegro_tpu.ops.tp import paths_to_l

            lmax = int(cfg_dict.get("l_max", 2))
            c = int(cfg_dict.get("num_tensor_features", 32))
            try:
                rows = int(np.asarray(params["layers"][0]["mix"]["l1"]).shape[0])
                for parity in (True, False):
                    if rows == c * len(paths_to_l(lmax, lmax, 1, parity)):
                        cfg_dict = dict(cfg_dict, parity=parity)
                        break
            except (KeyError, IndexError, TypeError):
                pass
        return AllegroConfig(**cfg_dict)
    if family in ("NequIPConfig", "nequip"):
        from pair_allegro_tpu.models.nequip import NequIPConfig

        return NequIPConfig(**cfg_dict)
    raise ValueError(f"unknown model family {family!r}")


def save_state(path: str, system: System, step: int = 0,
               thermostat: dict | None = None, rng_key=None) -> None:
    """LAMMPS-restart analog: the full dynamical state.  ``rng_key`` (the
    MDState PRNG key) makes stochastic integrators (langevin) resume
    bit-for-bit."""
    extra = {}
    if rng_key is not None:
        extra["rng_key"] = np.asarray(rng_key)
    np.savez(
        path,
        positions=np.asarray(system.positions),
        velocities=np.asarray(system.velocities),
        types=np.asarray(system.types),
        masses=np.asarray(system.masses),
        cell=np.asarray(system.cell),
        pbc=np.asarray(system.pbc),
        valid=np.asarray(system.valid_mask()),
        step=np.asarray(step),
        **extra,
        **({f"thermostat/{k}": np.asarray(v) for k, v in (thermostat or {}).items()}),
    )


def load_state(path: str, dtype=None):
    """Returns (System, step, thermostat_dict, rng_key_or_None)."""
    import jax.numpy as jnp

    data = np.load(path)
    dtype = dtype or jnp.float64
    system = System(
        positions=jnp.asarray(data["positions"], dtype),
        velocities=jnp.asarray(data["velocities"], dtype),
        types=jnp.asarray(data["types"]),
        masses=jnp.asarray(data["masses"], dtype),
        cell=jnp.asarray(data["cell"], dtype),
        pbc=tuple(bool(b) for b in data["pbc"]),
        valid=jnp.asarray(data["valid"]),
    )
    thermo = {
        k.split("/", 1)[1]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("thermostat/")
    }
    key = jnp.asarray(data["rng_key"]) if "rng_key" in data.files else None
    return system, int(data["step"]), thermo, key
