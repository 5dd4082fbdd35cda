"""Full-MD-step A/B harness: time Simulation steps at the bench config for
a list of (label, env overrides, cfg overrides) variants in ONE process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/step_ab.py \
           'base:' 'layer_fused:cfg.layer_fused=1' 'kmm:PAT_KMM_BATCH=1'

Each spec is `label:KEY=V,KEY=V`; keys starting with `cfg.` set
AllegroConfig fields (int-coerced), everything else is an env var.  Times
the SECOND run of a 60-step chunk (first = compile warmup), like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def run_variant(label: str, overrides: dict) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    cfg_kw = dict(
        type_names=("Cu",),
        r_max=4.5,
        l_max=2,
        num_layers=3,
        num_scalar_features=64,
        num_tensor_features=32,
        avg_num_neighbors=12.0,
    )
    for k, v in overrides.items():
        if k.startswith("cfg."):
            cfg_kw[k[4:]] = bool(int(v)) if v in ("0", "1") else v
        else:
            os.environ[k] = v
    cfg = AllegroConfig(**cfg_kw)
    pos, cell = _fcc_cu(11)
    n = pos.shape[0]
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(
        pos, np.zeros(n, np.int32), cell=cell, masses=np.full(n, 63.546),
        dtype=jnp.float32,
    )
    eng = AllegroEngine(cfg, params, system, skin=0.4)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs)
    sim.init_velocities(50.0)
    n_steps = 60
    sim.run(n_steps, log_every=n_steps)
    t0 = time.time()
    sim.run(n_steps, log_every=n_steps)
    wall = time.time() - t0
    ms = wall / n_steps * 1e3
    print(f"{label}: {ms:.1f} ms/step", flush=True)
    return ms


def main():
    for spec in sys.argv[1:]:
        label, _, ov = spec.partition(":")
        overrides = dict(kv.split("=", 1) for kv in ov.split(",") if kv)
        saved = {k: os.environ.get(k) for k in overrides if not k.startswith("cfg.")}
        try:
            run_variant(label, overrides)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
