"""Measure per-chunk dispatch overhead: wall ms/step vs scan chunk length.

The round-3 trace shows ~29.8 device-ms/step while the official bench walls
~35 ms/step at 60-step chunks — if the gap is per-CHUNK (host dispatch over
the tunneled relay + donated-state rebind + thermo row D2H), longer chunks
amortize it and the bench's chunking is leaving ~15% on the table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/chunk_amortize.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    from pair_allegro_tpu.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(11)
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=2, num_layers=3,
        num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    import os

    # dt ~0: the system barely moves, so neighbor counts/rebuilds stay fixed
    # and per-step device work is identical across chunk lengths — the
    # wall-per-step difference is pure per-chunk overhead (dispatch over the
    # relay, donated-state rebind, thermo D2H).  PAT_CHUNK_DT overrides.
    dt_fs = float(os.environ.get("PAT_CHUNK_DT", "0.01"))
    chunks = tuple(
        int(c) for c in os.environ.get("PAT_CHUNKS", "60,240").split(",")
    )
    from pair_allegro_tpu.md.integrate import Simulation as _Sim

    cap = _Sim.MAX_CHUNK
    bad = [c for c in chunks if c > cap]
    if bad:
        raise SystemExit(
            f"PAT_CHUNKS {bad} exceed Simulation's per-chunk cap ({cap}): the "
            "run would silently split into sub-chunks and the printout would "
            "mislabel the amortization point"
        )
    eng = AllegroEngine(cfg, params, system, skin=0.4)
    for chunk in chunks:
        # fresh System per Simulation: run() donates the state buffers, so
        # reusing `system` after a prior sim ran fails on deleted arrays
        sys_i = System.create(pos, np.zeros(n, np.int32), cell=cell,
                              masses=np.full(n, 63.546), dtype=jnp.float32)
        sim = Simulation(sys_i, eng.force_fn, eng.rebuild_fn,
                         dt=dt_fs * Units.fs)
        sim.init_velocities(50.0)
        sim.run(chunk, log_every=chunk)  # compile this chunk shape + warm
        t0 = time.time()
        sim.run(chunk, log_every=chunk)
        wall = time.time() - t0
        print(f"chunk={chunk:4d}: {wall / chunk * 1e3:6.2f} ms/step "
              f"({chunk / wall:6.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
