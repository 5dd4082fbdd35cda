"""Long-run production evidence on chip (round-4 review item #7).

10,000 NVE steps at the 5,324-atom bench config on the real TPU: records
total-energy drift (eV/atom/ns, linear fit over the thermo rows), sustained
throughput (ns/day including every rebuild/regrow/shrink), and any capacity
events — the "actually works, not just benchmarks" bar for an MD engine
(the reference's own NVE discipline:
/root/reference/tests/test_python_repro_allegro.py:105-118).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/longrun.py \
          [n_steps] (default 10000)
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.md.thermo import thermo_row
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
    # PAT_LONGRUN_ROWCHUNK: bound the per-step force working set with the
    # row-window scan (the million-atom path).  Needed because the
    # self-heating bench system regrows K 64 -> 96 within ~10k steps and
    # the full-row K=96 step's remat buffers exceed HBM (r5, BASELINE.md
    # "Long-run robustness finding") — 2 windows halve the live set at a
    # few % throughput cost, keeping the run honest end to end.
    import os

    rc = int(os.environ.get("PAT_LONGRUN_ROWCHUNK", "0")) or None
    eng = AllegroEngine(cfg, params, system, skin=0.4, row_chunk=rc)
    dt_fs = 2.0
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=dt_fs * Units.fs,
                     grow_fn=eng.grow, shrink_fn=eng.maybe_shrink)
    sim.init_velocities(50.0)
    k0 = eng.spec.max_neighbors
    # 240-step chunks (~7.7 s device each), NOT 500: single executions of
    # ~15 s crashed the TPU worker twice ("TPU worker process crashed or
    # restarted", r5 — an apparent execution watchdog on the relay); the
    # 1M-atom 7.4 s single calls run fine, so stay under ~10 s per call
    chunk = 240
    rows = []
    sim.run(chunk, log_every=chunk)  # warmup compile of the chunk shape
    t0 = time.time()
    done = chunk
    rows.append((done, sim.state))
    while done < n_steps:
        sim.run(chunk, log_every=chunk)
        done += chunk
        rows.append((done, sim.state))
    wall = time.time() - t0
    # thermo from the recorded states (etotal = pe + ke)
    steps, etot, temp = [], [], []
    for s, st in rows:
        r = thermo_row(st)
        steps.append(s)
        etot.append(float(r["etotal"]))
        temp.append(float(r["temp"]))
    steps = np.asarray(steps, float)
    etot = np.asarray(etot)
    t_ns = steps * dt_fs * 1e-6
    slope = np.polyfit(t_ns, etot, 1)[0]  # eV/ns
    drift = slope / n  # eV/atom/ns
    span = (etot.max() - etot.min()) / n
    steps_per_s = (n_steps - chunk) / wall
    ns_day = steps_per_s * dt_fs * 1e-6 * 86400
    print(f"steps: {n_steps}  atoms: {n}  dt: {dt_fs} fs  "
          f"K: {k0} -> {eng.spec.max_neighbors}")
    print(f"sustained: {steps_per_s:.2f} steps/s = {ns_day:.3f} ns/day "
          f"(incl. rebuilds/regrows; timed after 1-chunk warmup)")
    print(f"etotal drift: {drift:+.4e} eV/atom/ns (linear fit over "
          f"{len(rows)} thermo rows); peak-to-peak {span:.3e} eV/atom")
    print(f"T: {temp[0]:.0f} K -> {temp[-1]:.0f} K")
    for s, e, t in zip(steps[:: max(1, len(steps) // 10)],
                       etot[:: max(1, len(steps) // 10)],
                       temp[:: max(1, len(steps) // 10)]):
        print(f"  step {int(s):6d}  etotal {e:.6f} eV  T {t:7.1f} K")


if __name__ == "__main__":
    from pair_allegro_tpu.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    main()
