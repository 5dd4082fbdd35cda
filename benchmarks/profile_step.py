"""Profile the bench-config MD step on TPU and print a per-op breakdown.

Runs a compile-warmup chunk, then traces a 20-step chunk with jax.profiler
and summarizes the device trace (the perfetto ``*.trace.json.gz`` the
profiler writes): total device-op time grouped by op-name family, top ops,
and the kernel/glue split.  This is the harness behind the step-profile
tables in BASELINE.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_step.py
Optional argv[1]: trace dir (default /tmp/pat_trace_r3).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

N_STEPS = 20


def run_traced(trace_dir: str) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(11)
    n = pos.shape[0]
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    if os.environ.get("PAT_PROFILE_MODEL", "allegro") == "nequip":
        from pair_allegro_tpu.engine import NequIPEngine
        from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_init

        ncfg = NequIPConfig(
            type_names=("Cu",), r_max=4.5, l_max=1, num_layers=3,
            num_features=64, radial_mlp_depth=2, radial_mlp_width=32,
            avg_num_neighbors=12.0, parity=True,
        )
        nparams = nequip_init(jax.random.PRNGKey(0), ncfg, dtype=jnp.float32)
        eng = NequIPEngine(ncfg, nparams, system, skin=0.4)
    else:
        cfg = AllegroConfig(
            type_names=("Cu",), r_max=4.5, l_max=2, num_layers=3,
            num_scalar_features=64, num_tensor_features=32,
            avg_num_neighbors=12.0,
        )
        params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        eng = AllegroEngine(cfg, params, system, skin=0.4)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs)
    sim.init_velocities(50.0)
    sim.run(N_STEPS, log_every=N_STEPS)  # warmup compile of this chunk shape
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        sim.run(N_STEPS, log_every=N_STEPS)
    wall = time.time() - t0
    print(f"wall: {wall / N_STEPS * 1e3:.1f} ms/step over {N_STEPS} steps",
          flush=True)
    return wall


def summarize(trace_dir: str, wall_s: float) -> None:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events only (TPU op track); host threads carry
    # pid names like "/host:..."
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, nm in pid_names.items()
                if "/device:TPU" in nm and "step" not in nm.lower()}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        total += dur
    per_step = {k: v / N_STEPS for k, v in by_name.items()}
    # family grouping: strip trailing .N indices and fusion numbering
    fam = defaultdict(float)
    for k, v in per_step.items():
        f = re.sub(r"[.\d]+$", "", k)
        fam[f] += v
    print(f"\ndevice total: {total / N_STEPS:.1f} ms/step "
          f"(wall {wall_s / N_STEPS * 1e3:.1f})")
    print("\n== top op families (ms/step) ==")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:7.2f}  {k}")
    print("\n== top individual ops (ms/step) ==")
    for k, v in sorted(per_step.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v:7.2f}  {k}")
    n_small = sum(1 for v in per_step.values() if v < 0.4)
    t_small = sum(v for v in per_step.values() if v < 0.4)
    print(f"\nlong tail: {n_small} ops < 0.4 ms/step totalling "
          f"{t_small:.1f} ms/step")


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pat_trace_r3"
    wall = run_traced(trace_dir)
    summarize(trace_dir, wall)


if __name__ == "__main__":
    main()
