"""Trace-decompose the 1M-atom row-chunk force call (round-5 review item #2c).

The 5,324-atom bench runs ~27 device-ms per fwd+VJP force eval; per-edge
parity predicts 189 windows x ~27 ms ~= 5.1 s at 1M atoms, but the measured
number is 9.79 s.  This traces ONE force eval at the scale config and
summarizes device time by op family, separating (a) the fused kernels,
(b) the scan-carry force accumulation (dense (N,3) cotangent adds per
window were the prime suspect), (c) gathers, (d) everything else.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_scale.py \
          [n_rep] [trace_dir]
n_rep default 63 (1,000,188 atoms); use 31 (119,164) for a faster probe
with the same per-window shape (row_chunk then 5218? -- pass a divisor).
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pat_trace_scale"
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(n_rep, jitter=0.03)
    n = pos.shape[0]
    # row_chunk: same divisor logic as bench.scale_line (63 -> 189 windows)
    row_chunk = int(os.environ.get("PAT_ROW_CHUNK", "0"))
    if not row_chunk:
        for w in (5292, 5324, 4096, 2048):
            if n % w == 0:
                row_chunk = w
                break
        else:
            for w in range(5400, 256, -4):
                if n % w == 0:
                    row_chunk = w
                    break
    print(f"{n} atoms, row_chunk={row_chunk} ({n // row_chunk} windows)",
          flush=True)
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=2, num_layers=3,
        num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    eng = AllegroEngine(cfg, params, system, row_chunk=row_chunk)
    nb = eng.rebuild_fn(system, None)
    out = eng.force_fn(system, nb)
    jax.block_until_ready(out.forces)  # compile + first eval
    sys2 = dataclasses.replace(system, positions=system.positions + 1e-6)
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        out = eng.force_fn(sys2, nb)
        jax.block_until_ready(out.forces)
    wall = time.time() - t0
    print(f"wall: {wall:.2f} s/force", flush=True)
    summarize(trace_dir, wall)


def summarize(trace_dir: str, wall_s: float) -> None:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
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
        dur = e.get("dur", 0) / 1e3
        by_name[name] += dur
        total += dur
    fam = defaultdict(float)
    for k, v in by_name.items():
        fam[re.sub(r"[.\d]+$", "", k)] += v
    print(f"\ndevice total: {total / 1e3:.2f} s (wall {wall_s:.2f})")
    print("\n== op families (ms total) ==")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:9.1f}  {k}")
    print("\n== top individual ops (ms total) ==")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v:9.1f}  {k}")


if __name__ == "__main__":
    from pair_allegro_tpu.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()
    main()
