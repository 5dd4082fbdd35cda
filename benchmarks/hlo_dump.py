"""Dump the optimized HLO of the bench-config MD chunk and attribute the
big named ops from the step profile (fusion.NNN, cond.NN, copies) back to
HLO instructions + source metadata.

The perfetto trace (benchmarks/profile_step.py) names ops like `fusion.363`
with no further context; this prints each requested op's full HLO
definition (operands, fused computation roots, op_name metadata) so the
glue attack knows what it is optimizing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hlo_dump.py \
          [op substrings...]   (default: the round-4 profile's top glue ops)
"""

from __future__ import annotations

import re
import sys

import numpy as np

N_STEPS = 20


def main(wanted):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    import os

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
        cfg = AllegroConfig(type_names=("Cu",), r_max=4.5)
        params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        eng = AllegroEngine(cfg, params, system, skin=0.4)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs)
    sim.init_velocities(50.0)
    runner = sim._chunk_runner(N_STEPS)
    lowered = runner.lower(sim.state)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"# HLO: {len(txt.splitlines())} lines", flush=True)

    # index instruction definitions by name
    defs = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = ", line)
        if m:
            defs.setdefault(m.group(1), []).append(line.strip())

    for w in wanted:
        print(f"\n===== {w} =====")
        hits = [k for k in defs if k == w or k.startswith(w)]
        for k in sorted(hits)[:4]:
            for line in defs[k]:
                print(line[:600])
        if not hits:
            print("  (not found)")

    # also: fused computation bodies for fusion ops (they reference a
    # computation %fused_computation.N) — print their root + metadata
    for w in wanted:
        if not w.startswith("fusion"):
            continue
        for line in txt.splitlines():
            if re.search(rf"%?{re.escape(w)} = ", line):
                m = re.search(r"calls=%?([\w.-]+)", line)
                if m:
                    comp = m.group(1)
                    print(f"\n----- body of {w} ({comp}) -----")
                    in_body = False
                    count = 0
                    for l2 in txt.splitlines():
                        if re.match(rf"%?{re.escape(comp)}\b", l2.strip()):
                            in_body = True
                            continue
                        if in_body:
                            if l2.strip().startswith("}"):
                                break
                            if "metadata=" in l2 or "ROOT" in l2:
                                print(l2.strip()[:500])
                                count += 1
                                if count > 25:
                                    print("  ... (truncated)")
                                    break


if __name__ == "__main__":
    args = sys.argv[1:] or [
        "fusion.363", "fusion.26", "fusion.27", "fusion.351", "fusion.357",
        "cond.53", "multiply_reduce_fusion.10", "convolution_multiply_fusion.10",
        "copy.583", "sort.3",
    ]
    main(args)
