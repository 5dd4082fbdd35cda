"""Headline benchmark: ns/day on a ~5k-atom Allegro NVE run, one TPU chip.

The reference publishes no quantitative numbers (BASELINE.md); the recorded
north star is >=10x a LAMMPS-CPU reference on a 5k-atom Allegro NVE system.
`vs_baseline` is reported against 1.0 ns/day — the north-star target itself
(10x an assumed ~0.1 ns/day LAMMPS-CPU single-node figure for an Allegro-class
model at this size; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


# Validation ladder: (tier name, env overrides, cfg overrides).  Each tier is
# a configuration that was (or is about to be) validated on-chip; the bench
# times the FIRST tier whose forces+charges match the pure-XLA reference, so
# a Mosaic regression in a newer kernel path degrades the recorded number
# instead of failing the round artifact (and the tier name in the JSON says
# exactly what ran).
TIERS = (
    ("kernel", {}, {}),                       # positional fused-layer kernels
    ("kernel-nopos", {"PAT_L1_POSITIONAL": "0"}, {}),  # V0 materialized
    ("kernel-perlayer", {}, {"layer_fused": False}),   # env-fused per-layer
    ("xla", {}, {"fused_tp": False, "layer_fused": False}),
)


def parity_precheck() -> str:
    """Kernel-vs-XLA force+charge parity at a small flagship-dims config,
    asserted BEFORE timing; returns the first tier of TIERS that passes (a
    Mosaic miscompile class that interpret-mode CPU tests cannot see — the
    scoreboard must never time garbage).  Skip with PAT_BENCH_PARITY=0.
    On CPU every tier is the same XLA program, so this is trivially 'kernel'
    and cheap."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(5)  # 500 atoms, flagship model dims
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=2, num_layers=3,
        num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=12.0,
        output_charges=True,  # gates the feature-major charge-head glue too
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)

    def run(env, cfg_over):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            eng = AllegroEngine(
                dataclasses.replace(cfg, **cfg_over), params, system
            )
            nb = eng.rebuild_fn(system, None)
            o = eng.force_fn(system, nb)
            return np.asarray(o.forces), np.asarray(o.extras["charges"])
        finally:
            for k, v in old.items():
                os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)

    ref = run(*TIERS[-1][1:])  # pure-XLA reference
    for name, env, cfg_over in TIERS[:-1]:
        got = run(env, cfg_over)
        # measured 6.4e-6 eV/A (f32 reordering noise); 5e-4 = the
        # reference's own f32 parity tier (tests/conftest.py:113)
        errs = [float(np.max(np.abs(g - r))) for g, r in zip(got, ref)]
        if all(e < 5e-4 for e in errs):
            return name
        print(f"# parity FAILED at tier {name!r}: max|dF|={errs[0]:.3e} "
              f"max|dq|={errs[1]:.3e} — falling back")
    return "xla"


def main(tier: str = "kernel") -> None:
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    env, cfg_over = next((e, c) for t, e, c in TIERS if t == tier)
    os.environ.update(env)

    # ~5k atoms: FCC Cu 11^3 cells x 4 = 5324
    pos, cell = _fcc_cu(11)
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",),
        r_max=4.5,
        l_max=2,
        num_layers=3,
        num_scalar_features=64,
        num_tensor_features=32,
        avg_num_neighbors=12.0,
        **cfg_over,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(
        pos, np.zeros(n, np.int32), cell=cell, masses=np.full(n, 63.546), dtype=jnp.float32
    )
    # accurate tier (kernel_high default: XLA matmuls exact-f32, in-kernel
    # dots bf16x3, env averaging split2) — max |dF| vs the f64 oracle
    # measured 1.5e-5 eV/A (rms 4.2e-6, benchmarks/accuracy.py), ~7x inside
    # the 1e-4 target
    eng = AllegroEngine(cfg, params, system, skin=0.4)
    dt_fs = 2.0
    # grow_fn: production wiring (cli.py does the same) — the bench model has
    # RANDOM weights, its PES self-heats to ~5000 K and per-row neighbor
    # counts rise past the initial K within a few hundred steps; a capacity
    # overflow then regrows-and-retries instead of erroring.  The warmup
    # chunks absorb the regrow recompiles; if one still fires inside the
    # timed chunk the number degrades honestly rather than crashing.
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=dt_fs * Units.fs,
                     grow_fn=eng.grow)
    sim.init_velocities(50.0)

    # Timing protocol: 60-step chunks, one warmup + one timed — the r1-r4
    # protocol, kept for longitudinal comparability.  The r5 chunk sweep
    # (benchmarks/chunk_amortize.py, dt≈0 so capacity is fixed) measured the
    # per-chunk dispatch at ~0.9 ms/step (3%) — recoverable with longer
    # thermo cadence in production — but 240-step chunks here also advance
    # this SYNTHETIC trajectory into its hot regime (the random-weight PES
    # self-heats to ~5000 K; per-row neighbor counts then overflow K=64 and
    # the capacity regrows to 96+), which measures a different system than
    # rounds 1-4 did.  benchmarks/longrun.py reports the honest steady-state
    # sustained number.
    n_steps = 60
    sim.run(n_steps, log_every=n_steps)  # warmup: compiles the same chunk shape
    t0 = time.time()
    sim.run(n_steps, log_every=n_steps)
    wall = time.time() - t0

    steps_per_s = n_steps / wall
    ns_per_day = steps_per_s * dt_fs * 1e-6 * 86400.0
    baseline_ns_day = 1.0
    print(
        json.dumps(
            {
                "metric": f"ns/day, {n}-atom Allegro (l_max=2, 3 layers) NVE, 2 fs",
                "value": round(ns_per_day, 3),
                "unit": "ns/day",
                "vs_baseline": round(ns_per_day / baseline_ns_day, 3),
                "steps_per_s": round(steps_per_s, 2),
                "tier": tier,
                "device": str(jax.devices()[0]),
            }
        )
    )


def scale_line() -> None:
    """Second scoreboard line (PAT_BENCH_SCALE=1): the 1M-atom single-chip
    s/force via row-chunking — the scale-out regression canary (BASELINE.md
    scale-out target; the 8-virtual-shard exactness legs live in
    tests/test_sharded.py and tests/test_halo.py and run with the suite)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    n_rep = 63  # 63^3 * 4 = 1,000,188 atoms
    pos, cell = _fcc_cu(n_rep, jitter=0.03)
    n = pos.shape[0]
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=2, num_layers=3,
        num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    eng = AllegroEngine(cfg, params, system, row_chunk=5292)  # 1,000,188 = 189*5292
    nb = eng.rebuild_fn(system, None)
    out = eng.force_fn(system, nb)
    jax.block_until_ready(out.forces)  # compile + first eval
    import dataclasses

    sys2 = dataclasses.replace(system, positions=system.positions + 1e-6)
    t0 = time.time()
    out = eng.force_fn(sys2, nb)
    jax.block_until_ready(out.forces)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "metric": f"s/force, {n}-atom Allegro single chip (row_chunk)",
                "value": round(dt, 2),
                "unit": "s",
                "vs_baseline": round(29.8 / dt, 3),  # r2: 29.8 s/force
                "device": str(jax.devices()[0]),
            }
        )
    )


def nequip_line() -> None:
    """Third scoreboard line (PAT_BENCH_NEQUIP=1): ns/day for the NequIP
    config of record (l_max=1, parity, 3 MP layers, 64 features, radial MLP
    2x32 — /root/reference/tests/test_data/test_repro_nequip.yaml:83-100) on
    the same ~5k-atom FCC Cu NVE system as the headline — the ``pair_style
    nequip`` performance story the round-3 review flagged as missing."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import NequIPEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_init
    from pair_allegro_tpu.system import System

    pos, cell = _fcc_cu(11)
    n = pos.shape[0]
    cfg = NequIPConfig(
        type_names=("Cu",), r_max=4.5, l_max=1, num_layers=3,
        num_features=64, radial_mlp_depth=2, radial_mlp_width=32,
        avg_num_neighbors=12.0, parity=True,
    )
    params = nequip_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    eng = NequIPEngine(cfg, params, system, skin=0.4)
    dt_fs = 2.0
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=dt_fs * Units.fs)
    sim.init_velocities(50.0)
    n_steps = 60
    sim.run(n_steps, log_every=n_steps)  # warmup compile of the chunk shape
    t0 = time.time()
    sim.run(n_steps, log_every=n_steps)
    wall = time.time() - t0
    steps_per_s = n_steps / wall
    print(
        json.dumps(
            {
                "metric": f"ns/day, {n}-atom NequIP (l_max=1, parity, 3 layers) NVE, 2 fs",
                "value": round(steps_per_s * dt_fs * 1e-6 * 86400.0, 3),
                "unit": "ns/day",
                "vs_baseline": round(steps_per_s * dt_fs * 1e-6 * 86400.0, 3),
                "steps_per_s": round(steps_per_s, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    import os

    from pair_allegro_tpu.compile_cache import maybe_enable_from_env

    maybe_enable_from_env()  # PAT_COMPILE_CACHE (AOT-artifact analog)
    tier = "kernel"
    if os.environ.get("PAT_BENCH_PARITY", "1") != "0":
        tier = parity_precheck()
    main(tier)
    if os.environ.get("PAT_BENCH_SCALE"):
        scale_line()
    if os.environ.get("PAT_BENCH_NEQUIP"):
        nequip_line()
