"""Where do NequIP's 800 ms/step go?  Times force eval (fwd and fwd+grad)
at the bench config of record (l_max=1, parity, 3 layers, 64 features,
~5,324 atoms) and isolated pieces of the message path.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/nequip_profile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3  # ms


def main():
    from __graft_entry__ import _fcc_cu
    from pair_allegro_tpu.engine import NequIPEngine
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
    nb = eng.rebuild_fn(system, None)

    t_full = timeit(lambda: eng.force_fn(system, nb).forces)
    print(f"force_fn (fwd+grad+virial): {t_full:8.2f} ms")

    # energy-only forward through the same engine model fn
    import dataclasses

    sys2 = dataclasses.replace(system, positions=system.positions + 1e-7)
    t_full2 = timeit(lambda: eng.force_fn(sys2, nb).forces)
    print(f"force_fn again (cache):     {t_full2:8.2f} ms")

    # remat off comparison (OOMs with the generic message path: ~17 GB live)
    import os

    if os.environ.get("PAT_PROFILE_NOREMAT"):
        cfg_nr = dataclasses.replace(cfg, remat=False)
        eng_nr = NequIPEngine(cfg_nr, params, system, skin=0.4)
        nb_nr = eng_nr.rebuild_fn(system, None)
        t_nr = timeit(lambda: eng_nr.force_fn(system, nb_nr).forces)
        print(f"force_fn remat=False:       {t_nr:8.2f} ms")

    # MD step rate (the bench's own measurement)
    from pair_allegro_tpu.md.integrate import Simulation, Units

    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs)
    sim.init_velocities(50.0)
    sim.run(60, log_every=60)
    t0 = time.time()
    sim.run(60, log_every=60)
    wall = time.time() - t0
    print(f"MD: {wall / 60 * 1e3:.2f} ms/step ({60 / wall:.2f} steps/s, "
          f"{60 / wall * 2.0 * 86400 / 1e6:.3f} ns/day)")


if __name__ == "__main__":
    main()
