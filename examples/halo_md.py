"""Halo-sharded MD — spatial domain decomposition over a device mesh.

Positions live sharded as z-slabs; each step, boundary-slab positions
within cutoff+skin are pushed to mesh neighbors by `ppermute` (LAMMPS
forward ghost comm), edges are built against local+halo atoms only, and
halo forces flow back through the autodiff transpose of the same
`ppermute` (reverse ghost-force comm, newton-on semantics —
/root/reference/pair_nequip_allegro.cpp:368-377).  Per-chip arrays are
O(N/n_devices + halo): this is the mode that weak-scales, unlike the
replicated small-N fast path (examples/million_atom.py).

Slabs must be thicker than cutoff+skin (the engine rejects thinner
decompositions), so the box needs >= n_devices*(r_max+skin) along z.
Run on real chips, or on a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/halo_md.py [n_rep=10] [steps=30]
"""

import sys
import time

import numpy as np


def main(n_rep: int = 10, steps: int = 30) -> None:
    import jax
    import jax.numpy as jnp

    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.parallel import HaloShardedAllegroEngine, make_mesh
    from pair_allegro_tpu.system import System

    n_dev = len(jax.devices())
    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    grid = np.stack(
        np.meshgrid(np.arange(n_rep), np.arange(n_rep), np.arange(n_rep), indexing="ij"),
        axis=-1,
    ).reshape(-1, 1, 3)
    pos = (grid * a0 + base).reshape(-1, 3)
    pos += 0.02 * np.random.RandomState(0).randn(*pos.shape)
    n = pos.shape[0]
    cell = np.eye(3) * a0 * n_rep

    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.0, l_max=2, num_layers=2,
        num_scalar_features=32, num_tensor_features=16, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    mesh = make_mesh(n_dev)
    # z-sort atoms into slabs; per-chip shapes fixed after this
    system, _ = HaloShardedAllegroEngine.prepare_system(system, n_dev)
    eng = HaloShardedAllegroEngine(cfg, params, system, mesh, skin=0.4)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs,
                     grow_fn=eng.grow, migrate_fn=eng.maybe_migrate)
    sim.init_velocities(50.0)

    print(f"{n} atoms over {n_dev} z-slabs ({a0 * n_rep / n_dev:.2f} A/slab)")
    t0 = time.time()
    rows = sim.run(steps, log_every=max(1, steps // 3))
    for r in rows:
        print({k: float(v) for k, v in r.items() if k in ("step", "temp", "pe", "etotal")})
    print(f"{steps} steps in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
