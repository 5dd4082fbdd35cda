"""Million-atom Allegro force evaluation — single chip or sharded mesh.

The BASELINE.md scale-out target is a 1M-atom slab; strict locality +
center-row chunking (engine row_chunk) bounds per-edge memory to one chunk,
so a single chip handles it, and the mesh-sharded engine divides the same
row windows across chips (ShardedAllegroEngine(row_chunk=...)) — per-chip
time scales ~1/n_devices since compute is per-center and positions are
replicated.  Run:
  PYTHONPATH=. python examples/million_atom.py [n_rep]            # 1 chip
  PAT_MA_SHARDS=8 python examples/million_atom.py 16              # mesh
(with PAT_MA_SHARDS > physical devices, set JAX_PLATFORMS=cpu +
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a virtual mesh.)
"""

import sys
import time

import numpy as np


def main(n_rep: int = 63, steps: int = 2) -> None:
    import jax
    import jax.numpy as jnp

    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_init
    from pair_allegro_tpu.system import System

    a0 = 3.61
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a0
    t0 = time.time()
    grid = np.stack(
        np.meshgrid(np.arange(n_rep), np.arange(n_rep), np.arange(n_rep), indexing="ij"),
        axis=-1,
    ).reshape(-1, 1, 3)
    pos = (grid * a0 + base).reshape(-1, 3)
    rng = np.random.RandomState(0)
    pos += 0.03 * rng.randn(*pos.shape)
    n = pos.shape[0]
    cell = np.eye(3) * a0 * n_rep
    print(f"{n} atoms, built in {time.time()-t0:.1f}s", flush=True)

    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.5, l_max=2, num_layers=3,
        num_scalar_features=64, num_tensor_features=32, avg_num_neighbors=12.0,
    )
    params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    system = System.create(pos, np.zeros(n, np.int32), cell=cell,
                           masses=np.full(n, 63.546), dtype=jnp.float32)
    import os

    n_shards = int(os.environ.get("PAT_MA_SHARDS", "0"))
    if n_shards:
        from pair_allegro_tpu.parallel import ShardedAllegroEngine, make_mesh

        mesh = make_mesh(n_shards)
        system, _ = ShardedAllegroEngine.prepare_system(system, n_shards)
        n_local = system.n_atoms // n_shards
        rc = next(c for c in range(min(7900, n_local), 0, -1) if n_local % c == 0)
        t0 = time.time()
        eng = ShardedAllegroEngine(cfg, params, system, mesh,
                                   skin=0.4, compute_virial=False, row_chunk=rc)
        print(f"sharded engine ({n_shards} shards, row_chunk={rc}, "
              f"K={eng.spec.max_neighbors}) in {time.time()-t0:.1f}s", flush=True)
    else:
        # pick a row chunk ~8k dividing n
        rc = next(c for c in range(7900, 16001) if n % c == 0)
        t0 = time.time()
        eng = AllegroEngine(cfg, params, system, skin=0.4, compute_virial=False,
                            row_chunk=rc)
        print(f"engine (row_chunk={rc}, K={eng.spec.max_neighbors}) in {time.time()-t0:.1f}s",
              flush=True)

    t0 = time.time()
    nb = eng.rebuild_fn(system, None)
    jax.block_until_ready(nb.edge_index)
    print(f"neighbor build: {time.time()-t0:.1f}s, edges={int(np.asarray(nb.count()))}, "
          f"overflow={bool(np.asarray(nb.overflow))}", flush=True)

    t0 = time.time()
    out = eng.force_fn(system, nb)
    jax.block_until_ready(out.forces)
    print(f"first force (compile+run): {time.time()-t0:.1f}s, "
          f"E={float(out.total_energy):.3f} eV", flush=True)
    t0 = time.time()
    out = eng.force_fn(system, nb)
    f = np.asarray(out.forces)
    dt = time.time() - t0
    print(f"steady force: {dt:.1f}s/eval, max|F|={np.abs(f).max():.3f} eV/A", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
