"""Fine-tune an Allegro parameter pytree on force/energy targets, then run MD.

The reference's workflow splits this across two packages: nequip trains
(`nequip-train`, /root/reference/tests/conftest.py:131-171), pair_allegro
runs MD on the compiled artifact.  Here both legs are native:

    python examples/finetune.py            # CPU ok; TPU just faster

Demonstrates the teacher-student loop: targets come from a "teacher"
parameter set (stand-in for DFT data), a perturbed "student" is fine-tuned
with adam through the mixed d/dtheta[-dE/dr] derivative, and the trained
params drop unchanged into the fused-kernel MD engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
from pair_allegro_tpu.neighbors.naive import neighbor_list_np, pad_edges
from pair_allegro_tpu.potential import make_potential
from pair_allegro_tpu.train import make_loss_fn, make_train_step


def fcc(n_rep=3, a=3.61, jitter=0.06, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    pos = np.concatenate(
        [
            base + np.array([i, j, k]) * a
            for i in range(n_rep)
            for j in range(n_rep)
            for k in range(n_rep)
        ]
    )
    return pos + rng.randn(*pos.shape) * jitter, np.eye(3) * a * n_rep


def main():
    cfg = AllegroConfig(
        type_names=("Cu",), r_max=4.0, l_max=1, num_layers=2,
        num_scalar_features=16, num_tensor_features=8,
        avg_num_neighbors=12.0, remat=False,
    )
    tcfg = cfg.for_training()  # XLA path: exact weight cotangents

    # --- build frames (stand-in for a DFT dataset) --------------------------
    teacher = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pot = make_potential(lambda *a, **k: allegro_energy(teacher, tcfg, *a, **k))
    frames = []
    e_cap = None
    for seed in range(4):
        pos, cell = fcc(seed=seed)
        ei, sh = neighbor_list_np(pos, cell, (True,) * 3, cfg.r_max)
        if e_cap is None:  # one padded shape -> the update step jits once
            e_cap = ei.shape[1] + 256
        ei, sh, em = pad_edges(ei, sh, e_cap)
        f = {
            "positions": jnp.asarray(pos, jnp.float32),
            "types": jnp.zeros(len(pos), jnp.int32),
            "edge_index": jnp.asarray(ei),
            "cell": jnp.asarray(cell, jnp.float32),
            "edge_shifts": jnp.asarray(sh, jnp.float32),
            "edge_mask": jnp.asarray(em),
        }
        out = pot(f["positions"], f["types"], f["edge_index"], cell=f["cell"],
                  edge_shifts=f["edge_shifts"], edge_mask=f["edge_mask"],
                  compute_virial=False)
        f["forces"], f["energy"] = out.forces, out.total_energy
        frames.append(f)

    # --- fine-tune a perturbed student --------------------------------------
    student = jax.tree.map(
        lambda x: x * (1 + 0.05 * jnp.sin(jnp.arange(x.size).reshape(x.shape))),
        teacher,
    )
    loss_fn = make_loss_fn(allegro_energy, tcfg)
    step = make_train_step(loss_fn, optax.adam(3e-3))
    opt_state = step.init(student)
    params = student
    for epoch in range(30):
        for f in frames:
            params, opt_state, m = step.update(params, opt_state, f)
        if epoch % 5 == 0 or epoch == 29:
            print(f"epoch {epoch:3d}  loss {float(m['loss']):.3e}  "
                  f"rmse_F {float(m['rmse_f']):.3e} eV/A")

    # --- the trained params drop into the fused MD engine -------------------
    from pair_allegro_tpu.engine import AllegroEngine
    from pair_allegro_tpu.md.integrate import Simulation, Units
    from pair_allegro_tpu.system import System

    pos, cell = fcc(seed=99)
    system = System.create(pos, np.zeros(len(pos), np.int32), cell=cell,
                           masses=np.full(len(pos), 63.546), dtype=jnp.float32)
    eng = AllegroEngine(cfg, params, system, skin=0.4)
    sim = Simulation(system, eng.force_fn, eng.rebuild_fn, dt=2.0 * Units.fs)
    sim.init_velocities(100.0)
    rows = sim.run(20, log_every=10)
    for r in rows:
        print(f"step {int(r['step']):4d}  PE {float(r['pe']):+.4f} eV  "
              f"T {float(r['temp']):6.1f} K")


if __name__ == "__main__":
    main()
