"""Training/fine-tune path: weight gradients through the XLA model path.

The reference's training leg lives in the nequip package (its fixtures are
built by ``nequip-train``, /root/reference/tests/conftest.py:131-171); the
plugin itself is inference-only.  This repo ships the fine-tune loop
natively (pair_allegro_tpu.train) — these tests pin that the parameter
gradients it depends on are exact:

* d(loss)/d(params) through forces (a mixed second derivative) matches
  central finite differences in f64 — for Allegro (for_training config)
  and NequIP (already XLA-clean).
* The optimization actually descends: a short adam run recovers a
  perturbed parameter set's force field (loss drops >10x).
* for_training() <-> fused config params are interchangeable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pair_allegro_tpu.data import load_frames, shard_batch, stack_frames
from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init
from pair_allegro_tpu.models.nequip import NequIPConfig, nequip_energy, nequip_init
from pair_allegro_tpu.neighbors.naive import neighbor_list_np, pad_edges
from pair_allegro_tpu.train import make_batched_loss_fn, make_loss_fn, make_train_step

REF_DATA = "/root/reference/tests/test_data"

CFG = AllegroConfig(
    type_names=("Cu", "Ag"),
    r_max=3.5,
    l_max=1,
    num_layers=2,
    num_scalar_features=8,
    num_tensor_features=4,
    two_body_mlp_width=8,
    allegro_mlp_hidden_layers_width=8,
    readout_mlp_hidden_layers_width=8,
    avg_num_neighbors=10.0,
    remat=False,
)

NCFG = NequIPConfig(
    type_names=("Cu", "Ag"),
    r_max=3.5,
    l_max=1,
    num_layers=2,
    num_features=4,
    radial_mlp_width=8,
    readout_mlp_width=8,
    avg_num_neighbors=10.0,
    remat=False,
)


def _crystal(rng, n_rep=2, a=3.61, jitter=0.08):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    pos = np.concatenate(
        [
            base + np.array([i, j, k]) * a
            for i in range(n_rep)
            for j in range(n_rep)
            for k in range(n_rep)
        ]
    )
    pos += rng.randn(*pos.shape) * jitter
    cell = np.eye(3) * a * n_rep
    types = rng.randint(0, 2, size=len(pos)).astype(np.int32)
    return pos, cell, types


def _frame(rng, params, cfg, energy_fn, dtype=jnp.float64):
    """Build a padded frame whose targets come from `params` itself (a
    teacher-student setup: targets are exactly representable)."""
    pos, cell, types = _crystal(rng)
    edge_index, shifts = neighbor_list_np(pos, cell, (True,) * 3, cfg.r_max)
    edge_index, shifts, edge_mask = pad_edges(
        edge_index, shifts, edge_index.shape[1] + 13
    )
    frame = {
        "positions": jnp.asarray(pos, dtype),
        "types": jnp.asarray(types),
        "edge_index": jnp.asarray(edge_index),
        "cell": jnp.asarray(cell, dtype),
        "edge_shifts": jnp.asarray(shifts, dtype),
        "edge_mask": jnp.asarray(edge_mask),
    }
    from pair_allegro_tpu.potential import make_potential

    pot = make_potential(lambda *a, **k: energy_fn(params, cfg, *a, **k))
    out = pot(
        frame["positions"],
        frame["types"],
        frame["edge_index"],
        cell=frame["cell"],
        edge_shifts=frame["edge_shifts"],
        edge_mask=frame["edge_mask"],
        compute_virial=False,
    )
    frame["forces"] = out.forces
    frame["energy"] = out.total_energy
    return frame


def _fd_check(loss0, params, frame, leaf_path, idx, eps=1e-5):
    """Central finite difference of one scalar weight vs the autodiff grad."""
    grad = jax.grad(lambda p: loss0(p, frame)[0])(params)

    def get(tree):
        node = tree
        for k in leaf_path:
            node = node[k]
        return node

    def set_(tree, val):
        # rebuild the nested dict/list path with one element replaced
        def rec(node, path):
            k = path[0]
            if len(path) == 1:
                new = node[k].at[idx].set(val)
            else:
                new = rec(node[k], path[1:])
            if isinstance(node, dict):
                out = dict(node)
                out[k] = new
                return out
            out = list(node)
            out[k] = new
            return out

        return rec(tree, leaf_path)

    w0 = float(get(params)[idx])
    lp = float(loss0(set_(params, w0 + eps), frame)[0])
    lm = float(loss0(set_(params, w0 - eps), frame)[0])
    fd = (lp - lm) / (2 * eps)
    ad = float(get(grad)[idx])
    assert np.isfinite(ad)
    assert abs(ad - fd) <= 1e-6 * max(1.0, abs(fd)), (ad, fd, leaf_path)
    return grad


class TestWeightGradients:
    def test_allegro_grads_match_fd(self):
        rng = np.random.RandomState(0)
        params = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float64)
        tcfg = CFG.for_training()
        assert not tcfg.fused_tp and not tcfg.fused_stack
        frame = _frame(rng, params, tcfg, allegro_energy)
        # teacher==student would give zero grads; perturb the student
        student = jax.tree.map(
            lambda x: x + 0.01 * jnp.sin(jnp.arange(x.size).reshape(x.shape)),
            params,
        )
        loss = make_loss_fn(allegro_energy, tcfg)
        grad = _fd_check(loss, student, frame, ("tensor_embed",), (0, 0))
        _fd_check(loss, student, frame, ("per_type_scale",), (1,))
        _fd_check(loss, student, frame, ("readout_mlp", "w", 0), (2, 0))
        # every leaf's gradient is finite (no NaN-poison on the XLA path)
        assert all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grad)
        )

    def test_nequip_grads_match_fd(self):
        rng = np.random.RandomState(1)
        params = nequip_init(jax.random.PRNGKey(0), NCFG, dtype=jnp.float64)
        tcfg = NCFG.for_training()
        assert not tcfg.fused_conv  # weight grads route around the kernel
        frame = _frame(rng, params, tcfg, nequip_energy)
        student = jax.tree.map(
            lambda x: x + 0.01 * jnp.cos(jnp.arange(x.size).reshape(x.shape)),
            params,
        )
        loss = make_loss_fn(nequip_energy, tcfg)
        grad = _fd_check(loss, student, frame, ("per_type_scale",), (0,))
        assert all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grad)
        )


class TestFineTune:
    def test_adam_recovers_perturbed_forces(self):
        """Teacher-student force matching: a short adam run must cut the
        loss by >10x (descent through the mixed d/dtheta d/dr derivative)."""
        rng = np.random.RandomState(2)
        teacher = allegro_init(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        tcfg = CFG.for_training()
        frame = _frame(rng, teacher, tcfg, allegro_energy, dtype=jnp.float32)
        student = jax.tree.map(
            lambda x: x * (1.0 + 0.05 * jnp.sin(jnp.arange(x.size).reshape(x.shape))),
            teacher,
        )
        loss_fn = make_loss_fn(allegro_energy, tcfg)
        step = make_train_step(loss_fn, optax.adam(3e-3))
        opt_state = step.init(student)
        l0 = float(loss_fn(student, frame)[0])
        params = student
        losses = []
        for _ in range(60):
            params, opt_state, metrics = step.update(params, opt_state, frame)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < l0 / 10.0, (l0, losses[-1])
        # trained params drop into the fused inference config unchanged
        # (same pytree); off-TPU both configs lower to the same XLA math,
        # so this is a pure wiring check
        out = make_loss_fn(allegro_energy, CFG)(params, frame)[0]
        assert np.isfinite(float(out))


class TestDataset:
    """The extxyz training loader against the reference's OWN data files
    (read at runtime, the same files its conftest trains from)."""

    def test_load_multiframe_periodic(self):
        frames = load_frames(
            f"{REF_DATA}/CuPd-cubic-big.xyz", ("Cu", "Pd"), r_max=3.0
        )
        assert len(frames) == 15
        shapes = {k: frames[0][k].shape for k in frames[0]}
        for f in frames[1:]:
            assert {k: f[k].shape for k in f} == shapes  # ONE jit shape
        f0 = frames[0]
        assert int(jnp.sum(f0["atom_mask"])) == 256 == int(f0["n_atoms"])
        # targets survive the load: energies differ per frame, forces real
        es = {float(f["energy"]) for f in frames}
        assert len(es) == 15
        assert float(jnp.max(jnp.abs(f0["forces"]))) > 0.1
        # edge list is the bidirectional (full) convention: count is even
        # and every masked-in edge has a reverse partner
        ei = np.asarray(f0["edge_index"])[:, np.asarray(f0["edge_mask"])]
        fwd = set(map(tuple, ei.T))
        assert all((j, i) in fwd for i, j in fwd)

    def test_load_open_boundaries(self):
        frames = load_frames(f"{REF_DATA}/aspirin.xyz", ("C", "O", "H"), r_max=3.0)
        assert len(frames) == 15
        assert frames[0]["cell"] is None
        assert int(frames[0]["n_atoms"]) == 21

    def test_unknown_species_hard_errors(self):
        with pytest.raises(KeyError, match="Pd"):
            load_frames(f"{REF_DATA}/CuPd-cubic-big.xyz", ("Cu",), r_max=3.0)

    def test_batched_loss_equals_mean_of_per_frame(self):
        cfg = dataclasses.replace(CFG, type_names=("Cu", "Pd"), r_max=3.0)
        tcfg = cfg.for_training()
        params = allegro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
        frames = load_frames(
            f"{REF_DATA}/CuPd-cubic-big.xyz", ("Cu", "Pd"), r_max=3.0,
            dtype=jnp.float64,
        )[:4]
        loss = make_loss_fn(allegro_energy, tcfg)
        batched = make_batched_loss_fn(loss)
        per = np.mean([float(loss(params, f)[0]) for f in frames])
        bat = float(batched(params, stack_frames(frames))[0])
        np.testing.assert_allclose(bat, per, rtol=1e-12)

    def test_data_parallel_grads_match_single_device(self):
        """The DP recipe (batch sharded over the 8-device mesh, params
        replicated) must produce the same gradients as unsharded eval —
        XLA's inserted psum IS the gradient all-reduce."""
        from pair_allegro_tpu.parallel import make_mesh

        cfg = dataclasses.replace(CFG, type_names=("Cu", "Pd"), r_max=3.0)
        tcfg = cfg.for_training()
        params = allegro_init(jax.random.PRNGKey(1), cfg, dtype=jnp.float64)
        frames = load_frames(
            f"{REF_DATA}/CuPd-cubic-big.xyz", ("Cu", "Pd"), r_max=3.0,
            dtype=jnp.float64,
        )[:8]
        batch = stack_frames(frames)
        grad_fn = jax.jit(
            jax.grad(
                lambda p, b: make_batched_loss_fn(
                    make_loss_fn(allegro_energy, tcfg)
                )(p, b)[0]
            )
        )
        g_ref = grad_fn(params, batch)
        mesh = make_mesh(8, axis_name="dp")
        g_dp = grad_fn(params, shard_batch(batch, mesh, "dp"))
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_virial_loss_descends(self):
        """w_virial wires the strain derivative into the objective: the
        gradient w.r.t. params is finite and a virial-only loss decreases
        under adam (teacher-student on the reference's CuPd data shapes)."""
        cfg = dataclasses.replace(CFG, type_names=("Cu", "Pd"), r_max=3.0)
        tcfg = cfg.for_training()
        teacher = allegro_init(jax.random.PRNGKey(2), cfg, dtype=jnp.float64)
        frames = load_frames(
            f"{REF_DATA}/CuPd-cubic-big.xyz", ("Cu", "Pd"), r_max=3.0,
            dtype=jnp.float64,
        )[:2]
        # stamp teacher targets incl. virial
        from pair_allegro_tpu.potential import make_potential

        pot = make_potential(lambda *a, **k: allegro_energy(teacher, tcfg, *a, **k))
        for f in frames:
            out = pot(
                f["positions"], f["types"], f["edge_index"], cell=f["cell"],
                edge_shifts=f["edge_shifts"], atom_mask=f["atom_mask"],
                edge_mask=f["edge_mask"],
            )
            f["forces"], f["energy"], f["virial"] = (
                out.forces, out.total_energy, out.virial,
            )
        student = jax.tree.map(
            lambda x: x * (1 + 0.03 * jnp.sin(jnp.arange(x.size).reshape(x.shape))),
            teacher,
        )
        loss_fn = make_loss_fn(allegro_energy, tcfg, w_virial=1.0)
        l0, m0 = loss_fn(student, frames[0])
        assert "loss_virial" in m0 and np.isfinite(float(m0["loss_virial"]))
        step = make_train_step(
            make_batched_loss_fn(loss_fn), optax.adam(1e-3)
        )
        batch = stack_frames(frames)
        opt_state = step.init(student)
        params = student
        for _ in range(25):
            params, opt_state, m = step.update(params, opt_state, batch)
        assert float(m["loss"]) < float(l0) / 3.0, (float(l0), float(m["loss"]))
