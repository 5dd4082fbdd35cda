"""Force/energy-matching training: the fine-tune leg of the model pipeline.

The reference delegates training to the nequip package and consumes the
trained artifact at MD time (the compile-and-load contract,
/root/reference/pair_nequip_allegro.cpp:214-232; the test suite trains its
fixtures with ``nequip-train``, /root/reference/tests/conftest.py:131-171).
This module closes that loop TPU-natively for fine-tuning imported or
from-scratch parameter pytrees:

* Losses are differentiable w.r.t. the parameter pytree through the XLA
  model path.  Use ``AllegroConfig.for_training()`` — the fused Pallas
  kernels' custom VJPs NaN-poison weight cotangents by design (MD forces
  never need them); NequIP's path is pure XLA and already clean.
* Force matching is the mixed second derivative d/dtheta[-dE/dr]:
  ``jax.grad`` (params) through ``jax.grad`` (positions).  XLA compiles the
  whole thing into one program; ``remat`` applies per layer as in inference.
* The parameter pytree is layout-identical between the training and fused
  inference configs: train here, then hand the SAME params to the engines
  (or export via checkpoint.save / cli export).

Typical flow::

    tcfg = cfg.for_training()
    loss_fn = make_loss_fn(allegro_energy, tcfg)
    step = make_train_step(loss_fn, optax.adam(1e-3))
    opt_state = step.init(params)
    for frame in frames:                     # same padded shapes -> one jit
        params, opt_state, metrics = step.update(params, opt_state, frame)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from pair_allegro_tpu.potential import make_potential

# A training frame: the AtomicDataDict analog with targets.  Required keys:
#   positions (N, 3), types (N,), edge_index (2, E) flat or (N, K) table,
#   forces (N, 3) target, energy () target (total, same units as the model).
# Optional: cell (3, 3), edge_shifts, atom_mask (N,), edge_mask.
# Frames in one training run must share padded shapes so the update step
# compiles once (pad with pad_edges / fake atoms exactly as inference does).
Frame = dict[str, Any]


def make_loss_fn(
    energy_fn: Callable[..., dict],
    cfg,
    w_energy: float = 1.0,
    w_force: float = 1.0,
    w_virial: float = 0.0,
    per_atom_energy: bool = True,
) -> Callable[[dict, Frame], tuple[jax.Array, dict]]:
    """Build ``loss(params, frame) -> (scalar, metrics)``.

    The loss is the standard force-matching objective (the shape of the
    nequip ``EnergyForceLoss``): w_energy * MSE(energy) + w_force *
    MSE(forces), with the energy term per-atom-normalized by default so the
    two weights mean the same thing across system sizes.  Padded atoms are
    excluded via atom_mask (their forces are identically zero in both
    prediction and target, but the mask keeps the denominator honest).
    With ``w_virial > 0`` frames must carry a (3, 3) ``virial`` target and
    the strain derivative joins the objective (per-atom-normalized MSE over
    the 9 components, the nequip stress-loss analog).
    """

    def loss_fn(params, frame: Frame):
        pot = make_potential(lambda *a, **k: energy_fn(params, cfg, *a, **k))
        out = pot(
            frame["positions"],
            frame["types"],
            frame["edge_index"],
            cell=frame.get("cell"),
            edge_shifts=frame.get("edge_shifts"),
            atom_mask=frame.get("atom_mask"),
            edge_mask=frame.get("edge_mask"),
            compute_virial=w_virial > 0.0,
        )
        amask = frame.get("atom_mask")
        if amask is None:
            n = jnp.asarray(frame["positions"].shape[0], out.forces.dtype)
            f_err2 = (out.forces - frame["forces"]) ** 2
        else:
            w = amask.astype(out.forces.dtype)
            n = jnp.sum(w)
            f_err2 = ((out.forces - frame["forces"]) ** 2) * w[:, None]
        loss_f = jnp.sum(f_err2) / (3.0 * n)
        e_err = out.total_energy - frame["energy"]
        if per_atom_energy:
            e_err = e_err / n
        loss_e = e_err**2
        loss = w_energy * loss_e + w_force * loss_f
        metrics = {
            "loss": loss,
            "loss_energy": loss_e,
            "loss_force": loss_f,
            "rmse_f": jnp.sqrt(loss_f),
            "mae_e_per_atom": jnp.abs(e_err if per_atom_energy else e_err / n),
        }
        if w_virial > 0.0:
            loss_v = jnp.sum((out.virial - frame["virial"]) ** 2) / (9.0 * n**2)
            loss = loss + w_virial * loss_v
            metrics["loss"] = loss
            metrics["loss_virial"] = loss_v
        return loss, metrics

    return loss_fn


def make_batched_loss_fn(loss_fn) -> Callable[[dict, Frame], tuple[jax.Array, dict]]:
    """Lift a per-frame loss over a leading batch axis (see data.stack_frames).

    The mean over the vmapped per-frame losses IS the minibatch objective;
    when the batch axis is sharded over a device mesh (data.shard_batch) the
    gradient of this mean lowers to per-device partial grads + one psum over
    ICI — data parallelism with zero communication code.
    """

    def batched(params, batch: Frame):
        losses, metrics = jax.vmap(lambda f: loss_fn(params, f))(batch)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    return batched


@dataclasses.dataclass(frozen=True)
class TrainStep:
    """init(params) -> state; update(params, state, frame) ->
    (params, state, metrics).  ``update`` is jitted with donated
    (params, state) so the optimizer runs in place on device.  With
    ``ema_decay`` set, state additionally threads an exponential moving
    average of the params (the nequip trainer's EMA evaluation weights);
    read it with ``ema(state)`` (returns None when EMA is off)."""

    init: Callable
    update: Callable
    ema: Callable


def make_train_step(loss_fn, optimizer, ema_decay: float | None = None) -> TrainStep:
    """Wire a loss into an optax optimizer as one jitted update step."""
    import optax

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update(params, state, frame: Frame):
        opt_state, ema = state if ema_decay else (state, None)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frame
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay:
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params
            )
            return params, (opt_state, ema), metrics
        return params, opt_state, metrics

    def init(params):
        if ema_decay:
            # the EMA tree must be a COPY: update donates both params and
            # state, and aliased buffers would be donated twice
            ema0 = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
            return (optimizer.init(params), ema0)
        return optimizer.init(params)

    return TrainStep(
        init=init,
        update=update,
        ema=lambda state: state[1] if ema_decay else None,
    )
