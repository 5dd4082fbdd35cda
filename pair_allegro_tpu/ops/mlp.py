"""Scalar MLPs (the latent / two-body / readout networks of Allegro & NequIP).

Functional params-as-pytrees style: ``mlp_init`` builds the weight dict,
``mlp_apply`` evaluates.  No biases and variance-preserving normalized
initialization, mirroring the nequip-framework convention so imported
checkpoints drop straight into these pytrees.  All matmuls are plain ``jnp.dot``
on (batch, features) — exactly the MXU-shaped work XLA tiles best.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pair_allegro_tpu.ops.prec import matmul_precision_for


def silu_norm_const() -> float:
    """1/sqrt(E[silu(x)^2]) for x~N(0,1) — keeps activations unit-variance."""
    return 1.6790564307512243


def mlp_init(key, dims: tuple[int, ...], dtype=jnp.float32) -> dict:
    """Initialize an MLP with layer dims (in, h1, ..., out). Unit-normal
    weights; fan-in scaling is applied at run time (normalized layers)."""
    ws = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        ws.append(jax.random.normal(sub, (dims[i], dims[i + 1]), dtype=dtype))
    return {"w": ws}


def mlp_apply(params: dict, x, activation=jax.nn.silu, final_activation: bool = False):
    """Evaluate the normalized MLP. Hidden layers: act(x @ w / sqrt(fan_in)) *
    act_norm; final layer linear unless final_activation."""
    ws = params["w"]
    n = len(ws)
    act_c = silu_norm_const() if activation is jax.nn.silu else 1.0
    for i, w in enumerate(ws):
        x = jnp.dot(x, w.astype(x.dtype), precision=matmul_precision_for(x.dtype)) * (
            1.0 / math.sqrt(w.shape[0])
        )
        if i < n - 1 or final_activation:
            x = activation(x) * act_c
    return x


def mlp_apply_t(params: dict, x, activation=jax.nn.silu):
    """Feature-MAJOR twin of mlp_apply: x is (features, batch) and stays so.

    Same math; used by the transposed TPU tier where per-edge tensors keep
    edges in the trailing (lane) dimension end to end — no per-layer
    transposes."""
    ws = params["w"]
    n = len(ws)
    act_c = silu_norm_const() if activation is jax.nn.silu else 1.0
    for i, w in enumerate(ws):
        x = jnp.dot(
            w.astype(x.dtype).T, x, precision=matmul_precision_for(x.dtype)
        ) * (1.0 / math.sqrt(w.shape[0]))
        if i < n - 1:
            x = activation(x) * act_c
    return x


def mlp_dims(in_dim: int, width: int, depth: int, out_dim: int) -> tuple[int, ...]:
    """(in, width x depth, out) — depth counts hidden layers as in the
    allegro config knobs (allegro_mlp_hidden_layers_depth/width,
    /root/reference/tests/test_data/test_repro_allegro.yaml:96-99)."""
    return (in_dim, *([width] * depth), out_dim)
