"""Marginal-cost decomposition of the one-layer fused BACKWARD kernel.

The round-3 profile puts the three bwd fused-layer kernels at 14.3 of ~32
device-ms (1.9x the forwards); the round-3 verdict asks for bwd <= 1.4x fwd.
Analytic FLOP counts have repeatedly mispredicted which kernel pieces
dominate under Mosaic's scheduling (all-MXU TP, kmm batching, env-avg form
— all measured against intuition), so before building any stored-residual
or rescheduled variant this times the production kernel with ONE piece
ablated at a time (PAT_BWD_ABLATE, wrong math, shape-preserving proxies —
see ops/pallas_stack._bwd_ablate) and reports each piece's marginal cost.

Pieces: the forward recompute (wzmm envmm tpinv latfwd) and the reverse
proper (latbwd mixbwd tpbwd envbwd tail).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bwd_ablate.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

LMAX, C, NS, K, NC, PARITY, AVG = 2, 32, 64, 64, 5324, True, 12.0
N_ITERS = 30
D = (LMAX + 1) ** 2
E = NC * K

ABLATIONS = (
    "",  # baseline
    "wzmm", "envmm", "tpinv", "latfwd",        # forward recompute
    "latbwd", "mixbwd", "tpbwd", "envbwd", "tail",  # reverse proper
    "wzmm,envmm,tpinv,latfwd",                 # whole recompute at once
)


def main():
    from pair_allegro_tpu.ops.mlp import mlp_dims, mlp_init
    from pair_allegro_tpu.ops.tp import num_paths_per_l, tp_mix_init

    rng = np.random.RandomState(0)
    xt = jnp.asarray(rng.randn(NS, E) * 0.1, jnp.float32)
    Vt = jnp.asarray(rng.randn(D, C, E) * 0.1, jnp.float32)
    yt = jnp.asarray(rng.randn(D, E) * 0.1, jnp.float32)
    ut = jnp.asarray(rng.rand(1, E), jnp.float32)
    p0 = num_paths_per_l(LMAX, LMAX, LMAX, PARITY)[0]
    layer = {
        "env_weight": jnp.asarray(rng.randn(NS, C) * 0.1, jnp.float32),
        "latent_mlp": mlp_init(
            jax.random.PRNGKey(1), mlp_dims(NS + C * p0, 64, 2, NS), jnp.float32
        ),
        "mix": tp_mix_init(
            jax.random.PRNGKey(0), LMAX, LMAX, LMAX, C, C, jnp.float32,
            parity=PARITY,
        ),
    }

    from pair_allegro_tpu.ops.pallas_stack import allegro_layer_fused_t

    def one(v):
        return allegro_layer_fused_t(
            xt, v, yt, ut, layer, LMAX, K, AVG, parity=PARITY
        )

    def fwdbwd_chain(v):
        def body(v, _):
            def loss(v):
                x2, v2 = one(v)
                return jnp.sum(x2) + 1e-3 * jnp.sum(v2)

            g = jax.grad(loss)(v)
            return v * 0.999 + g * 1e-3, jnp.sum(g)

        v, s = jax.lax.scan(body, v, None, length=N_ITERS)
        return jnp.sum(v) + jnp.sum(s)

    base = None
    for ab in ABLATIONS:
        os.environ["PAT_BWD_ABLATE"] = ab
        fn = jax.jit(fwdbwd_chain)
        fn(Vt).block_until_ready()
        t0 = time.time()
        fn(Vt).block_until_ready()
        dt = (time.time() - t0) / N_ITERS * 1e3
        if ab == "":
            base = dt
            print(f"baseline fwd+vjp  {dt:8.2f} ms/layer-call", flush=True)
        else:
            print(f"-{ab:28s} {dt:8.2f} ms  (marginal {base - dt:+6.2f})",
                  flush=True)
        jax.clear_caches()  # ablation is read at TRACE time via env
    os.environ.pop("PAT_BWD_ABLATE", None)


if __name__ == "__main__":
    main()
