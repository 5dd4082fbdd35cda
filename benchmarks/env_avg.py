"""In-kernel K-group env averaging: B-form vs S-form shootout (PAT_ENV_AVG).

The per-center environment average inside every fused layer kernel runs as
matmuls against either B = S Sᵀ (BE, BE) — one well-shaped call — or S
padded to 128 lanes — two chained calls at half the MXU tile-ops when
BE > 256.  This times the production one-layer fused kernel
(allegro_layer_fused_t, middle-layer variant) at the bench shapes for both
modes, fwd and fwd+VJP, as dependent lax.scan chains (the relay elides
repeated identical computations — see the verify skill).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/env_avg.py
Optional PAT_L1_BE / PAT_L1_BE_BWD forwarding for block sweeps.
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

    outs = {}
    for mode in ("b", "s"):
        os.environ["PAT_ENV_AVG"] = mode

        from pair_allegro_tpu.ops.pallas_stack import allegro_layer_fused_t

        def one(v):
            return allegro_layer_fused_t(
                xt, v, yt, ut, layer, LMAX, K, AVG, parity=PARITY
            )

        @jax.jit
        def fwd_chain(v):
            def body(v, _):
                x2, v2 = one(v)
                return v2 * 0.999 + v * 1e-3, jnp.sum(x2)

            v, s = jax.lax.scan(body, v, None, length=N_ITERS)
            return jnp.sum(v) + jnp.sum(s)

        @jax.jit
        def fwdbwd_chain(v):
            def body(v, _):
                def loss(v):
                    x2, v2 = one(v)
                    return jnp.sum(x2) + 1e-3 * jnp.sum(v2)

                g = jax.grad(loss)(v)
                return v * 0.999 + g * 1e-3, jnp.sum(g)

            v, s = jax.lax.scan(body, v, None, length=N_ITERS)
            return jnp.sum(v) + jnp.sum(s)

        for name, fn in (("fwd", fwd_chain), ("fwd+vjp", fwdbwd_chain)):
            fn(Vt).block_until_ready()
            t0 = time.time()
            fn(Vt).block_until_ready()
            dt = (time.time() - t0) / N_ITERS * 1e3
            print(f"env_avg={mode} {name:8s} {dt:8.2f} ms/layer-call", flush=True)
        # parity across modes on identical inputs
        outs[mode] = jax.jit(lambda v: one(v)[0])(Vt)
    d = float(jnp.max(jnp.abs(outs["b"] - outs["s"])))
    print(f"max |x_b - x_s| = {d:.3e}")


if __name__ == "__main__":
    main()
