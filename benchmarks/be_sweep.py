"""Block-lane (BE) sweep for the one-layer fused kernel, fwd and bwd.

The kernel's default block geometry (ops/pallas_stack._env_block_geometry)
prefers the largest 128-aligned BE <= the VMEM cap whose m = BE/K divides
n_centers.  At the bench shapes (NC=5324, K=64) the divisor structure of
5324 = 2^2 * 11^3 only admits BE in {128, 256}; padding centers to 5376
(2^8 * 3 * 7) unlocks {128, 256, 384, 512}.  This sweeps PAT_L1_BE /
PAT_L1_BE_BWD over the legal grid at both center counts to answer two
questions the round-3 notes left open:

1. is the bwd kernel (the 14.3 of ~32 device-ms) scheduled better at a
   different block size than the fwd's default?
2. is it worth ROUNDING UP n_centers in the engine to unlock larger BE?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/be_sweep.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

LMAX, C, NS, K, PARITY, AVG = 2, 32, 64, 64, True, 12.0
N_ITERS = 30
D = (LMAX + 1) ** 2


def legal_bes(nc: int, cap: int = 512):
    out = []
    for m in range(1, cap // K + 1):
        be = K * m
        if be % 128 == 0 and (nc * K) % be == 0:
            out.append(be)
    return out


def main():
    from pair_allegro_tpu.ops.mlp import mlp_dims, mlp_init
    from pair_allegro_tpu.ops.tp import num_paths_per_l, tp_mix_init

    p0 = num_paths_per_l(LMAX, LMAX, LMAX, PARITY)[0]
    rng = np.random.RandomState(0)
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

    for nc in (5324, 5376):
        e = nc * K
        xt = jnp.asarray(rng.randn(NS, e) * 0.1, jnp.float32)
        vt = jnp.asarray(rng.randn(D, C, e) * 0.1, jnp.float32)
        yt = jnp.asarray(rng.randn(D, e) * 0.1, jnp.float32)
        ut = jnp.asarray(rng.rand(1, e), jnp.float32)

        def one(v):
            return allegro_layer_fused_t(
                xt, v, yt, ut, layer, LMAX, K, AVG, parity=PARITY
            )

        def fwd_chain(v):
            def body(v, _):
                x2, v2 = one(v)
                return v2 * 0.999 + 1e-3, jnp.sum(x2)

            v, s = jax.lax.scan(body, v, None, length=N_ITERS)
            return jnp.sum(v) + jnp.sum(s)

        def fwdbwd_chain(v):
            def body(v, _):
                def loss(v):
                    x2, v2 = one(v)
                    return jnp.sum(x2) + 1e-3 * jnp.sum(v2)

                g = jax.grad(loss)(v)
                return v * 0.999 + g * 1e-3, jnp.sum(g)

            v, s = jax.lax.scan(body, v, None, length=N_ITERS)
            return jnp.sum(v) + jnp.sum(s)

        bes = legal_bes(nc)
        print(f"== NC={nc} (E={e}), legal BE: {bes} ==", flush=True)
        for be_f in bes:
            os.environ["PAT_L1_BE"] = str(be_f)
            os.environ["PAT_L1_BE_BWD"] = str(be_f)
            ff = jax.jit(fwd_chain)
            ff(vt).block_until_ready()
            t0 = time.time()
            ff(vt).block_until_ready()
            fwd_ms = (time.time() - t0) / N_ITERS * 1e3
            fb = jax.jit(fwdbwd_chain)
            fb(vt).block_until_ready()
            t0 = time.time()
            fb(vt).block_until_ready()
            fb_ms = (time.time() - t0) / N_ITERS * 1e3
            print(f"  BE={be_f:4d}        fwd {fwd_ms:6.2f} ms   "
                  f"fwd+vjp {fb_ms:6.2f} ms", flush=True)
            jax.clear_caches()
        # mixed: default fwd BE, sweep bwd BE only
        os.environ["PAT_L1_BE"] = "0"
        for be_b in bes:
            os.environ["PAT_L1_BE_BWD"] = str(be_b)
            fb = jax.jit(fwdbwd_chain)
            fb(vt).block_until_ready()
            t0 = time.time()
            fb(vt).block_until_ready()
            fb_ms = (time.time() - t0) / N_ITERS * 1e3
            print(f"  bwd-only BE={be_b:4d}            "
                  f"fwd+vjp {fb_ms:6.2f} ms", flush=True)
            jax.clear_caches()
        os.environ.pop("PAT_L1_BE_BWD", None)


if __name__ == "__main__":
    main()
