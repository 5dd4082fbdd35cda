"""PAT_KMM_BATCH shootout: per-k3 small-N mix matmuls vs one lane-concat call.

The per-l3 mix in the env-fused kernel runs k3 = 2l3+1 matmuls of shape
(Cout, C*P) @ (C*P, BE); for l3=2 that is five M=32 MXU calls per l3-block.
PAT_KMM_BATCH=1 lane-concatenates the k3 SH rows so each l3 issues ONE
(Cout, C*P) @ (C*P, k3*BE) call — fewer MXU invocations at the same FLOPs,
at the cost of an in-VMEM concat + slice.  Times fwd and fwd+VJP at the
bench shapes under the default kernel_high tier.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kmm_batch.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

LMAX, C, K, NC, PARITY, AVG = 2, 32, 64, 5324, True, 12.0
N_ITERS = 30
D = (LMAX + 1) ** 2
E = NC * K


def main():
    from pair_allegro_tpu.ops.pallas_stack import tp_mix_env_fused_t
    from pair_allegro_tpu.ops.tp import tp_mix_init

    rng = np.random.RandomState(0)
    Vt = jnp.asarray(rng.randn(D, C, E) * 0.1, jnp.float32)
    wzt = jnp.asarray(rng.randn(C, E) * 0.1, jnp.float32)
    yt = jnp.asarray(rng.randn(D, E) * 0.1, jnp.float32)
    ws = tp_mix_init(jax.random.PRNGKey(0), LMAX, LMAX, LMAX, C, C,
                     jnp.float32, parity=PARITY)
    ws_flat = tuple(ws[f"l{l}"] for l in range(LMAX + 1))

    outs = {}
    for batch in ("0", "fwd", "1"):
        os.environ["PAT_KMM_BATCH"] = batch

        def one(vt):
            return tp_mix_env_fused_t(
                vt, wzt, yt, ws_flat, LMAX, K, AVG, parity=PARITY
            )

        @jax.jit
        def fwd_chain(vt):
            def body(v, _):
                o, i = one(v)
                return o * 0.999 + vt * 1e-3, jnp.sum(i)
            v, s = jax.lax.scan(body, vt, None, length=N_ITERS)
            return jnp.sum(v) + jnp.sum(s)

        @jax.jit
        def fwdbwd_chain(vt):
            def body(v, _):
                def loss(v):
                    o, i = one(v)
                    return jnp.sum(o) + jnp.sum(i)
                g = jax.grad(loss)(v)
                return v * 0.999 + g * 1e-3, jnp.sum(g)
            v, s = jax.lax.scan(body, vt, None, length=N_ITERS)
            return jnp.sum(v) + jnp.sum(s)

        for name, fn in (("fwd", fwd_chain), ("fwd+vjp", fwdbwd_chain)):
            fn(Vt).block_until_ready()  # compile
            t0 = time.time()
            val = fn(Vt).block_until_ready()
            dt = (time.time() - t0) / N_ITERS * 1e3
            outs[(batch, name)] = (dt, float(val))
            print(f"kmm_batch={batch} {name:8s} {dt:8.2f} ms/layer-call "
                  f"(chain value {float(val):.6e})", flush=True)

    # both gates must agree numerically (same math, different MXU call shape)
    for name in ("fwd", "fwd+vjp"):
        for batch in ("fwd", "1"):
            a, b = outs[("0", name)][1], outs[(batch, name)][1]
            rel = abs(a - b) / max(1.0, abs(a))
            print(f"{name} batch={batch}: rel diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
