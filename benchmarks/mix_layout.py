"""PAT_MIX_LAYOUT shootout: c-major vs p-major mix-weight rows in-kernel.

c-major (the tp_mix_init contract) forces a stack(axis=1)+interleaving
reshape per (l3, k) tile in the forward and a stride-P sublane gather per
path in the backward.  p-major turns those into a contiguous concat /
contiguous sublane slice (the weights are permuted outside the kernel —
free).  Times fwd and fwd+VJP at the bench shapes, kernel_high tier.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/mix_layout.py
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
    for batch in ("cmajor", "pmajor"):
        os.environ["PAT_MIX_LAYOUT"] = batch

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
            print(f"mix_layout={batch} {name:8s} {dt:8.2f} ms/layer-call "
                  f"(chain value {float(val):.6e})", flush=True)

    # both gates must agree numerically (same math, different MXU call shape)
    for name in ("fwd", "fwd+vjp"):
        for batch in ("pmajor",):
            a, b = outs[("cmajor", name)][1], outs[(batch, name)][1]
            rel = abs(a - b) / max(1.0, abs(a))
            print(f"{name} batch={batch}: rel diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
