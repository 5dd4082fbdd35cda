"""Per-layer env-fused kernel: paths-vs-MXU formulation shootout (VERDICT r2 #1).

Times the production per-layer kernel (tp_mix_env_fused_t) at the bench
shapes (5,324 atoms, K=64, C=32, l_max=2, parity) for each TP formulation,
forward and forward+VJP, as a lax.scan of DEPENDENT iterations (the axon
relay elides repeated identical computations — see the verify skill).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_modes.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pair_allegro_tpu.ops.pallas_stack import tp_mix_env_fused_t
from pair_allegro_tpu.ops.tp import tp_mix_init

LMAX, C, K, NC, PARITY, AVG = 2, 32, 64, 5324, True, 12.0
N_ITERS = 30
D = (LMAX + 1) ** 2
E = NC * K


def main():
    rng = np.random.RandomState(0)
    Vt = jnp.asarray(rng.randn(D, C, E) * 0.1, jnp.float32)
    wzt = jnp.asarray(rng.randn(C, E) * 0.1, jnp.float32)
    yt = jnp.asarray(rng.randn(D, E) * 0.1, jnp.float32)
    ws = tp_mix_init(jax.random.PRNGKey(0), LMAX, LMAX, LMAX, C, C,
                     jnp.float32, parity=PARITY)
    ws_flat = tuple(ws[f"l{l}"] for l in range(LMAX + 1))

    results = {}
    for mode in ("paths", "mxu_highest", "mxu_bf16x3", "mxu_bf16"):

        def one(vt):
            o, i = tp_mix_env_fused_t(
                vt, wzt, yt, ws_flat, LMAX, K, AVG, parity=PARITY, mode=mode
            )
            return o, i

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

        row = {}
        for name, fn in (("fwd", fwd_chain), ("fwd+vjp", fwdbwd_chain)):
            try:
                fn(Vt).block_until_ready()  # compile
                t0 = time.time()
                fn(Vt).block_until_ready()
                dt = (time.time() - t0) / N_ITERS * 1e3
                row[name] = dt
                print(f"{mode:12s} {name:8s} {dt:8.2f} ms/layer-call", flush=True)
            except Exception as e:  # noqa: BLE001 — report and continue
                row[name] = None
                print(f"{mode:12s} {name:8s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
        results[mode] = row

    # accuracy of each mode vs the paths kernel (same inputs)
    o_ref, i_ref = jax.jit(
        lambda v: tp_mix_env_fused_t(v, wzt, yt, ws_flat, LMAX, K, AVG,
                                     parity=PARITY, mode="paths")
    )(Vt)
    for mode in ("mxu_highest", "mxu_bf16x3", "mxu_bf16"):
        try:
            o, i = jax.jit(
                lambda v: tp_mix_env_fused_t(v, wzt, yt, ws_flat, LMAX, K, AVG,
                                             parity=PARITY, mode=mode)
            )(Vt)
            rel = float(jnp.max(jnp.abs(o - o_ref)) / jnp.max(jnp.abs(o_ref)))
            print(f"{mode:12s} max rel out err vs paths: {rel:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode:12s} accuracy FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
