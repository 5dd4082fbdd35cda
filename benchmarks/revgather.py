"""Variants of the force-backward reverse-edge gather.

The r4 step profile attributes 1.76 ms/step to `fusion.363` — the VJP of
table_edge_vec (`ops/scatter._vec_cotangent_to_atoms`): a row gather of the
(E+1, 3) edge-cotangent array by the (N, K) reverse table, which XLA fuses
with a relayout to a feature-major (E-minor) tile — 4x the cost of the
forward's identical-shape row gather (fusion.351, 0.45 ms, row-major
output).  This times isolated variants to find the cheap form:

  v0  current: sum(dflat[rev], 1) - sum(dm, 1)
  v1  optimization_barrier after the gather (blocks the relayout fusion)
  v2  rows padded to 4 floats (16 B-aligned gather), slice after
  v3  v1 + v2
  v4  gather first, mask after (mask moves from producer to consumer)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/revgather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N, K = 5324, 64
E = N * K
N_ITERS = 50


def make_rev(rng):
    # realistic reverse table: a permutation of [0, E) plus E for padded
    j = rng.permutation(E)
    rev = np.empty(E, np.int32)
    rev[j] = np.arange(E, dtype=np.int32)
    return jnp.asarray(rev.reshape(N, K))


def main():
    rng = np.random.RandomState(0)
    dvec = jnp.asarray(rng.randn(N, K, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(N, K) > 0.1)
    rev = make_rev(rng)

    def v0(dvec, rev, mask):
        dm = dvec * mask.astype(dvec.dtype)[..., None]
        dflat = jnp.concatenate(
            [dm.reshape(E, 3), jnp.zeros((1, 3), dvec.dtype)], axis=0
        )
        return jnp.sum(dflat[rev], axis=1) - jnp.sum(dm, axis=1)

    def v1(dvec, rev, mask):
        dm = dvec * mask.astype(dvec.dtype)[..., None]
        dflat = jnp.concatenate(
            [dm.reshape(E, 3), jnp.zeros((1, 3), dvec.dtype)], axis=0
        )
        g = jax.lax.optimization_barrier(dflat[rev])
        return jnp.sum(g, axis=1) - jnp.sum(dm, axis=1)

    def v2(dvec, rev, mask):
        dm = dvec * mask.astype(dvec.dtype)[..., None]
        dflat = jnp.concatenate(
            [dm.reshape(E, 3), jnp.zeros((1, 3), dvec.dtype)], axis=0
        )
        dflat4 = jnp.pad(dflat, ((0, 0), (0, 1)))
        return jnp.sum(dflat4[rev], axis=1)[:, :3] - jnp.sum(dm, axis=1)

    def v3(dvec, rev, mask):
        dm = dvec * mask.astype(dvec.dtype)[..., None]
        dflat = jnp.concatenate(
            [dm.reshape(E, 3), jnp.zeros((1, 3), dvec.dtype)], axis=0
        )
        dflat4 = jnp.pad(dflat, ((0, 0), (0, 1)))
        g = jax.lax.optimization_barrier(dflat4[rev])
        return jnp.sum(g, axis=1)[:, :3] - jnp.sum(dm, axis=1)

    def v4(dvec, rev, mask):
        # gather unmasked cotangents; apply the (gathered) mask after.
        # rev maps self-pad slots to index E whose row is zero, but real
        # rows' padded-slot cotangents must still be dropped: gather the
        # mask bit along the same rows.
        mf = jnp.concatenate(
            [mask.reshape(E).astype(dvec.dtype), jnp.zeros((1,), dvec.dtype)]
        )
        dflat = jnp.concatenate(
            [dvec.reshape(E, 3), jnp.zeros((1, 3), dvec.dtype)], axis=0
        )
        g = dflat[rev] * mf[rev][..., None]
        dm = dvec * mask.astype(dvec.dtype)[..., None]
        return jnp.sum(g, axis=1) - jnp.sum(dm, axis=1)

    fns = [("v0 current", v0), ("v1 barrier", v1), ("v2 pad4", v2),
           ("v3 barrier+pad4", v3), ("v4 mask-after", v4)]
    ref = None
    for name, f in fns:
        def chain(dvec, rev, mask, f=f):
            def body(c, _):
                out = f(c, rev, mask)
                # feed a dependency back so the scan can't be elided
                c2 = c + jnp.mean(out) * 1e-6
                return c2, jnp.sum(out)

            c, s = jax.lax.scan(body, dvec, None, length=N_ITERS)
            return jnp.sum(s)

        jf = jax.jit(chain)
        out1 = jax.jit(f)(dvec, rev, mask)
        if ref is None:
            ref = out1
        else:
            np.testing.assert_allclose(np.asarray(out1), np.asarray(ref),
                                       atol=1e-4)
        jf(dvec, rev, mask).block_until_ready()
        t0 = time.time()
        jf(dvec, rev, mask).block_until_ready()
        dt = (time.time() - t0) / N_ITERS * 1e3
        print(f"{name:18s} {dt:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
