"""Radial basis and cutoff envelopes.

The reference's compiled models embed these (Bessel radial basis + polynomial
cutoff, test config /root/reference/tests/test_data/test_repro_allegro.yaml:87-92:
num_bessels=8, polynomial_cutoff_p=6).  Re-implemented natively for TPU: pure
elementwise math the XLA fuser folds into adjacent kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bessel_basis(r, r_max, num_basis: int = 8, eps: float = 1e-8):
    """Sine-Bessel radial basis: sqrt(2/rc) * sin(n pi r / rc) / r, n=1..N.

    Args:
      r: (...,) distances.
      r_max: scalar cutoff (or broadcastable per-edge cutoff array).
    Returns:
      (..., num_basis)
    """
    n = jnp.asarray(np.arange(1, num_basis + 1), dtype=r.dtype)
    r_safe = jnp.maximum(r, eps)[..., None]
    x = n * (jnp.pi / r_max) * r_safe
    return jnp.sqrt(2.0 / r_max) * jnp.sin(x) / r_safe


def polynomial_cutoff(r, r_max, p: int = 6):
    """Smooth polynomial cutoff envelope u(r/rc) with u(0)=1, u(1)=0 and p
    vanishing derivatives at r=rc (Klicpera et al.); zero beyond rc.

    Doubles as the padded-edge killer: fake edges are parked far apart
    (the Kokkos fake-edge trick, pair_nequip_allegro_kokkos.cpp:260-264)
    so their envelope is exactly 0.
    """
    x = r / r_max
    xp = jnp.power(jnp.clip(x, 0.0, 1.0), p)
    out = (
        1.0
        - 0.5 * (p + 1.0) * (p + 2.0) * xp
        + p * (p + 2.0) * xp * jnp.clip(x, 0.0, 1.0)
        - 0.5 * p * (p + 1.0) * xp * jnp.clip(x, 0.0, 1.0) ** 2
    )
    return jnp.where(x < 1.0, out, 0.0)
