"""Custom model-output extraction — the ``compute allegro`` /
``compute allegro/atom`` equivalents.

The reference registers named quantities with the pair style
(add_custom_output, /root/reference/pair_nequip_allegro.h:80-82); the pair
style stashes each named tensor the model emits every step
(pair_nequip_allegro.cpp:403-406); computes then expose them to thermo/dump:

* global vector (``compute allegro``): quantity is EXTENSIVE — per-rank
  tensors are summed over ranks with MPI_Allreduce
  (compute/compute_allegro.cpp:102-128).  Here: per-atom (or per-edge) rows
  are summed over the leading axis; in sharded mode the shard partials are
  already combined by XLA when the extras arrive assembled, so the same sum
  is exact (the psum analog).
* per-atom array (``compute allegro/atom``): rows per atom, ghost rows
  reverse-communicated when newton on (compute/compute_allegro.cpp:131-189).
  Here atoms are never duplicated (no ghosts in the replicated-positions
  design), so the reverse comm is the identity; padded rows are masked out.

Models surface extras by returning additional named entries from their
energy dict; ``make_potential`` passes them through as ModelOutputs.extras.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GlobalCompute:
    """Extensive global vector from a named model extra.

    The extra must be (N_rows, length) or (length,); rows are summed
    (extensive quantity, compute/README.md:23).
    """

    quantity: str
    length: int

    def __call__(self, outputs, system=None):
        try:
            t = outputs.extras[self.quantity]
        except KeyError:
            raise KeyError(
                f"Model did not emit custom output '{self.quantity}' "
                f"(available: {sorted(outputs.extras)})"
            ) from None
        t = jnp.asarray(t)
        if t.ndim == 1 and t.shape[0] == self.length:
            return t
        flat = t.reshape(-1, t.shape[-1]) if t.ndim > 1 else t.reshape(-1, 1)
        if flat.shape[-1] != self.length:
            raise ValueError(
                f"compute {self.quantity}: expected length {self.length}, "
                f"model gave trailing dim {flat.shape[-1]} "
                "(wrong length, compute/compute_allegro.cpp:118-121 analog)"
            )
        return jnp.sum(flat, axis=0)


@dataclasses.dataclass
class PerAtomCompute:
    """Per-atom array from a named model extra: (N, ncols); padded/invalid
    atoms zeroed (the reference zeroes non-group atoms,
    compute/compute_allegro.cpp:150-153)."""

    quantity: str
    ncols: int

    def __call__(self, outputs, system):
        try:
            t = outputs.extras[self.quantity]
        except KeyError:
            raise KeyError(
                f"Model did not emit custom output '{self.quantity}' "
                f"(available: {sorted(outputs.extras)})"
            ) from None
        t = jnp.asarray(t)
        n = system.n_atoms
        if t.shape[0] != n:
            raise ValueError(
                f"compute {self.quantity}/atom: leading dim {t.shape[0]} != n_atoms {n}"
            )
        t = t.reshape(n, -1)
        if t.shape[1] != self.ncols:
            raise ValueError(
                f"compute {self.quantity}/atom: expected {self.ncols} columns, got {t.shape[1]}"
            )
        return t * system.valid_mask().astype(t.dtype)[:, None]
