"""pair_allegro_tpu — a TPU-native MD engine for Allegro / NequIP interatomic potentials.

A from-scratch re-design of the capabilities of mir-group/pair_allegro
(LAMMPS + libtorch plugin) as a standalone JAX/XLA/Pallas framework:

- e3nn-style SO(3)/O(3) equivariant math core (``ops``)
- Allegro (strictly local) and NequIP (message passing) models (``models``)
- on-device neighbor lists with padded fixed shapes (``neighbors``)
- MD runtime: integrators, thermo, units (``md``)
- sharded atom-mesh domain decomposition with ICI halo exchange (``parallel``)
- custom model-output computes, global + per-atom (``compute``)
- trajectory / structure IO (``io``)
- torch checkpoint importers (``importers``)

Reference behaviors are cited into /root/reference (pair_nequip_allegro.{h,cpp})
throughout the code so parity can be audited.
"""

__version__ = "0.1.0"

from pair_allegro_tpu.compile_cache import enable_compile_cache  # noqa: F401
from pair_allegro_tpu.system import System, Units  # noqa: F401
