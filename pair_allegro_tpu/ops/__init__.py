from pair_allegro_tpu.ops.so3 import (  # noqa: F401
    real_wigner_3j,
    sh_dim,
    sh_slice,
    spherical_harmonics,
    spherical_harmonics_np,
    wigner_D_np,
)
