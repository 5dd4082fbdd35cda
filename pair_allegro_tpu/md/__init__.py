from pair_allegro_tpu.md.integrate import MDState, Simulation, create_velocities  # noqa: F401
from pair_allegro_tpu.md.thermo import thermo_row  # noqa: F401
