from pair_allegro_tpu.io.extxyz import read_extxyz, write_extxyz
from pair_allegro_tpu.io.lammps_data import read_lammps_data, write_lammps_data
from pair_allegro_tpu.io.dump import DumpWriter

__all__ = [
    "read_extxyz",
    "write_extxyz",
    "read_lammps_data",
    "write_lammps_data",
    "DumpWriter",
]
