from pair_allegro_tpu.parallel.halo import HaloShardedAllegroEngine
from pair_allegro_tpu.parallel.mesh import make_mesh
from pair_allegro_tpu.parallel.sharded import ShardedAllegroEngine, ShardedNequIPEngine

__all__ = [
    "make_mesh",
    "ShardedAllegroEngine",
    "ShardedNequIPEngine",
    "HaloShardedAllegroEngine",
]
