from pair_allegro_tpu.parallel.mesh import make_mesh
from pair_allegro_tpu.parallel.sharded import ShardedAllegroEngine

__all__ = ["make_mesh", "ShardedAllegroEngine"]
