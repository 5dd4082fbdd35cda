from pair_allegro_tpu.models.allegro import AllegroConfig, allegro_energy, allegro_init  # noqa: F401
