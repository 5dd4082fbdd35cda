from pair_allegro_tpu.neighbors.naive import neighbor_list_np, pad_edges  # noqa: F401
