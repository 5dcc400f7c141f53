from dla_tpu.tiles.layout import TileLayout  # noqa: F401
