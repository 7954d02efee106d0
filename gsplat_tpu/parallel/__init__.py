"""Mesh construction and SPMD train/render steps."""

from .mesh import DATA_AXIS, TILE_AXIS, make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    band_config,
    make_sharded_render,
    make_sharded_train_step,
)
