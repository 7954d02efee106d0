"""Mesh construction and SPMD train/render steps."""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    TILE_AXIS,
    initialize_multihost,
    make_mesh,
)
from .sharding import (  # noqa: F401
    band_config,
    make_gauss_sharded_train_step,
    make_sharded_batch_render,
    make_sharded_render,
    make_sharded_train_step,
    shard_train_state,
)
