"""Gaussian model state (fixed-capacity pool) and adaptive density control."""

from .adc import AdcResult, densify_and_prune, raise_low_opacity  # noqa: F401
from .gaussians import (  # noqa: F401
    GaussianPool,
    compact_pool,
    export_params,
    init_pool_from_points,
    pool_from_dense,
)
