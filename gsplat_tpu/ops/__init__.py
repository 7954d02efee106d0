"""Core compute ops (projection, SH, binning, rasterization, losses)."""

from .camera import (  # noqa: F401
    check_frustum_camera_space,
    inv2x2,
    project_points,
    scale_intrinsics,
    transform_to_camera_space,
    w2c_from_c2w,
)
from .gaussian import (  # noqa: F401
    build_cov3d_packed,
    build_sigma_from_params,
    pack_cov3d,
    quat_to_rotmat,
    unpack_cov3d,
)
from .losses import compute_loss, l1_loss, ssim, ssim_loss  # noqa: F401
from .projection import ProjectedGaussians, project_gaussians  # noqa: F401
from .binning import TileBinning, bin_gaussians  # noqa: F401
from .rasterize import rasterize, rasterize_binned, rasterize_dense  # noqa: F401
from .sh import HARMONICS, evaluate_sh, sh_basis  # noqa: F401
