"""gsplat_tpu — a TPU-native 3D Gaussian Splatting framework.

A ground-up JAX/XLA/Pallas reimplementation of the capability surface of
ashu1069/3D-Gaussian-Splatting-for-Novel-View-Synthesis (pure-PyTorch
reference): differentiable EWA splatting renderer, SH view-dependent color,
L1+SSIM training with adaptive density control, checkpoint/resume, orbit
rendering/benchmarking, and dataset tooling — redesigned around static
shapes, fused kernels, and `jax.sharding` meshes instead of python tile
loops and dynamic boolean-mask culling.

Public API parity with the reference package
(/root/reference/gaussian_splatting/__init__.py:7-21) plus the TPU-first
additions (RenderConfig, fused render_from_params, sharded training step).
"""

import os as _os

if _os.environ.get("GSPLAT_PLATFORM"):
    # Env-var escape hatch for every CLI/script: some TPU plugins ignore
    # JAX_PLATFORMS / JAX_PLATFORM_NAME and hang at backend init when the
    # device link is down; jax.config is the only reliable selector. Must
    # run before the first backend use (importing jax is fine).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GSPLAT_PLATFORM"])

from .config import RenderConfig, TrainConfig  # noqa: F401
from .ops import (  # noqa: F401
    HARMONICS,
    build_sigma_from_params,
    compute_loss,
    evaluate_sh,
    inv2x2,
    l1_loss,
    project_points,
    quat_to_rotmat,
    scale_intrinsics,
    ssim_loss,
)
from .render import (  # noqa: F401
    render,
    pair_demand,
    render_batch_from_params,
    render_from_params,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy submodule access (keeps `import gsplat_tpu` light; data/viewer
    # pull PIL and other host-side deps only when used).
    if name in ("data", "viewer", "models", "train", "parallel", "ops"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
