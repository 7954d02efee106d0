"""Public rendering entry points.

`render` mirrors the reference API surface
(/root/reference/gaussian_splatting/render.py:62) — positions, per-view
colors, raw opacity, full [N,3,3] covariances, camera — and returns an
[H, W, 3] image in [0, 1]. `render_from_params` is the fused training path:
raw parameters -> covariance + SH colors + projection + binning + compositing
in one jitted graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import RenderConfig
from .ops.gaussian import build_cov3d_packed, pack_cov3d
from .ops.projection import project_gaussians
from .ops.rasterize import rasterize
from .ops.sh import evaluate_sh


def render(
    pos: jnp.ndarray,
    color: jnp.ndarray,
    opacity_raw: jnp.ndarray,
    sigma: jnp.ndarray,
    c2w: jnp.ndarray,
    H: int,
    W: int,
    fx,
    fy,
    cx,
    cy,
    near: float = 0.01,
    far: float = 100.0,
    pix_guard: float = 32,
    T: int = 16,
    min_conis: float = 1e-6,
    chi_square_clip: float = 6.25,
    alpha_max: float = 0.99,
    alpha_cutoff: float = 1 / 128.0,
    cfg: RenderConfig | None = None,
    return_aux: bool = False,
):
    """Render a view; signature/threshold parity with reference render.py:62-64."""
    if cfg is None:
        cfg = RenderConfig(
            height=int(H),
            width=int(W),
            tile=int(T),
            near=near,
            far=far,
            pix_guard=pix_guard,
            min_conic=min_conis,
            chi2_clip=chi_square_clip,
            alpha_max=alpha_max,
            alpha_cutoff=alpha_cutoff,
        )
    if sigma.ndim == 3:
        cov3d = pack_cov3d(sigma)
    else:
        cov3d = sigma
    img, aux = _render_jit(pos, color, opacity_raw, cov3d, c2w,
                           jnp.float32(fx), jnp.float32(fy),
                           jnp.float32(cx), jnp.float32(cy), cfg)
    return (img, aux) if return_aux else img


@functools.partial(jax.jit, static_argnums=(9,))
def _render_jit(pos, color, opacity_raw, cov3d, c2w, fx, fy, cx, cy, cfg):
    proj = project_gaussians(pos, cov3d, opacity_raw, c2w, fx, fy, cx, cy, cfg)
    return rasterize(proj, color, cfg)


def render_from_params(
    params: dict,
    c2w: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
    cfg: RenderConfig,
    alive: jnp.ndarray | None = None,
    uv_tap: jnp.ndarray | None = None,
):
    """Fused differentiable forward: raw parameter pytree -> (image, aux).

    Args:
        params: dict with pos [N,3], scale_raw [N,3], q_raw [N,4],
            opacity_raw [N], f_dc [N,3], f_rest [N,45|9|0].
        alive: optional [N] bool pool-slot mask (fixed-capacity ADC).
        uv_tap: optional [N, 2] zeros; grad w.r.t. it is the view-space
            positional gradient (paper-style ADC statistic).
    """
    cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
    colors = evaluate_sh(params["f_dc"], params["f_rest"], params["pos"], c2w)
    proj = project_gaussians(
        params["pos"], cov3d, params["opacity_raw"], c2w, fx, fy, cx, cy, cfg,
        extra_valid=alive, uv_tap=uv_tap,
    )
    return rasterize(proj, colors, cfg)
