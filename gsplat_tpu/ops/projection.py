"""Fused per-Gaussian projection: world params -> screen-space splat data.

Replaces the reference's chain of dynamically-shaped steps
(/root/reference/gaussian_splatting/render.py:104-247: opacity pre-filter ->
camera transform -> frustum cull -> projection -> EWA covariance -> eigh
clamp -> finite filter -> radius/AABB -> on-screen cull) with ONE static-shape
vectorized pass. Instead of boolean-mask gathers (dynamic shapes, XLA-hostile)
every Gaussian keeps its slot and carries a `valid` mask.

The reference's per-Gaussian ``torch.linalg.eigh`` (render.py:177-179) — slow
and gradient-fragile — is replaced by the closed-form identity for symmetric
2x2 matrices:  S = m*I + Q diag(-r, r) Q^T  with m = tr(S)/2 and
r = sqrt(((a-c)/2)^2 + b^2), so clamping eigenvalues to [lo, hi] and
recomposing is

    S' = m' * I + ((l2' - l1') / (2r)) * (S - m*I)

which is algebraically identical to eigh->clamp->recompose but pure VPU math
with stable gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from .camera import inv2x2_packed

EVAL_MIN = 1e-6  # reference render.py:178 clamp bounds
EVAL_MAX = 1e4


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space splat data, one slot per input Gaussian."""

    uv: jnp.ndarray  # [N, 2] pixel center
    depth: jnp.ndarray  # [N] camera-space z
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (A, B, C)
    opacity: jnp.ndarray  # [N] sigmoid opacity, clamped to [0, 0.999]
    radius: jnp.ndarray  # [N] int32 pixel radius (0 for invalid)
    tile_min: jnp.ndarray  # [N, 2] int32 (tx0, ty0) inclusive
    tile_max: jnp.ndarray  # [N, 2] int32 (tx1, ty1) inclusive
    valid: jnp.ndarray  # [N] bool


def clamp_eigvals_2x2(a, b, c, lo=EVAL_MIN, hi=EVAL_MAX):
    """Clamp eigenvalues of symmetric [[a,b],[b,c]] to [lo, hi], recompose.

    Returns (a', b', c', lam_max') where lam_max' is the clamped larger
    eigenvalue (used for the splat radius).

    Gradient care: on the (overwhelmingly common) unclamped path the output
    is returned as the INPUT itself, so gradients are exactly identity — the
    recomposition formula would otherwise have a 0/0 kink at isotropic
    matrices (r == 0).
    """
    m = 0.5 * (a + c)
    d = 0.5 * (a - c)
    r = jnp.sqrt(d * d + b * b + 1e-30)
    l1_raw = m - r
    l2_raw = m + r
    l1 = jnp.clip(l1_raw, lo, hi)
    l2 = jnp.clip(l2_raw, lo, hi)
    unclamped = (l1_raw >= lo) & (l2_raw <= hi)
    m_new = 0.5 * (l1 + l2)
    # (l2-l1)/(2r) — when r -> 0 the matrix is isotropic and S - m*I -> 0,
    # so the factor is irrelevant; the 1e-30 guard keeps it finite.
    f = (l2 - l1) / (2.0 * r)
    a_new = jnp.where(unclamped, a, m_new + f * d)
    c_new = jnp.where(unclamped, c, m_new - f * d)
    b_new = jnp.where(unclamped, b, f * b)
    return a_new, b_new, c_new, l2


def project_gaussians(
    pos: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacity_raw: jnp.ndarray,
    c2w: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
    cfg: RenderConfig,
    extra_valid: jnp.ndarray | None = None,
    uv_tap: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project N world-space Gaussians into screen space (static shapes).

    Args:
        pos: [N, 3] world positions.
        cov3d: [N, 6] packed world covariance (xx, xy, xz, yy, yz, zz).
        opacity_raw: [N] pre-sigmoid opacities.
        c2w: [4, 4] camera-to-world.
        fx, fy, cx, cy: intrinsics (scalars).
        cfg: static render config.
        extra_valid: optional [N] bool mask (e.g. the ADC alive mask); invalid
            slots are culled exactly like off-frustum Gaussians.
        uv_tap: optional [N, 2] zeros added to the projected pixel centers —
            a differentiation tap: grad(loss, uv_tap) is the VIEW-SPACE
            positional gradient the original-paper ADC accumulates
            (Kerbl et al. 2023 §5.2; the reference uses world-space grads
            instead, scripts/train.py:543-553).
    """
    dtype = pos.dtype
    H, W = cfg.height, cfg.width

    # --- opacity pre-filter (reference render.py:104-107) ---
    opacity = jnp.clip(jax.nn.sigmoid(opacity_raw), 0.0, 0.999)
    valid = opacity >= cfg.alpha_cutoff * 0.5
    if extra_valid is not None:
        valid &= extra_valid

    # --- camera transform + frustum (render.py:119-136) ---
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    # HIGHEST precision: sub-pixel projection accuracy (TPU default truncates
    # matmul inputs to bf16).
    cam = jnp.einsum("nj,jk->nk", pos - t[None, :], R, precision="highest")
    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    guard_v = cfg.pix_guard if cfg.pix_guard_v is None else cfg.pix_guard_v
    in_front = z > 0
    depth_ok = (z > cfg.near) & (z < cfg.far)
    fx_x = fx * x
    u_ok = (fx_x > z * (-cfg.pix_guard - cx)) & (
        fx_x < z * (W + cfg.pix_guard - cx)
    )
    fy_y = fy * y
    v_ok = (fy_y > z * (-guard_v - cy)) & (fy_y < z * (H + guard_v - cy))
    valid &= in_front & depth_ok & u_ok & v_ok
    valid &= jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)

    # Sanitize BEFORE any division/sqrt: invalid lanes get a benign dummy
    # point (origin at depth 1). Their outputs are masked anyway, but without
    # this, reverse-mode AD computes 0-cotangent * inf-Jacobian = NaN on
    # culled lanes (z <= 0, NaN inputs, dead pool slots) and poisons the
    # WHOLE gradient (the standard JAX double-where rule).
    x = jnp.where(valid, x, 0.0)
    y = jnp.where(valid, y, 0.0)
    z = jnp.where(valid, z, 1.0)

    # --- projection (render.py:146) ---
    u = fx * x / z + cx
    v = fy * y / z + cy
    if uv_tap is not None:
        u = u + uv_tap[:, 0]
        v = v + uv_tap[:, 1]

    # --- EWA: Sigma_cam = Rwc Sigma Rwc^T, then J Sigma_cam J^T ---
    # (render.py:156-175). We fold both into one quadratic form: with
    # M = J @ Rwc of shape [N, 2, 3], Sigma2D = M Sigma M^T — evaluated on the
    # packed [N,6] covariance with pure elementwise math.
    invz = 1.0 / jnp.maximum(z, 1e-6)
    invz2 = invz * invz
    # J rows: ju = [fx*invz, 0, -fx*x*invz2], jv = [0, fy*invz, -fy*y*invz2]
    # in CAMERA space; to apply to the WORLD covariance, row_world = J_row @ Rwc
    # where Rwc = R^T, i.e. row_world = R @ J_row^T ... careful:
    # Sigma_cam = Rwc Sigma Rwc^T; Sigma2D = J Sigma_cam J^T
    #           = (J Rwc) Sigma (J Rwc)^T, and (J Rwc)_row = J_row @ R^T.
    ju_cam = jnp.stack(
        [fx * invz, jnp.zeros_like(invz), -fx * x * invz2], axis=-1
    )  # [N,3]
    jv_cam = jnp.stack(
        [jnp.zeros_like(invz), fy * invz, -fy * y * invz2], axis=-1
    )
    mu = jnp.einsum("nj,kj->nk", ju_cam, R, precision="highest")  # [N, 3]
    mv = jnp.einsum("nj,kj->nk", jv_cam, R, precision="highest")

    xx, xy, xz, yy, yz, zz = (cov3d[:, i] for i in range(6))

    def quad(p, q):
        """p^T Sigma q for row vectors p, q of shape [N, 3]."""
        return (
            p[:, 0] * (xx * q[:, 0] + xy * q[:, 1] + xz * q[:, 2])
            + p[:, 1] * (xy * q[:, 0] + yy * q[:, 1] + yz * q[:, 2])
            + p[:, 2] * (xz * q[:, 0] + yz * q[:, 1] + zz * q[:, 2])
        )

    s_a = quad(mu, mu)  # Sigma2D[0,0]
    s_c = quad(mv, mv)  # Sigma2D[1,1]
    # Symmetrize the cross term (render.py:175).
    s_b = 0.5 * (quad(mu, mv) + quad(mv, mu))

    # Finite filter (render.py:187-200), then sanitize invalid lanes to the
    # identity covariance before the clamp/inverse (gradient hygiene again).
    valid &= jnp.isfinite(s_a) & jnp.isfinite(s_b) & jnp.isfinite(s_c)
    s_a = jnp.where(valid, s_a, 1.0)
    s_b = jnp.where(valid, s_b, 0.0)
    s_c = jnp.where(valid, s_c, 1.0)

    # Optional screen-space antialiasing (cfg.aa_mode; default "none" keeps
    # exact reference parity — the reference omits the original paper's
    # +0.3 px low-pass, render.py:174-179). "mip" additionally scales
    # opacity by sqrt(det/det') (Mip-Splatting Eq. 6) so dilating a
    # sub-pixel splat does not inject energy.
    if cfg.aa_mode == "dilate":
        s_a = s_a + cfg.aa_dilation
        s_c = s_c + cfg.aa_dilation
    elif cfg.aa_mode == "mip":
        det_before = jnp.maximum(s_a * s_c - s_b * s_b, 1e-12)
        s_a = s_a + cfg.aa_dilation
        s_c = s_c + cfg.aa_dilation
        det_after = jnp.maximum(s_a * s_c - s_b * s_b, 1e-12)
        opacity = opacity * jnp.sqrt(det_before / det_after)
    elif cfg.aa_mode != "none":
        raise ValueError(f"unknown aa_mode {cfg.aa_mode!r}")

    # Eigenvalue clamp (closed form; replaces render.py:177-179 eigh).
    s_a, s_b, s_c, lam_max = clamp_eigvals_2x2(s_a, s_b, s_c)

    # --- radius + AABB (render.py:227-247) ---
    # The reference uses the circumscribed radius 2.5*sqrt(lambda_max) on
    # BOTH axes. The ellipse's exact axis-aligned extents are the marginal
    # stds 2.5*sqrt(Sigma_xx) / 2.5*sqrt(Sigma_yy) — always <= the radius,
    # much tighter for anisotropic splats. Pixels between the two bounds
    # satisfy q > chi2_clip (= 2.5^2) and are zeroed by the compositor's
    # cutoff either way, so rendered images are IDENTICAL with fewer
    # (gaussian, tile) pairs to sort/gather/composite.
    # Bound radius tied to the compositor's cutoffs, per gaussian:
    # contributions vanish beyond q > chi2_clip AND beyond
    # op * exp(-q/2) < alpha_cutoff  =>  q > 2*ln(op/alpha_cutoff) — for
    # dim gaussians the opacity bound is much tighter than 2.5 sigma.
    # Every excluded pixel is zeroed by the compositor either way, so
    # images and gradients are unchanged; only dead pairs disappear.
    k2 = jnp.minimum(
        cfg.chi2_clip,
        2.0 * jnp.log(jnp.maximum(opacity, 1e-12) / cfg.alpha_cutoff),
    )
    valid &= k2 > 0.0  # opacity <= cutoff: zero contribution everywhere
    k2 = jnp.maximum(k2, 0.0)
    major = jnp.clip(lam_max, 1e-12, 1e4)
    radius_f = jnp.ceil(jnp.sqrt(k2 * major))
    rx = jnp.ceil(jnp.sqrt(k2 * jnp.clip(s_a, 1e-12, 1e4)))
    ry = jnp.ceil(jnp.sqrt(k2 * jnp.clip(s_c, 1e-12, 1e4)))
    umin = jnp.floor(u - rx)
    umax = jnp.floor(u + rx)
    vmin = jnp.floor(v - ry)
    vmax = jnp.floor(v + ry)
    on_screen = (umax >= 0) & (umin < W) & (vmax >= 0) & (vmin < H)
    valid &= on_screen

    umin_i = jnp.clip(umin, 0, W - 1).astype(jnp.int32)
    umax_i = jnp.clip(umax, 0, W - 1).astype(jnp.int32)
    vmin_i = jnp.clip(vmin, 0, H - 1).astype(jnp.int32)
    vmax_i = jnp.clip(vmax, 0, H - 1).astype(jnp.int32)

    T = cfg.tile
    tile_min = jnp.stack([umin_i // T, vmin_i // T], axis=-1)
    tile_max = jnp.stack([umax_i // T, vmax_i // T], axis=-1)
    # Zero out the footprint of invalid gaussians so downstream pair counts
    # treat them as empty.
    tile_min = jnp.where(valid[:, None], tile_min, 0)
    tile_max = jnp.where(valid[:, None], tile_max, -1)

    conic_a, conic_b, conic_c = inv2x2_packed(s_a, s_b, s_c)
    # Diagonal clamp (render.py:310-315).
    conic_a = jnp.maximum(conic_a, cfg.min_conic)
    conic_c = jnp.maximum(conic_c, cfg.min_conic)
    conic = jnp.stack([conic_a, conic_b, conic_c], axis=-1).astype(dtype)

    return ProjectedGaussians(
        uv=jnp.stack([u, v], axis=-1).astype(dtype),
        depth=z.astype(dtype),
        conic=conic,
        opacity=opacity.astype(dtype),
        radius=jnp.where(valid, radius_f, 0.0).astype(jnp.int32),
        tile_min=tile_min,
        tile_max=tile_max,
        valid=valid,
    )
