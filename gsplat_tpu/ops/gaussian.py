"""Gaussian parameterization: quaternion -> rotation, covariance construction.

TPU-native reimplementation of the reference semantics
(/root/reference/gaussian_splatting/gaussian.py:24-127):

* quaternions use the (x, y, z, w) layout,
* quaternions are normalized with a +1e-9 denominator guard,
* scales are stored in log-space, exponentiated and clamped to >= 1e-6,
* Sigma = R @ diag(s^2) @ R^T.

Design notes (TPU): rather than materializing [N, 3, 3] matrices and doing
batched 3x3 matmuls (tiny matmuls are MXU-hostile), the hot path uses the
packed upper-triangular representation ``cov3d_packed`` -> [N, 6] =
(xx, xy, xz, yy, yz, zz) computed with pure VPU elementwise math. The [N,3,3]
builders are kept for API parity and tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert (x, y, z, w) quaternions to rotation matrices.

    Args:
        quat: [..., 4] quaternions in (x, y, z, w) layout (reference
            gaussian.py:58 convention). Should be unit norm.

    Returns:
        [..., 3, 3] rotation matrices.
    """
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    xw, yw, zw = x * w, y * w, z * w
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - zw), 2 * (xz + yw)], axis=-1)
    row1 = jnp.stack([2 * (xy + zw), 1 - 2 * (xx + zz), 2 * (yz - xw)], axis=-1)
    row2 = jnp.stack([2 * (xz - yw), 2 * (yz + xw), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize_quat(q_raw: jnp.ndarray) -> jnp.ndarray:
    """Normalize raw quaternions with the reference's +1e-9 guard."""
    norm = jnp.linalg.norm(q_raw, axis=-1, keepdims=True)
    return q_raw / (norm + 1e-9)


def exp_scale(scale_raw: jnp.ndarray) -> jnp.ndarray:
    """Log-space scale -> positive scale, clamped to >= 1e-6."""
    return jnp.maximum(jnp.exp(scale_raw), 1e-6)


def build_sigma_from_params(scale_raw: jnp.ndarray, q_raw: jnp.ndarray) -> jnp.ndarray:
    """Build [N, 3, 3] covariance Sigma = R diag(s^2) R^T.

    Matches reference gaussian.py:71-127 semantics exactly.
    """
    scale = exp_scale(scale_raw)
    R = quat_to_rotmat(normalize_quat(q_raw))
    # Sigma = R diag(s^2) R^T, computed as (R * s^2[None]) @ R^T per item.
    Rs2 = R * (scale**2)[..., None, :]
    # HIGHEST: tiny 3x3 contraction, but TPU default (bf16 inputs) would cost
    # ~0.2% covariance error that feeds every downstream conic.
    return jnp.einsum("...ik,...jk->...ij", Rs2, R, precision="highest")


def build_cov3d_packed(scale_raw: jnp.ndarray, q_raw: jnp.ndarray) -> jnp.ndarray:
    """Packed covariance: [N, 6] = (xx, xy, xz, yy, yz, zz) of Sigma.

    Same math as :func:`build_sigma_from_params` but with every output
    element an elementwise (VPU) expression — Sigma_ab = sum_k s2_k R_ak R_bk
    over the quaternion-derived rotation entries. Batched 3x3 matmuls are
    MXU-hostile (measured ~5 ms/frame at 131k gaussians vs ~0 fused).
    """
    q = normalize_quat(q_raw)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx_, yy_, zz_ = x * x, y * y, z * z
    xy_, xz_, yz_ = x * y, x * z, y * z
    xw_, yw_, zw_ = x * w, y * w, z * w
    # Rotation matrix entries R[a][k] (reference gaussian.py:24-68 layout).
    r00 = 1 - 2 * (yy_ + zz_)
    r01 = 2 * (xy_ - zw_)
    r02 = 2 * (xz_ + yw_)
    r10 = 2 * (xy_ + zw_)
    r11 = 1 - 2 * (xx_ + zz_)
    r12 = 2 * (yz_ - xw_)
    r20 = 2 * (xz_ - yw_)
    r21 = 2 * (yz_ + xw_)
    r22 = 1 - 2 * (xx_ + yy_)

    s2 = exp_scale(scale_raw) ** 2
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]

    def sig(a0, a1, a2, b0, b1, b2):
        return s0 * a0 * b0 + s1 * a1 * b1 + s2_ * a2 * b2

    return jnp.stack(
        [
            sig(r00, r01, r02, r00, r01, r02),  # xx
            sig(r00, r01, r02, r10, r11, r12),  # xy
            sig(r00, r01, r02, r20, r21, r22),  # xz
            sig(r10, r11, r12, r10, r11, r12),  # yy
            sig(r10, r11, r12, r20, r21, r22),  # yz
            sig(r20, r21, r22, r20, r21, r22),  # zz
        ],
        axis=-1,
    )


def pack_cov3d(sigma: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper triangular (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_cov3d(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] upper triangular -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
