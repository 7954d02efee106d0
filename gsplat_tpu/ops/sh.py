"""Real spherical harmonics (degree 0..3) view-dependent color.

Reimplements the reference semantics
(/root/reference/gaussian_splatting/spherical_harmonics.py:50-166):

* 16 Cartesian real SH basis functions Y0..Y15 with the standard 3DGS
  normalization constants,
* view direction = normalize(point - camera_position) (camera -> point sign),
  with a +1e-8 norm guard,
* coefficients packed as f_dc [N,3] (basis 0) + f_rest [N,45] laid out as
  [15 R terms, 15 G terms, 15 B terms],
* color = sigmoid(sum_k f_k * Y_k).

TPU design: the coefficient-times-basis contraction is expressed as a single
[N,16] x [N,16,3] einsum so XLA can keep it on the VPU/MXU; no scatter into a
preallocated buffer (the reference fills an empty tensor in place).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2_0 = 1.0925484305920792  # xy, yz, xz
SH_C2_1 = 0.31539156525252005  # (3z^2 - 1)
SH_C2_2 = 0.5462742152960396  # (x^2 - y^2)
SH_C3_0 = 0.5900435899266435  # y(3x^2 - y^2) and x(x^2 - 3y^2)
SH_C3_1 = 2.890611442640554  # xyz
SH_C3_2 = 0.4570457994644658  # y(4z^2 - x^2 - y^2) and x(...)
SH_C3_3 = 0.3731763325901154  # z(2z^2 - 3x^2 - 3y^2)
SH_C3_4 = 1.445305721320277  # z(x^2 - y^2)

HARMONICS = {
    "SH_C0": SH_C0,
    "SH_C1_x": SH_C1,
    "SH_C1_y": SH_C1,
    "SH_C1_z": SH_C1,
    "SH_C2_xy": SH_C2_0,
    "SH_C2_xz": SH_C2_0,
    "SH_C2_yz": SH_C2_0,
    "SH_C2_zz": SH_C2_1,
    "SH_C2_xx_yy": SH_C2_2,
    "SH_C3_yxx_yyy": SH_C3_0,
    "SH_C3_xyz": SH_C3_1,
    "SH_C3_yzz_yxx_yyy": SH_C3_2,
    "SH_C3_zzz_zxx_zyy": SH_C3_3,
    "SH_C3_xzz_xxx_xyy": SH_C3_2,
    "SH_C3_zxx_zyy": SH_C3_4,
    "SH_C3_xxx_xyy": SH_C3_0,
}

NUM_SH_BASES = 16


def sh_basis(dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the 16 real SH basis functions at unit directions.

    Args:
        dirs: [..., 3] unit view directions (camera -> point).

    Returns:
        [..., 16] basis values Y0..Y15 (reference sh ordering, sh.py:145-160).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.full_like(x, SH_C0),
            -SH_C1 * y,
            SH_C1 * z,
            -SH_C1 * x,
            SH_C2_0 * xy,
            SH_C2_0 * yz,
            SH_C2_1 * (3 * zz - 1),
            SH_C2_0 * xz,
            SH_C2_2 * (xx - yy),
            SH_C3_0 * y * (3 * xx - yy),
            SH_C3_1 * x * y * z,
            SH_C3_2 * y * (4 * zz - xx - yy),
            SH_C3_3 * z * (2 * zz - 3 * xx - 3 * yy),
            SH_C3_2 * x * (4 * zz - xx - yy),
            SH_C3_4 * z * (xx - yy),
            SH_C3_0 * x * (xx - 3 * yy),
        ],
        axis=-1,
    )


def pack_sh_coeffs(f_dc: jnp.ndarray, f_rest: jnp.ndarray) -> jnp.ndarray:
    """Pack f_dc [N,3] + f_rest [N,3*(K-1)] -> [N, K, 3] coefficients.

    f_rest layout matches the reference (sh.py:125-127): first all R terms,
    then all G, then all B. Supports K-1 in {0, 3, 15} (0/1/3 SH bands).
    """
    n = f_dc.shape[0]
    n_rest = f_rest.shape[-1] // 3 if f_rest.size else 0
    coeffs = [f_dc[:, None, :]]
    if n_rest:
        rest = jnp.stack(
            [
                f_rest[:, :n_rest],
                f_rest[:, n_rest : 2 * n_rest],
                f_rest[:, 2 * n_rest : 3 * n_rest],
            ],
            axis=-1,
        )  # [N, n_rest, 3]
        coeffs.append(rest)
    packed = jnp.concatenate(coeffs, axis=1)
    assert packed.shape[0] == n
    return packed


def evaluate_sh(
    f_dc: jnp.ndarray,
    f_rest: jnp.ndarray,
    points: jnp.ndarray,
    c2w: jnp.ndarray,
) -> jnp.ndarray:
    """View-dependent RGB color from SH coefficients.

    Matches reference sh.py:70-166: dir = normalize(point - cam_pos),
    color = sigmoid(sum_k f_k * Y_k(dir)). Basis functions above the stored
    band count simply contribute nothing (coefficient tensor is short).

    Args:
        f_dc: [N, 3] DC coefficients.
        f_rest: [N, 45] (or 9 / 0) higher-order coefficients.
        points: [N, 3] world positions.
        c2w: [4, 4] camera-to-world transform.

    Returns:
        [N, 3] RGB in (0, 1).
    """
    cam_pos = c2w[:3, 3]
    view_dir = points - cam_pos[None, :]
    # sqrt(max(.)) instead of linalg.norm: identical values (reference adds
    # +1e-8 to the norm), but d|v|/dv at v=0 is NaN and dead pool slots can
    # sit exactly at the camera position.
    sq = jnp.sum(view_dir * view_dir, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    view_dir = view_dir / (norm + 1e-8)
    coeffs = pack_sh_coeffs(f_dc, f_rest)  # [N, K, 3]
    basis = sh_basis(view_dir)[:, : coeffs.shape[1]]  # [N, K]
    raw = jnp.einsum("nk,nkc->nc", basis, coeffs, precision="highest")
    return jax.nn.sigmoid(raw)
