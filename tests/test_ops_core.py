"""Unit parity tests: core math ops vs the PyTorch reference oracle."""

import jax.numpy as jnp
import numpy as np

from gsplat_tpu.ops import (
    build_sigma_from_params,
    check_frustum_camera_space,
    evaluate_sh,
    inv2x2,
    project_points,
    quat_to_rotmat,
    scale_intrinsics,
    sh_basis,
    transform_to_camera_space,
)
from gsplat_tpu.ops.gaussian import build_cov3d_packed, pack_cov3d, unpack_cov3d


def test_quat_to_rotmat_matches_reference(ref, torch, scene):
    q = scene["q_raw"]
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quat_to_rotmat(jnp.asarray(qn)))
    theirs = ref.quat_to_rotmat(torch.from_numpy(qn)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_quat_to_rotmat_is_rotation(scene):
    q = scene["q_raw"] / np.linalg.norm(scene["q_raw"], axis=-1, keepdims=True)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_build_sigma_matches_reference(ref, torch, scene):
    ours = np.asarray(
        build_sigma_from_params(
            jnp.asarray(scene["scale_raw"]), jnp.asarray(scene["q_raw"])
        )
    )
    theirs = ref.build_sigma_from_params(
        torch.from_numpy(scene["scale_raw"]), torch.from_numpy(scene["q_raw"])
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_cov3d_pack_roundtrip(scene):
    sigma = build_sigma_from_params(
        jnp.asarray(scene["scale_raw"]), jnp.asarray(scene["q_raw"])
    )
    packed = pack_cov3d(sigma)
    # pack/unpack symmetrizes; sigma itself is symmetric only to f32 rounding.
    np.testing.assert_allclose(
        np.asarray(unpack_cov3d(packed)), np.asarray(sigma), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(
            build_cov3d_packed(
                jnp.asarray(scene["scale_raw"]), jnp.asarray(scene["q_raw"])
            )
        ),
        np.asarray(packed),
        atol=1e-7,
    )


def test_sh_basis_orthogonality_scale():
    # Y0 must be the DC constant.
    d = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
    basis = np.asarray(sh_basis(jnp.asarray(d)))[0]
    assert abs(basis[0] - 0.28209479) < 1e-6


def test_evaluate_sh_matches_reference(ref, torch, scene):
    ours = np.asarray(
        evaluate_sh(
            jnp.asarray(scene["f_dc"]),
            jnp.asarray(scene["f_rest"]),
            jnp.asarray(scene["pos"]),
            jnp.asarray(scene["c2w"]),
        )
    )
    theirs = ref.evaluate_sh(
        torch.from_numpy(scene["f_dc"]),
        torch.from_numpy(scene["f_rest"]),
        torch.from_numpy(scene["pos"]),
        torch.from_numpy(scene["c2w"]),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_transform_and_project_match_reference(ref, torch, scene, camera):
    from gaussian_splatting.utils import transform_to_camera_space as ref_transform

    pc = jnp.asarray(scene["pos"])
    c2w = jnp.asarray(scene["c2w"])
    x, y, z = transform_to_camera_space(pc, c2w)
    tx, ty, tz = ref_transform(
        torch.from_numpy(scene["pos"]), torch.from_numpy(scene["c2w"])
    )
    np.testing.assert_allclose(np.asarray(x), tx.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), tz.numpy(), atol=1e-5)

    uv, px, py, pz = project_points(
        pc, c2w, camera["fx"], camera["fy"], camera["cx"], camera["cy"]
    )
    tuv, _, _, _ = ref.project_points(
        torch.from_numpy(scene["pos"]),
        torch.from_numpy(scene["c2w"]),
        camera["fx"],
        camera["fy"],
        camera["cx"],
        camera["cy"],
    )
    np.testing.assert_allclose(np.asarray(uv), tuv.numpy(), atol=1e-3)


def test_frustum_matches_reference(torch, scene, camera):
    import sys

    sys.path.insert(0, "/root/reference")
    from gaussian_splatting.utils import (
        check_frustum_camera_space as ref_frustum,
        transform_to_camera_space as ref_transform,
    )

    pc = jnp.asarray(scene["pos"])
    c2w = jnp.asarray(scene["c2w"])
    x, y, z = transform_to_camera_space(pc, c2w)
    ours = np.asarray(
        check_frustum_camera_space(
            x, y, z, camera["fx"], camera["fy"], camera["cx"], camera["cy"],
            camera["H"], camera["W"], 0.01, 100.0, 32,
        )
    )
    tx, ty, tz = ref_transform(
        torch.from_numpy(scene["pos"]), torch.from_numpy(scene["c2w"])
    )
    theirs = ref_frustum(
        tx, ty, tz, camera["fx"], camera["fy"], camera["cx"], camera["cy"],
        camera["H"], camera["W"], 0.01, 100.0, 32,
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_inv2x2_matches_reference(ref, torch, rng):
    m = rng.normal(0, 1, (64, 2, 2)).astype(np.float32)
    m = m @ np.swapaxes(m, 1, 2) + 0.1 * np.eye(2, dtype=np.float32)
    ours = np.asarray(inv2x2(jnp.asarray(m)))
    theirs = ref.inv2x2(torch.from_numpy(m)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)


def test_scale_intrinsics_matches_reference(ref):
    ours = scale_intrinsics(540, 960, 1080, 1920, 1000.0, 990.0, 960.0, 540.0)
    theirs = ref.scale_intrinsics(540, 960, 1080, 1920, 1000.0, 990.0, 960.0, 540.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs))


def test_antialiasing_modes():
    """aa_mode='dilate' low-passes Sigma2D; 'mip' additionally compensates
    opacity so sub-pixel splats do not GAIN energy from dilation
    (Mip-Splatting Eq. 6). Default 'none' keeps reference parity."""
    import jax

    from gsplat_tpu import RenderConfig, render_from_params

    rng = np.random.default_rng(5)
    n = 300
    params = {
        "pos": jnp.asarray(
            np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(3, 6, n)], -1), jnp.float32
        ),
        # Tiny splats (sub-pixel after projection): the aliasing-prone case.
        "scale_raw": jnp.asarray(rng.normal(0, 0.2, (n, 3)) - 4.5,
                                 jnp.float32),
        "q_raw": jnp.asarray(rng.normal(0, 1, (n, 4)) + [0, 0, 0, 2.0],
                             jnp.float32),
        "opacity_raw": jnp.asarray(rng.normal(1.5, 0.5, n), jnp.float32),
        "f_dc": jnp.asarray(rng.uniform(0.3, 0.9, (n, 3)), jnp.float32),
        "f_rest": jnp.asarray(np.zeros((n, 45), np.float32)),
    }
    c2w = jnp.eye(4)
    base = dict(height=96, width=96, max_pairs=2**13, max_per_tile=256,
                backend="xla")
    imgs = {}
    for mode in ("none", "dilate", "mip"):
        cfg = RenderConfig(aa_mode=mode, **base)
        img, _ = render_from_params(params, c2w, 90.0, 90.0, 48.0, 48.0, cfg)
        imgs[mode] = np.asarray(img)
        assert np.isfinite(imgs[mode]).all(), mode

    # Dilation spreads tiny splats -> more covered pixels / energy.
    assert imgs["dilate"].sum() > imgs["none"].sum()
    # Mip compensation removes the spurious energy gain.
    assert imgs["mip"].sum() < imgs["dilate"].sum()
    # All modes stay differentiable.
    cfg = RenderConfig(aa_mode="mip", **base)
    g = jax.grad(
        lambda p: render_from_params(
            p, c2w, 90.0, 90.0, 48.0, 48.0, cfg
        )[0].sum()
    )(params)
    assert all(bool(jnp.isfinite(v).all()) for v in g.values())


def test_background_compositing():
    """cfg.background composites bg where transmittance remains:
    img_bg == img_black + (1 - alpha) * bg, empty scenes render solid bg,
    and gradients flow through the alpha plane."""
    import jax

    from gsplat_tpu import RenderConfig, render_from_params

    rng = np.random.default_rng(11)
    n = 200
    params = {
        "pos": jnp.asarray(
            np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(3, 6, n)], -1), jnp.float32
        ),
        "scale_raw": jnp.asarray(rng.normal(0, 0.3, (n, 3)) - 2.5,
                                 jnp.float32),
        "q_raw": jnp.asarray(rng.normal(0, 1, (n, 4)) + [0, 0, 0, 2.0],
                             jnp.float32),
        "opacity_raw": jnp.asarray(rng.normal(0.5, 1.0, n), jnp.float32),
        "f_dc": jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32),
        "f_rest": jnp.asarray(np.zeros((n, 45), np.float32)),
    }
    c2w = jnp.eye(4)
    base = dict(height=96, width=96, max_pairs=2**13, max_per_tile=256,
                backend="xla")
    black, aux = render_from_params(
        params, c2w, 90.0, 90.0, 48.0, 48.0, RenderConfig(**base)
    )
    bg = (0.2, 0.5, 1.0)
    cfg_bg = RenderConfig(background=bg, **base)
    tinted, _ = render_from_params(params, c2w, 90.0, 90.0, 48.0, 48.0,
                                   cfg_bg)
    expect = np.asarray(black) + (
        1.0 - np.asarray(aux.alpha)
    )[..., None] * np.asarray(bg, np.float32)
    np.testing.assert_allclose(np.asarray(tinted), expect, atol=1e-6)

    # Empty scene -> solid background.
    dead = dict(params)
    dead["opacity_raw"] = jnp.full((n,), -50.0)
    white, _ = render_from_params(
        dead, c2w, 90.0, 90.0, 48.0, 48.0,
        RenderConfig(background=(1.0, 1.0, 1.0), **base),
    )
    np.testing.assert_allclose(np.asarray(white), 1.0, atol=1e-6)

    # Differentiable: a white background penalizes transparency, so
    # opacity gradients must be nonzero and finite.
    g = jax.grad(
        lambda p: render_from_params(
            p, c2w, 90.0, 90.0, 48.0, 48.0,
            RenderConfig(background=(1.0, 1.0, 1.0), **base),
        )[0].sum()
    )(params)
    assert all(bool(jnp.isfinite(v).all()) for v in g.values())
    assert float(jnp.abs(g["opacity_raw"]).max()) > 0
