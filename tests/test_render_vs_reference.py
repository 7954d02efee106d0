"""Integration parity: full render + gradients vs the PyTorch reference.

This is the SURVEY §4 "gradient" gate: pixel values and pixel->parameter
gradients of the JAX renderer must match torch.autograd through the reference
render at small scale (BASELINE.json config 1 style: few hundred Gaussians,
128x128, CPU-runnable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import RenderConfig, render, render_from_params
from gsplat_tpu.ops import build_sigma_from_params, evaluate_sh
from gsplat_tpu.ops.gaussian import build_cov3d_packed
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.rasterize import rasterize_dense


def _reference_image(ref, torch, scene, camera, requires_grad=False):
    t = {
        k: torch.from_numpy(v.copy()).requires_grad_(requires_grad)
        for k, v in scene.items()
        if k != "c2w"
    }
    c2w = torch.from_numpy(scene["c2w"])
    sigma = ref.build_sigma_from_params(t["scale_raw"], t["q_raw"])
    colors = ref.evaluate_sh(t["f_dc"], t["f_rest"], t["pos"], c2w)
    img = ref.render(
        t["pos"], colors, t["opacity_raw"], sigma, c2w,
        camera["H"], camera["W"],
        camera["fx"], camera["fy"], camera["cx"], camera["cy"],
    )
    return img, t


def _our_cfg(camera, **kw):
    return RenderConfig(height=camera["H"], width=camera["W"], **kw)


def _params(scene):
    return {
        k: jnp.asarray(v)
        for k, v in scene.items()
        if k in ("pos", "scale_raw", "q_raw", "opacity_raw", "f_dc", "f_rest")
    }


def test_dense_rasterizer_matches_reference(ref, torch, scene, camera):
    ref_img, _ = _reference_image(ref, torch, scene, camera)
    cfg = _our_cfg(camera)
    params = _params(scene)
    cov3d = build_cov3d_packed(params["scale_raw"], params["q_raw"])
    colors = evaluate_sh(
        params["f_dc"], params["f_rest"], params["pos"], jnp.asarray(scene["c2w"])
    )
    proj = project_gaussians(
        params["pos"], cov3d, params["opacity_raw"], jnp.asarray(scene["c2w"]),
        camera["fx"], camera["fy"], camera["cx"], camera["cy"], cfg,
    )
    ours = np.asarray(rasterize_dense(proj, colors, cfg))
    err = np.abs(ours - ref_img.detach().numpy()).max()
    assert err < 2e-5, f"dense image max abs err {err}"


def test_tiled_render_matches_reference(ref, torch, scene, camera):
    ref_img, _ = _reference_image(ref, torch, scene, camera)
    params = _params(scene)
    sigma = build_sigma_from_params(params["scale_raw"], params["q_raw"])
    colors = evaluate_sh(
        params["f_dc"], params["f_rest"], params["pos"], jnp.asarray(scene["c2w"])
    )
    ours = np.asarray(
        render(
            params["pos"], colors, params["opacity_raw"], sigma,
            jnp.asarray(scene["c2w"]),
            camera["H"], camera["W"],
            camera["fx"], camera["fy"], camera["cx"], camera["cy"],
        )
    )
    err = np.abs(ours - ref_img.detach().numpy()).max()
    assert err < 2e-5, f"tiled image max abs err {err}"


def test_render_from_params_matches_reference(ref, torch, scene, camera):
    ref_img, _ = _reference_image(ref, torch, scene, camera)
    cfg = _our_cfg(camera)
    img, aux = render_from_params(
        _params(scene), jnp.asarray(scene["c2w"]),
        camera["fx"], camera["fy"], camera["cx"], camera["cy"], cfg,
    )
    assert int(aux.num_pairs) <= cfg.max_pairs
    err = np.abs(np.asarray(img) - ref_img.detach().numpy()).max()
    assert err < 2e-5, f"fused image max abs err {err}"


def test_gradients_match_reference(ref, torch, scene, camera):
    """BASELINE metric: pixel-gradient max abs err vs torch autograd."""
    ref_img, t = _reference_image(ref, torch, scene, camera, requires_grad=True)
    # Deterministic pixel weighting so the scalar probes every pixel.
    w_np = (
        np.linspace(0.3, 1.7, camera["H"] * camera["W"] * 3)
        .reshape(camera["H"], camera["W"], 3)
        .astype(np.float32)
    )
    (ref_img * torch.from_numpy(w_np)).sum().backward()

    cfg = _our_cfg(camera)
    c2w = jnp.asarray(scene["c2w"])
    weights = jnp.asarray(w_np)

    def scalar_fn(params):
        img, _ = render_from_params(
            params, c2w,
            camera["fx"], camera["fy"], camera["cx"], camera["cy"], cfg,
        )
        return jnp.sum(img * weights)

    grads = jax.grad(scalar_fn)(_params(scene))

    for name in ("pos", "scale_raw", "q_raw", "opacity_raw", "f_dc", "f_rest"):
        ref_grad = t[name].grad
        assert ref_grad is not None, name
        ref_g = ref_grad.numpy()
        our_g = np.asarray(grads[name])
        scale = max(np.abs(ref_g).max(), 1e-3)
        err = np.abs(our_g - ref_g).max()
        assert err / scale < 5e-4, (
            f"grad[{name}] max abs err {err} (scale {scale})"
        )


def test_empty_scene_renders_black(camera):
    cfg = _our_cfg(camera)
    n = 32
    params = {
        "pos": jnp.zeros((n, 3)) + jnp.asarray([0.0, 0.0, -10.0]),  # behind cam
        "scale_raw": jnp.full((n, 3), -2.0),
        "q_raw": jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        "opacity_raw": jnp.zeros((n,)),
        "f_dc": jnp.zeros((n, 3)),
        "f_rest": jnp.zeros((n, 45)),
    }
    img, aux = render_from_params(
        params, jnp.eye(4),
        camera["fx"], camera["fy"], camera["cx"], camera["cy"], cfg,
    )
    assert int(aux.num_pairs) == 0
    np.testing.assert_array_equal(np.asarray(img), 0.0)


@pytest.mark.parametrize("chunk", [1, 7, 64])
def test_tile_chunk_invariance(scene, camera, chunk):
    """Image must not depend on the tile_chunk memory knob."""
    params = _params(scene)
    c2w = jnp.asarray(scene["c2w"])
    base_cfg = _our_cfg(camera)
    img0, _ = render_from_params(
        params, c2w, camera["fx"], camera["fy"], camera["cx"], camera["cy"],
        base_cfg,
    )
    imgc, _ = render_from_params(
        params, c2w, camera["fx"], camera["fy"], camera["cx"], camera["cy"],
        base_cfg.with_(tile_chunk=chunk),
    )
    np.testing.assert_allclose(np.asarray(img0), np.asarray(imgc), atol=1e-6)
