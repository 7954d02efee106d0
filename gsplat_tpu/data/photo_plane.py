"""Real-photograph textured-plane scenes with WARP-generated ground truth.

The reference's validated use-case is training on real photographs
(/root/reference/scripts/train.py:222-604 on Mip-NeRF 360 captures), which
needs network access this build environment does not have. This module
closes the *natural-image-statistics* half of that gap without any
download: take a real photograph, place it on a world-space plane, and
generate multi-view ground truth by PURE RAY-PLANE HOMOGRAPHY WARPING —
no gaussian renderer is involved in producing GT, so training against it
is a non-circular oracle (sharp edges, high-frequency texture, realistic
color statistics — the failure modes random-gaussian GT can't expose).

`make_photo_plane_scene` writes a standard prepared-format scene dir
(images/ + poses.npy + cam_meta.npy + pointcloud.npy), so the regular
`scripts/train.py` / `fit()` / `evaluate.py` pipeline runs on it
unchanged, including llffhold train/test splits.
"""

from __future__ import annotations

import os

import numpy as np

DEFAULT_PHOTO = "matplotlib"  # resolves to mpl's bundled real photograph


def load_photo(path_or_default: str = DEFAULT_PHOTO) -> np.ndarray:
    """Load a photo as float [H, W, 3] in [0, 1].

    "matplotlib" resolves to the library's bundled real photograph
    (grace_hopper.jpg, a public-domain US Navy portrait) — the only real
    photo shipped with this environment's packages.
    """
    if path_or_default == DEFAULT_PHOTO:
        import matplotlib.cbook as cbook

        path = cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
    else:
        path = path_or_default
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def warp_photo_view(
    photo: np.ndarray,
    c2w: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    height: int,
    width: int,
    plane_z: float = 4.0,
    half_h: float = 1.0,
    background: float = 0.0,
) -> np.ndarray:
    """Ground-truth view of the textured plane by ray-plane intersection.

    For every pixel, cast the camera ray, intersect the z = plane_z world
    plane, and bilinear-sample the photo (the plane spans [-half_w, half_w]
    x [-half_h, half_h] with half_w = half_h * aspect). Pixels whose rays
    miss the plane (or point away from it) get `background`. Pixel centers
    are at integer coordinates, matching the rasterizer's convention
    (ops/raster_pallas.py::_pixel_grid).
    """
    ht, wt = photo.shape[:2]
    half_w = half_h * (wt / ht)
    R = np.asarray(c2w[:3, :3], np.float64)
    o = np.asarray(c2w[:3, 3], np.float64)

    u = np.arange(width, dtype=np.float64)[None, :]
    v = np.arange(height, dtype=np.float64)[:, None]
    d_cam = np.stack(
        [
            np.broadcast_to((u - cx) / fx, (height, width)),
            np.broadcast_to((v - cy) / fy, (height, width)),
            np.ones((height, width)),
        ],
        axis=-1,
    )  # [H, W, 3]
    d_w = d_cam @ R.T
    dz = d_w[..., 2]
    t = np.where(np.abs(dz) > 1e-9, (plane_z - o[2]) / dz, -1.0)
    px = o[0] + t * d_w[..., 0]
    py = o[1] + t * d_w[..., 1]

    s = (px + half_w) / (2 * half_w) * (wt - 1)
    r = (py + half_h) / (2 * half_h) * (ht - 1)
    inside = (t > 0) & (s >= 0) & (s <= wt - 1) & (r >= 0) & (r <= ht - 1)
    s = np.clip(s, 0, wt - 1.000001)
    r = np.clip(r, 0, ht - 1.000001)
    s0 = s.astype(np.int64)
    r0 = r.astype(np.int64)
    fs = (s - s0)[..., None]
    fr = (r - r0)[..., None]
    p00 = photo[r0, s0]
    p01 = photo[r0, np.minimum(s0 + 1, wt - 1)]
    p10 = photo[np.minimum(r0 + 1, ht - 1), s0]
    p11 = photo[np.minimum(r0 + 1, ht - 1), np.minimum(s0 + 1, wt - 1)]
    img = (
        p00 * (1 - fs) * (1 - fr)
        + p01 * fs * (1 - fr)
        + p10 * (1 - fs) * fr
        + p11 * fs * fr
    )
    return np.where(inside[..., None], img, background).astype(np.float32)


def make_photo_plane_scene(
    out_dir: str,
    photo: np.ndarray | None = None,
    n_views: int = 16,
    height: int = 240,
    width: int = 320,
    plane_z: float = 4.0,
    half_h: float = 1.0,
    n_init_points: int = 4096,
    init_noise: float = 0.02,
    seed: int = 0,
) -> dict:
    """Write a prepared-format scene dir from warped real-photo views.

    Cameras form a forward-facing arc (LLFF-style) looking at the plane
    center; the init point cloud is a jittered grid on the plane with
    photo-sampled colors (mimicking an SfM point cloud of a planar scene).
    Returns {"fx", "fy", "cx", "cy", "n_views", ...}.
    """
    from ..viewer import look_at
    from .images import save_image

    if photo is None:
        photo = load_photo()
    rng = np.random.default_rng(seed)
    fx = fy = 0.9 * width
    cx, cy = width / 2.0, height / 2.0

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    poses = []
    target = np.array([0.0, 0.0, plane_z])
    for i in range(n_views):
        th = (i / max(n_views - 1, 1) - 0.5) * 0.9
        pos = np.array(
            [
                2.8 * np.sin(th),
                0.35 * np.sin(2.3 * th),
                plane_z - 2.8 * np.cos(th),
            ]
        )
        c2w = look_at(pos, target)
        img = warp_photo_view(
            photo, c2w, fx, fy, cx, cy, height, width,
            plane_z=plane_z, half_h=half_h,
        )
        save_image(os.path.join(out_dir, "images", f"{i:03d}.png"), img)
        poses.append(c2w.astype(np.float32))
    np.save(os.path.join(out_dir, "poses.npy"), np.stack(poses))
    np.save(
        os.path.join(out_dir, "cam_meta.npy"),
        {"fx": fx, "fy": fy, "cx": cx, "cy": cy},
    )

    # Init cloud: jittered grid on the plane, photo colors.
    ht, wt = photo.shape[:2]
    half_w = half_h * (wt / ht)
    g = int(np.sqrt(n_init_points))
    gx, gy = np.meshgrid(
        np.linspace(-half_w, half_w, g), np.linspace(-half_h, half_h, g)
    )
    pts = np.stack(
        [gx.ravel(), gy.ravel(), np.full(g * g, plane_z)], axis=-1
    )
    pts += rng.normal(0, init_noise, pts.shape)
    s = ((pts[:, 0] + half_w) / (2 * half_w) * (wt - 1)).clip(0, wt - 1)
    r = ((pts[:, 1] + half_h) / (2 * half_h) * (ht - 1)).clip(0, ht - 1)
    colors = photo[r.astype(int), s.astype(int)]
    cloud = np.concatenate([pts, colors], axis=-1).astype(np.float32)
    np.save(os.path.join(out_dir, "pointcloud.npy"), cloud)
    return {
        "fx": fx, "fy": fy, "cx": cx, "cy": cy,
        "n_views": n_views, "height": height, "width": width,
        "n_points": cloud.shape[0],
    }
