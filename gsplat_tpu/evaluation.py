"""Quality evaluation: PSNR / SSIM over held-out views.

The reference reports only losses during training (train.py tqdm postfix);
novel-view-synthesis work standardly reports PSNR/SSIM on validation views —
this module adds that capability to the framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .ops.losses import ssim
from .render import render_from_params


def psnr(img: jnp.ndarray, ref: jnp.ndarray, max_val: float = 1.0):
    """Peak signal-to-noise ratio in dB."""
    mse = jnp.mean((img - ref) ** 2)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def evaluate_views(
    params: dict,
    views: list,
    cfg: RenderConfig,
    alive=None,
    render_batch: int = 1,
    mesh=None,
    auto_size: bool = True,
) -> dict:
    """Render each view and compare to ground truth.

    Args:
        views: list of dicts with image [H, W, 3], c2w, fx, fy, cx, cy
            (GaussianDataset items work directly).
        render_batch: views rendered per launch through the shared-binning
            batched path (identical images to per-view rendering up to the
            last ulp; the last chunk pads by repeating the final view).
        mesh: optional ('data', 'tile') device mesh — each launch shards its
            views over 'data' and splits frames into tile bands over 'tile'
            (parallel.make_sharded_batch_render). render_batch must be a
            multiple of the mesh's data size (defaults to it when 1).
        auto_size: probe the true pair demand of every view first (cheap
            binning-only graphs) and grow cfg.max_pairs / trunc_pairs to
            fit — an under-capacity EVALUATION silently drops the farthest
            gaussians and reports a collapsed score (a trained pool whose
            fit() auto-grew past the caller's cfg scored 11 dB instead of
            its true 22 dB in round 5). The demand and the capacity used
            are reported in the result.

    Returns:
        dict with per-view and mean psnr/ssim/l1 (+ eval capacity info).
    """
    imgs = []
    max_demand = 0
    if auto_size:
        from .render import pair_demand

        @jax.jit
        def probe(c2w, fx, fy, cx, cy):
            d = pair_demand(params, c2w, fx, fy, cx, cy, cfg, alive=alive)
            return d[0], d[2]

        max_trunc = 0
        for v in views:
            d0, d2 = probe(
                jnp.asarray(v["c2w"]), jnp.float32(v["fx"]),
                jnp.float32(v["fy"]), jnp.float32(v["cx"]),
                jnp.float32(v["cy"]),
            )
            max_demand = max(max_demand, int(d0))
            max_trunc = max(max_trunc, int(d2))

        def _rup(x):
            return -(-int(x * 1.1) // 4096) * 4096

        upd = {}
        if max_demand > cfg.max_pairs:
            upd["max_pairs"] = _rup(max_demand)
        if cfg.tile_rank_cap and max_trunc > cfg.trunc_pairs:
            upd["trunc_pairs"] = _rup(max_trunc)
        if upd:
            cfg = cfg.with_(**upd)
    if mesh is not None and render_batch == 1:
        render_batch = mesh.shape["data"]
    if render_batch > 1:
        from .render import render_batch_from_params

        if mesh is not None:
            from .parallel import make_sharded_batch_render

            sfn = make_sharded_batch_render(cfg, mesh)
            n_slots = params["pos"].shape[0]
            alive_m = (jnp.ones((n_slots,), bool) if alive is None
                       else jnp.asarray(alive))

            def render_chunk(c2w, fx, fy, cx, cy):
                return sfn(params, alive_m, c2w, fx, fy, cx, cy)
        else:

            @jax.jit
            def render_chunk(c2w, fx, fy, cx, cy):
                out, _ = render_batch_from_params(
                    params, c2w, fx, fy, cx, cy, cfg, alive=alive
                )
                return out

        B = render_batch
        for s in range(0, len(views), B):
            chunk = views[s : s + B]
            real = len(chunk)
            chunk = chunk + [chunk[-1]] * (B - real)
            field = lambda k: jnp.asarray(
                np.stack([np.asarray(v[k], np.float32) for v in chunk])
            )
            out = render_chunk(
                field("c2w"), field("fx"), field("fy"), field("cx"),
                field("cy"),
            )
            imgs.extend(out[i] for i in range(real))
    else:

        @jax.jit
        def render_one(c2w, fx, fy, cx, cy):
            img, _ = render_from_params(
                params, c2w, fx, fy, cx, cy, cfg, alive=alive
            )
            return img

        for v in views:
            imgs.append(
                render_one(
                    jnp.asarray(v["c2w"]),
                    jnp.float32(v["fx"]),
                    jnp.float32(v["fy"]),
                    jnp.float32(v["cx"]),
                    jnp.float32(v["cy"]),
                )
            )

    per_view = []
    for v, img in zip(views, imgs):
        gt = jnp.asarray(v["image"])
        per_view.append(
            {
                "psnr": float(psnr(img, gt)),
                "ssim": float(ssim(img, gt)),
                "l1": float(jnp.mean(jnp.abs(img - gt))),
            }
        )
    return {
        "psnr": float(np.mean([v["psnr"] for v in per_view])),
        "ssim": float(np.mean([v["ssim"] for v in per_view])),
        "l1": float(np.mean([v["l1"] for v in per_view])),
        "per_view": per_view,
        "num_views": len(per_view),
        "max_pair_demand": max_demand,
        "eval_max_pairs": cfg.max_pairs,
    }
