"""Stage-level timing of the render pipeline on the current device."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from bench import make_scene
from gsplat_tpu import RenderConfig
from gsplat_tpu.ops.binning import bin_gaussians
from gsplat_tpu.ops.gaussian import build_cov3d_packed
from gsplat_tpu.ops.projection import project_gaussians
from gsplat_tpu.ops.rasterize import rasterize_binned
from gsplat_tpu.ops.sh import evaluate_sh


def _sync(out):
    """Host-fetch one scalar: on axon, block_until_ready can NO-OP on a
    re-dispatched executable (CLAUDE.md) — a device->host copy cannot."""
    x = jax.tree.leaves(out)[0]
    float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cull_mode", default="rect",
                    choices=("rect", "ellipse"))
    ap.add_argument("--max_pairs", type=int, default=5 * 2**19)
    ap.add_argument("--max_rows", type=int, default=0)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--checkpoint", default=None,
                    help="profile a trained .npz pool instead of the "
                         "synthetic scene")
    ap.add_argument("--tile_rank_cap", type=int, default=0,
                    help="per-tile rank truncation; trunc_pairs is "
                         "demand-sized from one probe binning run")
    ap.add_argument("--auto_pairs", action="store_true",
                    help="size max_pairs to 1.2x the probe's (post-cull) "
                         "pair demand, like the serving CLI")
    ap.add_argument("--bwd_pairs", type=int, default=0,
                    help="saturation-compacted backward capacity "
                         "(-1 = size from the probe render's bwd_demand)")
    args = ap.parse_args()

    n = 2**17
    cfg = RenderConfig(height=args.height, width=args.width,
                       max_pairs=args.max_pairs,
                       max_per_tile=2048, tile_chunk=32,
                       cull_mode=args.cull_mode, max_rows=args.max_rows,
                       tile_rank_cap=args.tile_rank_cap)
    params = make_scene(n)
    alive = None
    if args.checkpoint:
        from gsplat_tpu.train.trainer import restore_pool

        pool = restore_pool(args.checkpoint)
        params, alive = pool.params, pool.alive
        n = params["pos"].shape[0]
        from gsplat_tpu.viewer import estimate_scene_center_radius, look_at

        pos = np.asarray(params["pos"])[np.asarray(alive)]
        center, radius = estimate_scene_center_radius(positions=pos)
        cam = center + np.array([0.0, -0.6 * radius, -4.4 * radius])
        c2w = jnp.asarray(look_at(cam, center))
    else:
        c2w = jnp.eye(4)
    fx = fy = jnp.float32(0.85 * args.width)
    cx = jnp.float32(args.width / 2.0)
    cy = jnp.float32(args.height / 2.0)

    if args.tile_rank_cap or args.auto_pairs:
        # Demand-size the static capacities from one probe binning run
        # (what --auto_pairs does in the serving CLI).
        pcov = jax.jit(
            lambda p: build_cov3d_packed(p["scale_raw"], p["q_raw"])
        )(params)
        pproj = jax.jit(lambda p, cov: project_gaussians(
            p["pos"], cov, p["opacity_raw"], c2w, fx, fy, cx, cy, cfg,
            extra_valid=alive))(params, pcov)
        probe = jax.jit(
            lambda pr: (lambda b: (b.trunc_demand, b.num_pairs))(
                bin_gaussians(pr, cfg)
            )
        )(pproj)
        if args.tile_rank_cap:
            td = int(probe[0])
            cfg = cfg.with_(
                trunc_pairs=max(4096, -(-int(td * 1.2) // 4096) * 4096)
            )
            print(f"trunc slot demand {td} -> trunc_pairs {cfg.trunc_pairs}")
        if args.auto_pairs:
            pd = int(probe[1])
            cfg = cfg.with_(
                max_pairs=max(4096, -(-int(pd * 1.2) // 4096) * 4096)
            )
            print(f"pair demand {pd} -> max_pairs {cfg.max_pairs}")

    if args.bwd_pairs == -1:
        # Size from the probe render's active-block demand.
        from gsplat_tpu import render_from_params as _rfp

        _, paux = jax.jit(
            lambda p: _rfp(p, c2w, fx, fy, cx, cy, cfg, alive=alive)
        )(params)
        bd = int(paux.bwd_demand)
        cfg = cfg.with_(
            bwd_pairs=max(4096, -(-int(bd * 1.2) // 4096) * 4096)
        )
        print(f"bwd demand {bd} -> bwd_pairs {cfg.bwd_pairs}")
    elif args.bwd_pairs:
        cfg = cfg.with_(bwd_pairs=args.bwd_pairs)

    cov_fn = jax.jit(lambda p: build_cov3d_packed(p["scale_raw"], p["q_raw"]))
    sh_fn = jax.jit(lambda p: evaluate_sh(p["f_dc"], p["f_rest"], p["pos"], c2w))
    proj_fn = jax.jit(lambda p, cov: project_gaussians(
        p["pos"], cov, p["opacity_raw"], c2w, fx, fy, cx, cy, cfg,
        extra_valid=alive))
    bin_fn = jax.jit(lambda pr: bin_gaussians(pr, cfg))
    rast_fn = jax.jit(lambda pr, col, b: rasterize_binned(pr, col, b, cfg))

    t_cov, cov = timeit(cov_fn, params)
    t_sh, colors = timeit(sh_fn, params)
    t_proj, proj = timeit(proj_fn, params, cov)
    t_bin, binning = timeit(bin_fn, proj)
    t_rast, (img, aux) = timeit(rast_fn, proj, colors, binning)

    # Backward stages: grad of sum(img) w.r.t. the gathered pair features
    # (kernel fwd+bwd + reduction) and w.r.t. params (full pipeline).
    from gsplat_tpu.ops.rasterize import gather_pair_features, _pair_features
    from gsplat_tpu import render_from_params

    def to_pf(p):
        cov = build_cov3d_packed(p["scale_raw"], p["q_raw"])
        col = evaluate_sh(p["f_dc"], p["f_rest"], p["pos"], c2w)
        pr = project_gaussians(p["pos"], cov, p["opacity_raw"], c2w,
                               fx, fy, cx, cy, cfg, extra_valid=alive)
        b = bin_gaussians(pr, cfg)
        f10 = _pair_features(pr, col, jnp.float32)[b.depth_order]
        return gather_pair_features(cfg.max_pairs, cfg.tile_rank_cap > 0,
                                    cfg.bwd_pairs, f10, b.pair_slot,
                                    b.gauss_offsets)

    t_pf_fwd, _ = timeit(jax.jit(lambda p: to_pf(p).sum()), params)
    t_pf_bwd, _ = timeit(
        jax.jit(jax.grad(lambda p: to_pf(p).sum())), params
    )
    t_full_fwd, _ = timeit(
        jax.jit(lambda p: render_from_params(
            p, c2w, fx, fy, cx, cy, cfg, alive=alive)[0].sum()), params
    )
    t_full_bwd, _ = timeit(
        jax.jit(jax.grad(lambda p: render_from_params(
            p, c2w, fx, fy, cx, cy, cfg, alive=alive)[0].sum())), params
    )

    print(f"cov3d:     {t_cov*1e3:8.2f} ms")
    print(f"sh:        {t_sh*1e3:8.2f} ms")
    print(f"project:   {t_proj*1e3:8.2f} ms")
    print(f"binning:   {t_bin*1e3:8.2f} ms")
    print(f"rasterize: {t_rast*1e3:8.2f} ms")
    total = t_cov + t_sh + t_proj + t_bin + t_rast
    print(f"total:     {total*1e3:8.2f} ms  ({1/total:.2f} FPS)")
    print(f"pairs={int(aux.num_pairs)} max_tile={int(aux.max_tile_count)}")
    print(f"image mean {float(img.mean()):.4f}")
    print("--- pipeline cuts (single jit graphs) ---")
    print(f"fwd to pair_feat:        {t_pf_fwd*1e3:8.2f} ms")
    print(f"fwd+bwd to pair_feat:    {t_pf_bwd*1e3:8.2f} ms")
    print(f"fwd full:                {t_full_fwd*1e3:8.2f} ms")
    print(f"fwd+bwd full:            {t_full_bwd*1e3:8.2f} ms")
    print(f"  kernel fwd (full-pf):  {(t_full_fwd-t_pf_fwd)*1e3:8.2f} ms")
    print(f"  kernel+reduce bwd:     {(t_full_bwd-t_pf_bwd)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
