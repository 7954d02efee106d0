#!/usr/bin/env python
"""Render a trained model: training views, an orbit video, FPS benchmark.

CLI counterpart of /root/reference/scripts/render_trained.py:479-518.
Checkpoints are the trainer's .npz pool files; legacy six-tensor .pt
checkpoints from the reference are also accepted (torch cpu load).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def resolve_checkpoint(path_or_dir: str) -> str:
    """final > explicit file > latest iteration (reference :117-161)."""
    if os.path.isfile(path_or_dir):
        return path_or_dir
    final = os.path.join(path_or_dir, "checkpoint_final.npz")
    if os.path.exists(final):
        return final
    cands = sorted(glob.glob(os.path.join(path_or_dir, "checkpoint_*.npz")))
    if cands:
        return cands[-1]
    raise FileNotFoundError(f"no checkpoint under {path_or_dir}")


def load_params(path: str):
    """Load (params dict, alive mask) from a .npz pool, a standard 3DGS
    .ply (scenes trained by other tools), or legacy reference .pt files."""
    import jax.numpy as jnp

    if path.endswith(".ply"):
        from gsplat_tpu.data.gsply import import_gaussians_ply

        params = import_gaussians_ply(path)
        return {k: jnp.asarray(v) for k, v in params.items()}, None
    if path.endswith(".npz"):
        from gsplat_tpu.models.gaussians import GaussianPool
        from gsplat_tpu.train.trainer import restore_pool

        pool = restore_pool(path)
        return pool.params, pool.alive
    # Legacy reference format: six individual .pt tensors in one dir.
    import torch

    d = os.path.dirname(path) if os.path.isfile(path) else path
    names = {
        "pos": "positions.pt", "scale_raw": "scales.pt",
        "q_raw": "rotations.pt", "opacity_raw": "opacities.pt",
        "f_dc": "features_dc.pt", "f_rest": "features_rest.pt",
    }
    params = {}
    for k, fn in names.items():
        t = torch.load(os.path.join(d, fn), map_location="cpu",
                       weights_only=True)
        params[k] = jnp.asarray(np.asarray(t, np.float32))
    return params, None


def apply_resolution_override(H, W, fx, fy, cx, cy, height=None, width=None):
    """Apply CLI --height/--width, rescaling intrinsics to keep the FOV
    (reference render_trained.py:195-203 via scale_intrinsics)."""
    if (height and height != H) or (width and width != W):
        from gsplat_tpu.ops.camera import scale_intrinsics

        H_new = height or H
        W_new = width or W
        fx, fy, cx, cy = scale_intrinsics(H_new, W_new, H, W, fx, fy, cx, cy)
        H, W = H_new, W_new
    return H, W, fx, fy, cx, cy


def main():

    from gsplat_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # big Pallas graphs; recompiles -> disk loads
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help=".npz checkpoint file or output dir")
    p.add_argument("--data_dir", default=None,
                   help="dataset dir (for camera intrinsics + orbit center)")
    p.add_argument("--output_dir", default="renders")
    p.add_argument("--num_frames", type=int, default=120)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--scale_factor", type=float, default=1.0)
    p.add_argument("--elevation", type=float, default=15.0)
    p.add_argument("--orbit_scale", type=float, default=1.0,
                   help="orbit camera distance as a multiple of the "
                        "estimated scene radius (1.0 = the reference's "
                        "convention; larger values frame the whole scene "
                        "and demand far fewer pairs)")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--max_pairs", type=int, default=2**21)
    p.add_argument("--benchmark_only", action="store_true",
                   help="skip image/video IO, print FPS stats only")
    p.add_argument("--render_training_views", action="store_true")
    p.add_argument("--save_depth", action="store_true",
                   help="also write normalized depth maps for orbit frames")
    p.add_argument("--export_ply", default=None,
                   help="also write the gaussians as a standard 3DGS PLY "
                        "(loadable by public splat viewers)")
    p.add_argument("--export_splat", default=None,
                   help="also write a .splat file (antimatter15 web-viewer "
                        "format, 32 bytes/gaussian)")
    p.add_argument("--ply_external_colors", action="store_true",
                   help="remap the DC color term for INRIA-convention "
                        "viewers (approximate for view-dependent color)")
    p.add_argument("--backend", default="auto",
                   choices=("auto", "pallas", "xla"))
    p.add_argument("--render_batch", type=int, default=1,
                   help="poses rendered per launch via the shared-binning "
                        "batched path (1 = per-pose rendering)")
    p.add_argument("--spmd", action="store_true",
                   help="render the orbit over ALL devices: poses shard "
                        "over the mesh 'data' axis, each frame splits into "
                        "--spmd_bands horizontal bands (requires "
                        "--render_batch, a multiple of the data size)")
    p.add_argument("--spmd_bands", type=int, default=1,
                   help="tile-band ('tile' mesh axis) size under --spmd")
    p.add_argument("--auto_pairs", action="store_true",
                   help="probe the orbit's true pair demand (binning-only "
                        "graph) and shrink max_pairs/max_rows to demand "
                        "+20%% before rendering — --max_pairs becomes the "
                        "probe upper bound")
    p.add_argument("--bucket_pairs", type=int, default=0,
                   help="per-frame capacity bucketing: probe every orbit "
                        "pose's demand, build a /2 ladder of N demand-sized "
                        "configs (clamped at --max_pairs), and render each "
                        "frame at the smallest rung that fits — distant "
                        "frames stop paying close-up binning cost. "
                        "Subsumes --auto_pairs. 0 = off")
    p.add_argument("--cull_mode", default="rect",
                   choices=("rect", "ellipse"),
                   help="tile culling granularity (ellipse: exact per-row "
                        "intervals, fewer pairs, identical images)")
    p.add_argument("--cull_chunks", type=int, default=64,
                   help="depth chunks of the pre-sort occlusion cull's rank "
                        "bound (more = tighter bound, bigger count grids)")
    p.add_argument("--tile_rank_cap", type=int, default=0,
                   help="keep only the front-most K pairs per tile (trained "
                        "scenes: K=1024 keeps ~22%% of pairs at image error "
                        "~3e-7 — deep-ranked pairs are occluded); combine "
                        "with --auto_pairs to shrink the static capacities "
                        "to the truncated demand. 0 = exact")
    p.add_argument("--transmittance_math", default="cumprod",
                   choices=("log", "cumprod"))
    p.add_argument("--background", default="black",
                   help="render background: 'black' (reference parity), "
                        "'white' (Blender-style), or 'r,g,b'")
    p.add_argument("--aa_mode", default="none",
                   choices=("none", "dilate", "mip"),
                   help="screen-space antialiasing: 'dilate' adds the 0.3 px "
                        "low-pass, 'mip' also energy-compensates opacity "
                        "(Mip-Splatting Eq. 6)")
    args = p.parse_args()

    import jax.numpy as jnp

    from gsplat_tpu import RenderConfig
    from gsplat_tpu.config import parse_background
    from gsplat_tpu.viewer import (
        create_orbit_trajectory,
        estimate_scene_center_radius,
        make_render_fn,
        render_trajectory,
        save_video,
    )

    ckpt = resolve_checkpoint(args.checkpoint)
    print(f"checkpoint: {ckpt}")
    params, alive = load_params(ckpt)
    n = params["pos"].shape[0]
    n_alive = int(np.asarray(alive).sum()) if alive is not None else n
    print(f"{n_alive} gaussians (pool capacity {n})")

    # Camera: dataset intrinsics when available, else a generic pinhole.
    c2ws = None
    if args.data_dir:
        from gsplat_tpu.data import GaussianDataset

        ds = GaussianDataset(args.data_dir, scale_factor=args.scale_factor)
        H, W = ds.height, ds.width
        fx, fy, cx, cy = ds.fx, ds.fy, ds.cx, ds.cy
        c2ws = ds.c2w
    else:
        H = args.height or 1080
        W = args.width or 1920
        fx = fy = 0.85 * W
        cx, cy = W / 2.0, H / 2.0
    H, W, fx, fy, cx, cy = apply_resolution_override(
        H, W, fx, fy, cx, cy, args.height, args.width
    )

    cfg = RenderConfig(height=H, width=W, max_pairs=args.max_pairs,
                       backend=args.backend, cull_mode=args.cull_mode,
                       tile_rank_cap=args.tile_rank_cap,
                       cull_chunks=args.cull_chunks,
                       transmittance_math=args.transmittance_math,
                       aa_mode=args.aa_mode,
                       background=parse_background(args.background))

    if args.auto_pairs:
        # Demand-driven capacity: probe the orbit's true pair demand with a
        # binning-only graph (cheap compile, no kernel), then shrink the
        # static capacities to demand + 20% — every pairs-sized sort /
        # gather / kernel launch then runs at the workload's actual size
        # instead of the CLI upper bound.
        import jax

        from gsplat_tpu import pair_demand
        from gsplat_tpu.viewer import (
            create_orbit_trajectory as _orbit,
            estimate_scene_center_radius as _cr,
        )

        _center, _radius = _cr(
            c2w_matrices=c2ws,
            positions=np.asarray(params["pos"])[: n_alive],
        )
        probe_traj = _orbit(_center, _radius * args.orbit_scale,
                            num_frames=min(args.num_frames, 16),
                            elevation_deg=args.elevation)
        probe = jax.jit(lambda c: pair_demand(
            params, c, fx, fy, cx, cy, cfg, alive=alive))
        demands = [
            tuple(int(x) for x in probe(jnp.asarray(c)))
            for c in probe_traj
        ]
        pk = max(d[0] for d in demands)
        rk = max(d[1] for d in demands)
        tk = max(d[2] for d in demands)
        new_pairs = max(4096, -(-int(pk * 1.2) // 4096) * 4096)
        if new_pairs > args.max_pairs:
            # NEVER grow past the CLI bound: binning cost scales with
            # max_pairs (the r4 queue measured 300 ms/frame at an
            # auto-grown 46M), and capacity overflow is reported by the
            # render loop — dropping the farthest splats on extreme
            # close-ins is the better serving tradeoff.
            print(f"auto_pairs: demand {pk} exceeds --max_pairs "
                  f"{args.max_pairs}; clamping (farthest splats drop on "
                  f"overflow frames — raise --max_pairs for exactness)")
            new_pairs = args.max_pairs
        kw = {"max_pairs": new_pairs}
        if cfg.cull_mode == "ellipse":
            kw["max_rows"] = max(4096, -(-int(rk * 1.2) // 4096) * 4096)
        if cfg.tile_rank_cap:
            # Truncated-slot demand sizes the compacted list the gather
            # and kernel actually run on.
            kw["trunc_pairs"] = max(4096, -(-int(tk * 1.2) // 4096) * 4096)
        print(f"auto_pairs: demand {pk} pairs"
              + (f" / {rk} rows" if cfg.cull_mode == "ellipse" else "")
              + (f" / {tk} truncated" if cfg.tile_rank_cap else "")
              + f" -> capacities {kw}")
        cfg = cfg.with_(**kw)

    render_fn = make_render_fn(params, cfg, fx, fy, cx, cy, alive=alive)

    os.makedirs(args.output_dir, exist_ok=True)

    if args.export_ply:
        from gsplat_tpu.data.gsply import export_gaussians_ply

        n_written = export_gaussians_ply(
            args.export_ply,
            {k: np.asarray(v) for k, v in params.items()},
            alive=None if alive is None else np.asarray(alive),
            convert_colors=args.ply_external_colors,
        )
        print(f"exported {n_written} gaussians to {args.export_ply}")

    if args.export_splat:
        from gsplat_tpu.data.gsply import export_gaussians_splat

        n_written = export_gaussians_splat(
            args.export_splat,
            {k: np.asarray(v) for k, v in params.items()},
            alive=None if alive is None else np.asarray(alive),
        )
        print(f"exported {n_written} gaussians to {args.export_splat}")

    if args.render_training_views and c2ws is not None:
        from gsplat_tpu.data.images import save_image

        for i, c2w in enumerate(c2ws[:10]):
            img = np.asarray(render_fn(c2w))
            save_image(
                os.path.join(args.output_dir, f"train_view_{i:03d}.png"), img
            )
        print(f"rendered {min(len(c2ws), 10)} training views")

    center, radius = estimate_scene_center_radius(
        c2w_matrices=c2ws,
        positions=np.asarray(params["pos"])[: n_alive],
    )
    print(f"orbit: center {np.round(center, 2)}, radius {radius:.2f}")
    traj = create_orbit_trajectory(
        center, radius * args.orbit_scale, num_frames=args.num_frames,
        elevation_deg=args.elevation,
    )

    keep_frames = not args.benchmark_only
    if args.render_batch > 1 or args.spmd:
        from gsplat_tpu.viewer import make_batch_render_fn

        if args.spmd:
            import jax

            from gsplat_tpu.parallel import (
                make_mesh,
                make_sharded_batch_render,
            )

            mesh = make_mesh(tile=args.spmd_bands)
            print(f"SPMD orbit: mesh {dict(mesh.shape)} over "
                  f"{len(jax.devices())} devices")
            if args.render_batch == 1:
                args.render_batch = mesh.shape["data"]
            if args.render_batch % mesh.shape["data"]:
                p.error("--render_batch must be a multiple of the mesh's "
                        "data axis")
            sfn = make_sharded_batch_render(cfg, mesh)
            alive_m = (jnp.ones((n,), bool) if alive is None
                       else jnp.asarray(alive))

            def batch_fn(c2w_b):
                return sfn(params, alive_m, jnp.asarray(c2w_b),
                           fx, fy, cx, cy)
        else:
            batch_fn = make_batch_render_fn(
                params, cfg, fx, fy, cx, cy, alive=alive,
                batch=args.render_batch, report_demand=True,
            )
        frames, stats = render_trajectory(
            batch_fn, traj, batch_size=args.render_batch,
            keep_frames=keep_frames,
            pair_capacity=args.render_batch * cfg.max_pairs,
        )
    elif args.bucket_pairs:
        from gsplat_tpu.viewer import make_bucketed_render_fn

        orbit_fn = make_bucketed_render_fn(
            params, cfg, fx, fy, cx, cy, alive=alive, trajectory=traj,
            num_buckets=args.bucket_pairs, report_demand=True,
        )
        frames, stats = render_trajectory(
            orbit_fn, traj, keep_frames=keep_frames,
            pair_capacity=cfg.max_pairs,
        )
    else:
        orbit_fn = make_render_fn(
            params, cfg, fx, fy, cx, cy, alive=alive, report_demand=True
        )
        frames, stats = render_trajectory(
            orbit_fn, traj, keep_frames=keep_frames,
            pair_capacity=cfg.max_pairs,
        )
    print(
        f"FPS: {stats['fps']:.2f}  (mean {stats['mean_ms']:.2f} ms, "
        f"median {stats['median_ms']:.2f}, min {stats['min_ms']:.2f}, "
        f"max {stats['max_ms']:.2f}, std {stats['std_ms']:.2f})"
    )
    if "fps_pipelined" in stats:
        print(
            f"pipelined FPS: {stats['fps_pipelined']:.2f} "
            f"({stats['pipelined_ms']:.2f} ms/frame — no per-frame sync)"
        )
    if "max_pairs_seen" in stats:
        print(
            f"pair demand: max {stats['max_pairs_seen']} of capacity "
            f"{stats['pair_capacity']}"
            + (f", rows max {stats['max_rows_seen']}"
               if cfg.cull_mode == "ellipse" else "")
        )
        if stats.get("pair_overflow_frames"):
            print(
                f"WARNING: {stats['pair_overflow_frames']} frame(s) "
                f"exceeded pair capacity — the farthest splats were "
                f"dropped; raise --max_pairs or use --auto_pairs"
            )

    if not args.benchmark_only:
        video = save_video(
            frames, os.path.join(args.output_dir, "orbit.mp4"), fps=args.fps
        )
        print(f"video/frames: {video}")

    if args.save_depth:
        from gsplat_tpu.data.images import save_image
        from gsplat_tpu.viewer import colorize_depth

        depth_fn = make_render_fn(
            params, cfg, fx, fy, cx, cy, alive=alive, with_depth=True
        )
        depth_dir = os.path.join(args.output_dir, "depth")
        os.makedirs(depth_dir, exist_ok=True)
        for i, c2w in enumerate(traj):
            _, depth, alpha_plane = depth_fn(np.asarray(c2w))
            save_image(
                os.path.join(depth_dir, f"depth_{i:05d}.png"),
                colorize_depth(np.asarray(depth), np.asarray(alpha_plane)),
            )
        print(f"depth maps: {depth_dir}")


if __name__ == "__main__":
    main()
