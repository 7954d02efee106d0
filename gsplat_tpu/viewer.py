"""Inference-time rendering: orbit trajectories, FPS benchmarking, video.

Reference counterpart: /root/reference/scripts/render_trained.py
(look-at orbit generation :28-75, scene center/radius estimation :237-309,
timed render loop :319-381, video export :395-476) and scripts/inference.py
(trajectory rendering :39-119).

Camera convention matches the reference: look-at with forward = normalize
(target - pos), right = normalize(forward x up), camera y = -up (the
reference flips up so images are not vertically mirrored,
render_trained.py:69).
"""

from __future__ import annotations

import os
import subprocess
import time

import numpy as np

from .config import RenderConfig


def look_at(position: np.ndarray, target: np.ndarray,
            up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """c2w [4, 4] for a camera at `position` looking at `target`."""
    position = np.asarray(position, np.float64)
    forward = np.asarray(target, np.float64) - position
    forward = forward / (np.linalg.norm(forward) + 1e-12)
    up = np.asarray(up, np.float64)
    right = np.cross(forward, up)
    right = right / (np.linalg.norm(right) + 1e-12)
    cam_up = np.cross(right, forward)
    c2w = np.eye(4)
    # Column convention: x = right, y = -up, z = forward (reference :60-70).
    c2w[:3, 0] = right
    c2w[:3, 1] = -cam_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = position
    return c2w.astype(np.float32)


def create_orbit_trajectory(
    center: np.ndarray,
    radius: float,
    num_frames: int = 120,
    elevation_deg: float = 15.0,
    up=(0.0, 1.0, 0.0),
) -> np.ndarray:
    """[K, 4, 4] c2w poses orbiting `center` (reference :28-75)."""
    center = np.asarray(center, np.float64)
    elev = np.deg2rad(elevation_deg)
    poses = []
    for i in range(num_frames):
        th = 2.0 * np.pi * i / num_frames
        offset = radius * np.array(
            [np.cos(th) * np.cos(elev), np.sin(elev), np.sin(th) * np.cos(elev)]
        )
        poses.append(look_at(center + offset, center, up))
    return np.stack(poses)


def estimate_scene_center_radius(
    c2w_matrices: np.ndarray | None = None,
    positions: np.ndarray | None = None,
    look_distance: float = 5.0,
) -> tuple[np.ndarray, float]:
    """Scene center + orbit radius (reference :237-309).

    Primary: training cameras — each camera 'looks at' pos + forward *
    look_distance; center is the mean look-at point, radius = 1.2 x camera
    spread clamped to [3, 20]. Fallback: gaussian position statistics.
    """
    if c2w_matrices is not None and len(c2w_matrices) > 0:
        c2w = np.asarray(c2w_matrices, np.float64)
        cam_pos = c2w[:, :3, 3]
        forward = c2w[:, :3, 2]
        lookats = cam_pos + forward * look_distance
        center = lookats.mean(axis=0)
        spread = np.linalg.norm(cam_pos - cam_pos.mean(axis=0), axis=1).max()
        radius = float(np.clip(1.2 * spread, 3.0, 20.0))
        return center.astype(np.float32), radius
    if positions is not None and len(positions) > 0:
        pts = np.asarray(positions, np.float64)
        center = np.median(pts, axis=0)
        r = np.linalg.norm(pts - center, axis=1)
        radius = float(np.clip(1.5 * np.percentile(r, 90.0), 3.0, 20.0))
        return center.astype(np.float32), radius
    return np.zeros(3, np.float32), 5.0


def _split_render_out(out):
    """render_fn may return `img` or `(img, probe)` — probe is a tiny f32
    vector [mean(img), num_pairs, num_rows] computed in-graph (see
    make_render_fn(report_demand=True))."""
    if isinstance(out, (tuple, list)) and len(out) == 2:
        return out[0], out[1]
    return out, None


def _traj_stats(times, n_frames, probes, pair_capacity, extra=None):
    times_ms = np.asarray(times) * 1e3
    stats = {
        "frames": n_frames,
        "mean_ms": float(times_ms.mean()),
        "median_ms": float(np.median(times_ms)),
        "min_ms": float(times_ms.min()),
        "max_ms": float(times_ms.max()),
        "std_ms": float(times_ms.std()),
        "fps": float(1e3 / times_ms.mean()),
    }
    if extra:
        stats.update(extra)
    if probes:
        pv = np.stack(probes)  # [K, 3]
        stats["max_pairs_seen"] = int(pv[:, 1].max())
        stats["max_rows_seen"] = int(pv[:, 2].max())
        stats["pair_capacity"] = int(pair_capacity)
        stats["pair_overflow_frames"] = (
            int((pv[:, 1] > pair_capacity).sum()) if pair_capacity else 0
        )
    return stats


def make_bucketed_render_fn(params, cfg, fx, fy, cx, cy, alive=None,
                            trajectory=None, num_buckets: int = 4,
                            report_demand: bool = False, verbose=print):
    """Per-frame capacity bucketing for a KNOWN trajectory.

    Close-in orbit poses can demand ~10x the pairs of distant ones
    (round-3 queue: 3M..38M across one orbit); a single graph sized to
    the max demand makes EVERY frame pay max-demand binning cost (the
    round-3 --auto_pairs orbit ran 300 ms/frame at a 46M capacity). This
    probes the demand of every pose up front with the binning-only
    pair_demand graph, builds a /2 geometric ladder of demand-sized
    configs (at most `num_buckets` rungs, clamped at cfg.max_pairs), and
    dispatches each pose to the smallest rung that fits — distant frames
    render at distant-frame cost. Frames whose demand exceeds the top
    rung are clamped there (overflow drops the farthest splats and is
    REPORTED via the render_trajectory probe stats — never silent).

    Rungs compile lazily-but-upfront (one warm render per rung at build
    time) so the timed loop never hits a compile. Pose -> rung lookup is
    by pose bytes; unknown poses use the top rung (safe). The returned
    closure matches make_render_fn's contract (report_demand supported).
    No reference counterpart: the reference rebuilds dynamic tensors per
    frame (render_trained.py:319-358).
    """
    import jax
    import jax.numpy as jnp

    from .render import pair_demand

    if trajectory is None or len(trajectory) == 0:
        raise ValueError("bucketed rendering needs the trajectory up front")

    probe = jax.jit(
        lambda c: pair_demand(params, c, fx, fy, cx, cy, cfg, alive=alive)
    )
    demands = [
        tuple(int(x) for x in probe(jnp.asarray(c))) for c in trajectory
    ]

    def rup(x):
        return max(4096, -(-int(x * 1.2) // 4096) * 4096)

    top = min(rup(max(d[0] for d in demands)), cfg.max_pairs)
    lo = rup(min(d[0] for d in demands))
    rungs = [top]
    while len(rungs) < num_buckets and rungs[-1] // 2 >= lo:
        rungs.append(-(-(rungs[-1] // 2) // 4096) * 4096)
    rungs = sorted(rungs)  # ascending capacities

    def rung_of(d):
        need = rup(d)
        for k, r in enumerate(rungs):
            if r >= need:
                return k
        return len(rungs) - 1  # over the top rung: clamped, reported

    assign = [rung_of(d[0]) for d in demands]
    # Per-rung truncated/row capacities from the demands it actually serves.
    fns = []
    for k, r in enumerate(rungs):
        members = [demands[i] for i in range(len(demands)) if assign[i] == k]
        if not members:
            fns.append(None)
            continue
        kw = {"max_pairs": r}
        if cfg.cull_mode == "ellipse":
            kw["max_rows"] = rup(max(m[1] for m in members))
        if cfg.tile_rank_cap:
            kw["trunc_pairs"] = rup(max(m[2] for m in members))
        fns.append(make_render_fn(
            params, cfg.with_(**kw), fx, fy, cx, cy, alive=alive,
            report_demand=report_demand,
        ))
    counts = [sum(1 for a in assign if a == k) for k in range(len(rungs))]
    verbose("bucketed orbit: " + "  ".join(
        f"rung {r} x{c}" for r, c in zip(rungs, counts) if c
    ))

    table = {}
    for i, c2w in enumerate(trajectory):
        table[np.asarray(c2w, np.float32).tobytes()] = assign[i]
    top_k = max(k for k in range(len(rungs)) if fns[k] is not None)

    # Pre-compile every used rung outside the timed loop.
    for k in range(len(rungs)):
        if fns[k] is None:
            continue
        i = assign.index(k)
        out = fns[k](np.asarray(trajectory[i]))
        jax.block_until_ready(_split_render_out(out)[0])

    def fn(c2w):
        k = table.get(np.asarray(c2w, np.float32).tobytes(), top_k)
        f = fns[k] or fns[top_k]
        return f(c2w)

    return fn


def render_trajectory(
    render_fn,
    trajectory: np.ndarray,
    benchmark: bool = True,
    warmup: int = 1,
    batch_size: int = 1,
    keep_frames: bool = True,
    pair_capacity: int = 0,
):
    """Render every pose; returns (frames uint8 list, stats dict).

    `render_fn(c2w) -> [H, W, 3] float image` should be a jitted closure;
    it may instead return `(img, probe)` with probe a [3] f32 vector
    `[mean(img), num_pairs, num_rows]` (make_render_fn(report_demand=True))
    — then per-frame timing synchronizes on a HOST FETCH of that tiny
    vector (mean(img) makes it downstream of the whole kernel), frame
    demand is tracked in the stats, and with `pair_capacity` set the stats
    count capacity-overflow frames (the never-silent contract: overflow
    DROPS the farthest splats, so the CLI must surface it).

    keep_frames=False (benchmark mode) skips the ~24 MB/frame device->host
    image fetch entirely — the reference's benchmark loop does the same
    (render_trained.py:356); the round-3 queue measured 741 ms straggler
    frames caused by those fetches over the axon tunnel.

    batch_size > 1: `render_fn([B, 4, 4]) -> [B, H, W, 3]` (see
    make_batch_render_fn) renders B poses per launch through the shared
    binning sort + single kernel launch; per-frame times are the per-batch
    wall time divided by B. The last chunk is padded by repeating the final
    pose (padded frames dropped).
    """
    import jax

    frames = []
    times = []
    probes = []

    def sync(out):
        """Wait for the frame: tiny probe fetch when available (the probe
        depends on every pixel), else block on the image buffers."""
        img, probe = _split_render_out(out)
        if probe is not None:
            probes.append(np.asarray(probe))
        else:
            jax.block_until_ready(img)
        return img

    if batch_size > 1:
        B = batch_size
        n = len(trajectory)
        warm = np.broadcast_to(
            np.asarray(trajectory[0]), (B, 4, 4)
        ).copy()
        for _ in range(min(warmup, 1)):
            img, _ = _split_render_out(render_fn(warm))
            jax.block_until_ready(img)
        for s in range(0, n, B):
            chunk = np.asarray(trajectory[s : s + B])
            real = chunk.shape[0]
            if real < B:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - real, axis=0)]
                )
            t0 = time.perf_counter()
            imgs = sync(render_fn(chunk))
            dt = (time.perf_counter() - t0) / B
            times.extend([dt] * real)
            if keep_frames:
                arr = np.clip(np.asarray(imgs[:real]), 0, 1)
                frames.extend(
                    (f * 255.0 + 0.5).astype(np.uint8) for f in arr
                )
        stats = _traj_stats(
            times, len(frames) if keep_frames else n, probes, pair_capacity,
            extra={"batch_size": B},
        ) if benchmark and times else {}
        return frames, stats

    for i in range(min(warmup, len(trajectory))):
        img, _ = _split_render_out(render_fn(np.asarray(trajectory[i])))
        jax.block_until_ready(img)
    for c2w in trajectory:
        t0 = time.perf_counter()
        img = sync(render_fn(np.asarray(c2w)))
        times.append(time.perf_counter() - t0)
        if keep_frames:
            frames.append(
                (np.clip(np.asarray(img), 0, 1) * 255.0 + 0.5).astype(
                    np.uint8
                )
            )
    stats = _traj_stats(
        times, len(frames) if keep_frames else len(trajectory), probes,
        pair_capacity,
    ) if benchmark and times else {}
    if benchmark and not keep_frames and len(trajectory) > 1:
        # PIPELINED throughput: dispatch every frame with NO per-frame
        # sync, one fetch at the end. The per-frame numbers above each pay
        # a host<->device round trip for their probe fetch (over the axon
        # tunnel that's ~20 ms/frame of pure latency — round-4 NEXT §28);
        # a serving loop that doesn't need per-frame results pipelines
        # dispatches and runs at the device's true frame rate.
        last = None
        t0 = time.perf_counter()
        for c2w in trajectory:
            # Keep only the newest image reference: device execution is
            # in-order, so syncing the final frame covers them all, and
            # dropping earlier references frees their HBM as they finish
            # (120 live 1080p frames would be ~3 GB).
            last = _split_render_out(render_fn(np.asarray(c2w)))[0]
        import jax.numpy as jnp
        float(jnp.ravel(last)[0])  # host fetch: reliable sync on axon
        dt = (time.perf_counter() - t0) / len(trajectory)
        stats["fps_pipelined"] = float(1.0 / dt)
        stats["pipelined_ms"] = float(dt * 1e3)
    return frames, stats


def save_video(
    frames: list,
    path: str,
    fps: int = 30,
    frames_dir: str | None = None,
) -> str:
    """Write frames to video via imageio, falling back to ffmpeg over PNG
    frames, falling back to the PNG directory itself (reference :395-476)."""
    from .data.images import save_image

    if frames_dir is None:
        frames_dir = os.path.splitext(path)[0] + "_frames"
    os.makedirs(frames_dir, exist_ok=True)
    for i, frame in enumerate(frames):
        save_image(os.path.join(frames_dir, f"frame_{i:05d}.png"), frame)

    try:
        import imageio.v2 as imageio

        with imageio.get_writer(path, fps=fps) as writer:
            for frame in frames:
                writer.append_data(frame)
        return path
    except Exception:
        pass
    try:
        subprocess.run(
            [
                "ffmpeg", "-y", "-framerate", str(fps),
                "-i", os.path.join(frames_dir, "frame_%05d.png"),
                "-pix_fmt", "yuv420p", path,
            ],
            check=True,
            capture_output=True,
        )
        return path
    except Exception:
        return frames_dir  # PNGs remain available


def _demand_probe(img, aux):
    """Tiny [3] f32 vector fetched per frame in benchmark/serving loops:
    [mean(img), num_pairs, num_rows]. mean(img) makes the vector depend on
    every pixel, so one host fetch of 12 bytes is a full frame sync."""
    import jax.numpy as jnp

    rows = aux.num_rows if aux.num_rows is not None else jnp.int32(0)
    return jnp.stack(
        [
            jnp.mean(img),
            aux.num_pairs.astype(jnp.float32),
            rows.astype(jnp.float32),
        ]
    )


def make_render_fn(params: dict, cfg: RenderConfig, fx, fy, cx, cy,
                   alive=None, with_depth: bool = False,
                   report_demand: bool = False):
    """Jitted c2w -> image closure over fixed params/intrinsics.

    With ``with_depth`` the closure returns (rgb, depth, alpha) planes.
    With ``report_demand`` it returns (img, probe[3]) — see _demand_probe;
    render_trajectory uses the probe for cheap sync + overflow reporting.
    """
    import jax
    import jax.numpy as jnp

    from .render import render_from_params

    @jax.jit
    def fn(c2w):
        img, aux = render_from_params(
            params, jnp.asarray(c2w), fx, fy, cx, cy, cfg, alive=alive
        )
        if with_depth:
            return img, aux.depth, aux.alpha
        if report_demand:
            return img, _demand_probe(img, aux)
        return img

    return fn


def make_batch_render_fn(params: dict, cfg: RenderConfig, fx, fy, cx, cy,
                         alive=None, batch: int = 4,
                         report_demand: bool = False):
    """Jitted [B, 4, 4] -> [B, H, W, 3] closure over fixed intrinsics.

    Uses render_batch_from_params: one shared binning sort + one kernel
    launch for all B poses (amortizes the per-launch fixed costs that
    dominate small/medium frames). Results are identical to per-pose
    rendering to the last ulp. ``report_demand`` as in make_render_fn
    (num_pairs is the whole batch's shared-capacity demand).
    """
    import jax
    import jax.numpy as jnp

    from .render import render_batch_from_params

    @jax.jit
    def fn(c2w_b):
        imgs, aux = render_batch_from_params(
            params, jnp.asarray(c2w_b), fx, fy, cx, cy, cfg, alive=alive
        )
        if report_demand:
            return imgs, _demand_probe(imgs, aux)
        return imgs

    return fn


def colorize_depth(depth: np.ndarray, alpha: np.ndarray | None = None):
    """Normalize an accumulated-depth plane to a viewable [H, W, 3] image."""
    d = np.asarray(depth, np.float32)
    if alpha is not None:
        a = np.clip(np.asarray(alpha, np.float32), 1e-3, 1.0)
        d = d / a
        mask = a > 0.05
    else:
        mask = np.isfinite(d) & (d > 0)
    if mask.any():
        lo, hi = np.percentile(d[mask], [2.0, 98.0])
        d = np.clip((d - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
    d = np.where(mask, d, 0.0)
    return np.repeat(d[..., None], 3, axis=-1)
