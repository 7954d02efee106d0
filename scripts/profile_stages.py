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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    n = 2**17
    cfg = RenderConfig(height=1080, width=1920, max_pairs=2**22,
                       max_per_tile=2048, tile_chunk=32)
    params = make_scene(n)
    c2w = jnp.eye(4)
    fx = fy = jnp.float32(0.85 * 1920)
    cx = jnp.float32(960.0)
    cy = jnp.float32(540.0)

    cov_fn = jax.jit(lambda p: build_cov3d_packed(p["scale_raw"], p["q_raw"]))
    sh_fn = jax.jit(lambda p: evaluate_sh(p["f_dc"], p["f_rest"], p["pos"], c2w))
    proj_fn = jax.jit(lambda p, cov: project_gaussians(
        p["pos"], cov, p["opacity_raw"], c2w, fx, fy, cx, cy, cfg))
    bin_fn = jax.jit(lambda pr: bin_gaussians(pr, cfg))
    rast_fn = jax.jit(lambda pr, col, b: rasterize_binned(pr, col, b, cfg))

    t_cov, cov = timeit(cov_fn, params)
    t_sh, colors = timeit(sh_fn, params)
    t_proj, proj = timeit(proj_fn, params, cov)
    t_bin, binning = timeit(bin_fn, proj)
    t_rast, (img, aux) = timeit(rast_fn, proj, colors, binning)

    print(f"cov3d:     {t_cov*1e3:8.2f} ms")
    print(f"sh:        {t_sh*1e3:8.2f} ms")
    print(f"project:   {t_proj*1e3:8.2f} ms")
    print(f"binning:   {t_bin*1e3:8.2f} ms")
    print(f"rasterize: {t_rast*1e3:8.2f} ms")
    total = t_cov + t_sh + t_proj + t_bin + t_rast
    print(f"total:     {total*1e3:8.2f} ms  ({1/total:.2f} FPS)")
    print(f"pairs={int(aux.num_pairs)} max_tile={int(aux.max_tile_count)}")
    print(f"image mean {float(img.mean()):.4f}")


if __name__ == "__main__":
    main()
