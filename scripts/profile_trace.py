#!/usr/bin/env python
"""Capture an XLA profiler trace of the render / train step.

Produces a TensorBoard/XProf-compatible trace directory (SURVEY §5.1 — the
reference has no profiler at all).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log_dir", default="/tmp/gsplat_trace")
    p.add_argument("--gaussians", type=int, default=2**17)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--max_pairs", type=int, default=2**22)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--backward", action="store_true")
    args = p.parse_args()

    import jax

    from bench import make_scene
    from gsplat_tpu import RenderConfig, render_from_params
    from gsplat_tpu.utils import trace

    cfg = RenderConfig(height=args.height, width=args.width,
                       max_pairs=args.max_pairs)
    params = make_scene(args.gaussians)
    import jax.numpy as jnp

    c2w = jnp.eye(4)
    fx = fy = jnp.float32(0.85 * args.width)
    cx, cy = jnp.float32(args.width / 2), jnp.float32(args.height / 2)

    if args.backward:
        fn = jax.jit(jax.grad(
            lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg)[0].sum()
        ))
    else:
        fn = jax.jit(
            lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg)[0]
        )
    out = fn(params)
    jax.block_until_ready(out)

    with trace(args.log_dir):
        for _ in range(args.iters):
            out = fn(params)
        jax.block_until_ready(out)
    print(f"trace written to {args.log_dir}")


if __name__ == "__main__":
    main()
