"""Profiling hooks: XLA traces and steady-state kernel timing.

The reference has no profiler at all (SURVEY §5.1 — only wall-clock FPS with
cuda.synchronize, render_trained.py:333-353). Here:

* `trace(...)` wraps `jax.profiler.trace` — produces a TensorBoard/XProf
  trace directory with per-HLO timing on TPU.
* `benchmark_fn` measures steady-state latency of a jitted callable with
  device-completion fencing, returning stats + derived throughput.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Context manager: capture an XLA profiler trace into `log_dir`."""
    with jax.profiler.trace(
        log_dir, create_perfetto_link=create_perfetto_link
    ):
        yield


def benchmark_fn(
    fn,
    *args,
    iters: int = 20,
    warmup: int = 2,
    pixels: int | None = None,
):
    """Steady-state latency of `fn(*args)` (must return jax arrays).

    Returns a dict with mean/median/min/max milliseconds, FPS, and, when
    `pixels` is given, rays/s (= pixels/s) throughput.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    ms = np.asarray(times) * 1e3
    stats = {
        "iters": iters,
        "mean_ms": float(ms.mean()),
        "median_ms": float(np.median(ms)),
        "min_ms": float(ms.min()),
        "max_ms": float(ms.max()),
        "std_ms": float(ms.std()),
        "fps": float(1e3 / ms.mean()),
    }
    if pixels is not None:
        stats["rays_per_s"] = float(pixels * 1e3 / ms.mean())
    return stats
