"""Persistent XLA compilation cache for the big render/train graphs.

The reference has no compilation step at all (eager PyTorch); here the
Pallas rasterizer pair can take minutes to compile on a TPU backend, and
training drivers recompile on auto-capacity growth (train/fit.py). The
JAX persistent cache makes every recompile after the first run a disk
load instead. CLI scripts call :func:`enable_compilation_cache` at
startup; library users can call it themselves (safe to call repeatedly).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "gsplat_tpu", "xla"
)


def enable_compilation_cache(
    cache_dir: str | None = None,
    min_compile_time_secs: float = 2.0,
) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Returns the cache directory, or None if the cache could not be enabled
    (old JAX, read-only filesystem) — callers never fail on this.
    Honours the GSPLAT_CACHE_DIR env var; set GSPLAT_NO_CACHE=1 to disable.
    """
    if os.environ.get("GSPLAT_NO_CACHE"):
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("GSPLAT_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            min_compile_time_secs,
        )
        return cache_dir
    except Exception:
        return None
