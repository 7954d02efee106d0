"""Gaussian model state: a fixed-capacity parameter pool with an alive mask.

The reference grows/shrinks six `nn.Parameter`s with torch.cat / boolean
indexing (/root/reference/scripts/train.py:143-195) — dynamic shapes that
would force an XLA recompile every densification. The TPU-native design is a
*pool*: every parameter array has a static `capacity` rows; `alive` marks the
populated slots. Clone/split write into free slots, prune clears mask bits,
and shapes never change, so ONE compiled train step serves the whole run.

The pytree is a plain dict so it flows through jit/grad/optax/orbax untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

PARAM_KEYS = ("pos", "opacity_raw", "f_dc", "f_rest", "scale_raw", "q_raw")


class GaussianPool(NamedTuple):
    """Fixed-capacity Gaussian parameter pool (a jit-stable pytree)."""

    params: dict  # each [capacity, ...]; see PARAM_KEYS
    alive: jnp.ndarray  # [capacity] bool

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


def init_pool_from_points(
    points: np.ndarray,
    capacity: int,
    num_sh_bands: int = 3,
    seed: int = 0,
    dtype=jnp.float32,
) -> GaussianPool:
    """Initialize a pool from a point cloud.

    Mirrors reference data_loader.py:287-367 semantics: scale_raw =
    randn*0.1 - 2.0, identity quaternions (0,0,0,1), opacity_raw = 0.1,
    f_dc = raw RGB (NOT inverse-sigmoided — reference keeps raw colors),
    f_rest = zeros. Colors default to uniform random when the cloud has no
    RGB columns; [0,255] colors are rescaled to [0,1].
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"point cloud ({n}) exceeds pool capacity ({capacity})")
    rng = np.random.default_rng(seed)

    pos = points[:, :3]
    if points.shape[1] >= 6:
        colors = points[:, 3:6]
        if colors.max() > 1.0:
            colors = colors / 255.0
    else:
        colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    scale_raw = (rng.standard_normal((n, 3)) * 0.1 - 2.0).astype(np.float32)
    q_raw = np.zeros((n, 4), np.float32)
    q_raw[:, 3] = 1.0
    opacity_raw = np.full((n,), 0.1, np.float32)
    n_rest = {0: 0, 1: 9, 2: 9, 3: 45}[num_sh_bands]
    f_rest = np.zeros((n, n_rest), np.float32)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out, dtype=dtype)

    params = {
        "pos": pad(pos),
        # Dead slots get strongly negative opacity so they are culled even if
        # a mask bug slipped through.
        "opacity_raw": pad(opacity_raw, fill=-10.0),
        "f_dc": pad(colors.astype(np.float32)),
        "f_rest": pad(f_rest),
        "scale_raw": pad(scale_raw, fill=-10.0),
        "q_raw": pad(q_raw, fill=0.0).at[n:, 3].set(1.0),
    }
    alive = jnp.arange(capacity) < n
    return GaussianPool(params=params, alive=alive)


def compact_pool(pool: GaussianPool) -> GaussianPool:
    """Repack alive slots to the front (host-side utility, e.g. at export)."""
    alive = np.asarray(pool.alive)
    idx = np.flatnonzero(alive)
    cap = pool.capacity
    order = np.concatenate([idx, np.flatnonzero(~alive)])
    params = {k: jnp.asarray(np.asarray(v)[order]) for k, v in pool.params.items()}
    new_alive = jnp.arange(cap) < idx.size
    return GaussianPool(params=params, alive=new_alive)


def export_params(pool: GaussianPool) -> dict:
    """Extract only the alive gaussians as dense numpy arrays (host side)."""
    alive = np.asarray(pool.alive)
    return {k: np.asarray(v)[alive] for k, v in pool.params.items()}


def pool_from_dense(params: dict, capacity: int) -> GaussianPool:
    """Wrap dense [N, ...] parameter arrays into a capacity-C pool."""
    n = params["pos"].shape[0]
    if n > capacity:
        raise ValueError(f"{n} gaussians exceed capacity {capacity}")

    def pad(x):
        x = np.asarray(x)
        out = np.zeros((capacity,) + x.shape[1:], x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    padded = {k: pad(params[k]) for k in PARAM_KEYS}
    padded["opacity_raw"] = padded["opacity_raw"].at[n:].set(-10.0)
    padded["scale_raw"] = padded["scale_raw"].at[n:].set(-10.0)
    padded["q_raw"] = padded["q_raw"].at[n:, 3].set(1.0)
    return GaussianPool(params=padded, alive=jnp.arange(capacity) < n)


# NamedTuples are native JAX pytrees; GaussianPool flows through
# jit/grad/optax/orbax without extra registration.

