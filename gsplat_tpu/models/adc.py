"""Adaptive density control (clone / split / prune) on a fixed-capacity pool.

Reference semantics (/root/reference/scripts/train.py:89-195), re-expressed
without dynamic shapes so the whole step stays inside one jitted graph:

* prune: alive slots with sigmoid(opacity) < opacity_threshold die
  (train.py:119-121),
* split: alive slots with max(exp(scale)) > scale_threshold AND
  ||grad_pos|| > max_grad spawn ONE child at pos + randn * scale * 0.1 with
  scale_raw - 0.5; the parent is kept unchanged (train.py:155-182 — note the
  reference does not shrink or remove the parent),
* clone: alive slots with max scale <= scale_threshold AND high grad spawn an
  exact copy (train.py:184-195),
* the reference evaluates split/clone masks on the post-prune population;
  here pruned slots simply have their masks forced off — identical outcome.

Slot allocation is a prefix-sum compaction: the i-th spawner writes to the
i-th free slot. When spawners outnumber free slots the excess spawns are
dropped (lowest slot indices win) and the overflow count is reported — never
silent. Newly-written slots must have their Adam moments cleared; see
`new_slot_mask` in the result (the reference instead rebuilds the optimizer
from scratch, losing ALL moments — train.py:559-567; we only reset new slots,
which is strictly better behaved).

The opacity raise ("reset") op matches train.py:569-574: alive slots with
opacity < 0.01 get opacity_raw = logit(clamp(opacity + 0.01, 0, 1)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussians import GaussianPool


class AdcResult(NamedTuple):
    pool: GaussianPool
    new_slot_mask: jnp.ndarray  # [capacity] bool — slots whose opt state must reset
    num_pruned: jnp.ndarray
    num_split: jnp.ndarray
    num_cloned: jnp.ndarray
    num_overflowed: jnp.ndarray  # spawns dropped for lack of free slots


def densify_and_prune(
    pool: GaussianPool,
    pos_grad: jnp.ndarray,
    key: jax.Array,
    opacity_threshold: float = 0.01,
    max_grad: float = 0.01,
    scale_threshold: float = 0.01,
) -> AdcResult:
    """One ADC step. Fully on-device; shapes static."""
    params = pool.params
    cap = pool.capacity

    opacity = jax.nn.sigmoid(params["opacity_raw"])
    prune = pool.alive & (opacity < opacity_threshold)
    alive = pool.alive & ~prune

    # Accept either raw gradient vectors [cap, 3] or a precomputed per-slot
    # norm statistic [cap]. Callers accumulating over an ADC interval must
    # accumulate NORMS (mean/EMA of per-step ||g||), not signed vectors —
    # oscillating gradients cancel in a vector EMA and under-densify
    # high-error regions (the reference reads the instantaneous ||.grad||,
    # train.py:543-553).
    grad_norm = (
        pos_grad if pos_grad.ndim == 1
        else jnp.linalg.norm(pos_grad, axis=-1)
    )
    scales = jnp.exp(params["scale_raw"])
    max_scale = jnp.max(scales, axis=-1)
    high_grad = grad_norm > max_grad
    split = alive & (max_scale > scale_threshold) & high_grad
    clone = alive & (max_scale <= scale_threshold) & high_grad
    spawn = split | clone

    # Prefix-sum slot allocation: spawner rank -> free slot index.
    free = ~alive
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    spawn_rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1  # rank of each spawner
    num_free = jnp.sum(free.astype(jnp.int32))
    num_spawn = jnp.sum(spawn.astype(jnp.int32))

    # free_slot_of_rank[r] = index of the r-th free slot.
    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    free_slot_of_rank = jnp.zeros(cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)  # non-free rows scatter out of bounds
    ].set(slot_ids, mode="drop")

    fits = spawn & (spawn_rank < num_free)
    dest = jnp.where(fits, free_slot_of_rank[jnp.clip(spawn_rank, 0, cap - 1)], cap)

    # Child parameters (parent values, with split offsets applied).
    offset = (
        jax.random.normal(key, params["pos"].shape, params["pos"].dtype)
        * scales
        * 0.1
    )
    child = {
        "pos": params["pos"] + jnp.where(split[:, None], offset, 0.0),
        "opacity_raw": params["opacity_raw"],
        "f_dc": params["f_dc"],
        "f_rest": params["f_rest"],
        "scale_raw": params["scale_raw"] - jnp.where(split[:, None], 0.5, 0.0),
        "q_raw": params["q_raw"],
    }

    def scatter_children(dst_param, src_param):
        if src_param.ndim == 1:
            return dst_param.at[dest].set(
                jnp.where(fits, src_param, 0.0), mode="drop"
            )
        return dst_param.at[dest].set(
            jnp.where(fits[:, None], src_param, 0.0), mode="drop"
        )

    # `mode='drop'` discards writes with dest == cap (non-spawners/overflow).
    # Source rows that don't fit write nothing; dest rows receive exactly one
    # child because free slots are assigned uniquely by rank.
    new_params = {
        k: scatter_children(params[k], child[k]) for k in params
    }
    new_slot = jnp.zeros(cap, bool).at[dest].set(fits, mode="drop")
    new_alive = alive | new_slot

    return AdcResult(
        pool=GaussianPool(params=new_params, alive=new_alive),
        new_slot_mask=new_slot | prune,  # pruned slots also reset moments
        num_pruned=jnp.sum(prune.astype(jnp.int32)),
        num_split=jnp.sum((split & fits).astype(jnp.int32)),
        num_cloned=jnp.sum((clone & fits).astype(jnp.int32)),
        num_overflowed=jnp.maximum(num_spawn - num_free, 0),
    )


def raise_low_opacity(pool: GaussianPool) -> GaussianPool:
    """The reference's periodic opacity 'reset' (train.py:569-574): alive
    gaussians with opacity < 0.01 get opacity += 0.01 (in probability space,
    written back through logit)."""
    opacity = jax.nn.sigmoid(pool.params["opacity_raw"])
    mask = pool.alive & (opacity < 0.01)
    bumped = jnp.clip(opacity + 0.01, 1e-7, 1 - 1e-7)
    new_raw = jnp.where(mask, jnp.log(bumped) - jnp.log1p(-bumped),
                        pool.params["opacity_raw"])
    params = dict(pool.params)
    params["opacity_raw"] = new_raw
    return GaussianPool(params=params, alive=pool.alive)


def densify_and_prune_paper(
    pool: GaussianPool,
    avg_uv_grad: jnp.ndarray,
    max_radius: jnp.ndarray,
    key: jax.Array,
    grad_threshold: float = 0.0002,
    min_opacity: float = 0.005,
    percent_dense: float = 0.01,
    scene_extent: float = 5.0,
    max_screen_size: int = 0,
) -> AdcResult:
    """Original-paper ADC (Kerbl et al. 2023 §5.2), fixed-capacity form.

    Differences from the reference-matching `densify_and_prune` (which the
    reference derived with its own thresholds, train.py:89-195):

    * the densification statistic is the ACCUMULATED VIEW-SPACE positional
      gradient norm averaged over the views where the gaussian was visible
      (`avg_uv_grad`, from the train step's uv_tap grads) — not the
      instantaneous world-space gradient;
    * size criteria are relative to the scene extent
      (percent_dense * extent splits vs clones; > 0.1 * extent prunes);
    * SPLIT samples a new position from the gaussian itself
      (pos + R @ (eps * scales)), shrinks scales by 1.6, and REPLACES the
      parent with one child while the second child takes a free slot;
    * optional screen-size pruning: gaussians whose splat radius exceeded
      `max_screen_size` pixels in any view die (0 disables — the paper
      enables it only after the first opacity reset).

    Slot mechanics (prefix-sum allocation, overflow reported) match
    `densify_and_prune`.
    """
    from ..ops.gaussian import quat_to_rotmat

    params = pool.params
    cap = pool.capacity

    opacity = jax.nn.sigmoid(params["opacity_raw"])
    scales = jnp.exp(params["scale_raw"])
    max_scale = jnp.max(scales, axis=-1)

    prune = pool.alive & (opacity < min_opacity)
    if max_screen_size > 0:
        prune |= pool.alive & (max_radius > max_screen_size)
        prune |= pool.alive & (max_scale > 0.1 * scene_extent)
    alive = pool.alive & ~prune

    high_grad = avg_uv_grad >= grad_threshold
    big = max_scale > percent_dense * scene_extent
    split = alive & big & high_grad
    clone = alive & ~big & high_grad
    spawn = split | clone  # one free slot per spawner

    free = ~alive
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    spawn_rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
    num_free = jnp.sum(free.astype(jnp.int32))
    num_spawn = jnp.sum(spawn.astype(jnp.int32))

    slot_ids = jnp.arange(cap, dtype=jnp.int32)
    free_slot_of_rank = jnp.zeros(cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)
    ].set(slot_ids, mode="drop")
    fits = spawn & (spawn_rank < num_free)
    dest = jnp.where(
        fits, free_slot_of_rank[jnp.clip(spawn_rank, 0, cap - 1)], cap
    )

    # Split children: positions sampled from the parent gaussian
    # (world-frame offset = R @ (eps * scales)), scales / 1.6.
    k1, k2 = jax.random.split(key)
    q = params["q_raw"]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    R = quat_to_rotmat(q)  # [cap, 3, 3]
    eps_a = jax.random.normal(k1, scales.shape, scales.dtype) * scales
    eps_b = jax.random.normal(k2, scales.shape, scales.dtype) * scales
    off_a = jnp.einsum("nij,nj->ni", R, eps_a)
    off_b = jnp.einsum("nij,nj->ni", R, eps_b)
    split_scale_raw = params["scale_raw"] - jnp.log(1.6)

    # Child written to the FREE slot: split -> sampled child B; clone -> copy.
    child = {
        "pos": jnp.where(split[:, None], params["pos"] + off_b,
                         params["pos"]),
        "opacity_raw": params["opacity_raw"],
        "f_dc": params["f_dc"],
        "f_rest": params["f_rest"],
        "scale_raw": jnp.where(split[:, None], split_scale_raw,
                               params["scale_raw"]),
        "q_raw": params["q_raw"],
    }

    def scatter_children(dst, src):
        m = fits if src.ndim == 1 else fits[:, None]
        return dst.at[dest].set(jnp.where(m, src, 0.0), mode="drop")

    new_params = {k: scatter_children(params[k], child[k]) for k in params}

    # Parent slot of a FITTING split is replaced in place by child A.
    rep = split & fits
    new_params["pos"] = jnp.where(
        rep[:, None], params["pos"] + off_a, new_params["pos"]
    )
    new_params["scale_raw"] = jnp.where(
        rep[:, None], split_scale_raw, new_params["scale_raw"]
    )

    new_slot = jnp.zeros(cap, bool).at[dest].set(fits, mode="drop")
    new_alive = alive | new_slot

    return AdcResult(
        pool=GaussianPool(params=new_params, alive=new_alive),
        # replaced parents also need fresh optimizer moments
        new_slot_mask=new_slot | prune | rep,
        num_pruned=jnp.sum(prune.astype(jnp.int32)),
        num_split=jnp.sum((split & fits).astype(jnp.int32)),
        num_cloned=jnp.sum((clone & fits).astype(jnp.int32)),
        num_overflowed=jnp.maximum(num_spawn - num_free, 0),
    )
