"""Training: optimizer, LR schedules, jitted train step, ADC driver loop.

Reference semantics (/root/reference/scripts/train.py:222-604), redesigned:

* per-parameter Adam groups (eps=1e-15) via optax.multi_transform with the
  reference LRs (pos/opacity/f_dc/f_rest=feature_lr/20/scale/rot) and the
  exponential position schedule with the 1%-delay phase (train.py:445-457),
* ONE jitted train step over the fixed-capacity pool — no optimizer rebuilds
  (the reference recreates Adam from scratch on every densification, dropping
  all moments, train.py:559-567; we keep moments and only zero the slots the
  ADC actually rewrote),
* batches of views are rendered inside a `lax.scan` (sequential like the
  reference, but one compiled graph),
* position-gradient L2 clipping at 1.0 (train.py:536) applied to the pos
  leaf only, matching clip_grad_norm_ on a single tensor.

Checkpointing (params + optimizer state + alive mask + iteration) uses orbax
when available and a numpy .npz fallback otherwise — unlike the reference,
optimizer state IS checkpointed (SURVEY §5.4 gap).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import RenderConfig, TrainConfig
from ..models.adc import (
    densify_and_prune,
    densify_and_prune_paper,
    raise_low_opacity,
)
from ..models.gaussians import GaussianPool
from ..ops.losses import compute_loss
from ..render import render_batch_from_params, render_from_params


def position_lr(step, cfg: TrainConfig):
    """Exponential decay with the reference's 1%-delay phase (train.py:445-457)."""
    step = jnp.asarray(step, jnp.float32)
    frac = jnp.minimum(step / cfg.position_lr_max_steps, 1.0)
    lr = cfg.position_lr_init * (
        cfg.position_lr_final / cfg.position_lr_init
    ) ** frac
    lr = jnp.where(
        step >= cfg.position_lr_max_steps, cfg.position_lr_final, lr
    )
    delay = step < cfg.position_lr_delay_mult * cfg.position_lr_max_steps
    return jnp.where(delay, lr * 0.01, lr)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Per-parameter Adam groups matching reference train.py:394-401."""

    def adam(lr):
        return optax.chain(
            optax.scale_by_adam(eps=cfg.adam_eps),
            optax.scale_by_learning_rate(lr),
        )

    def pos_adam():
        return optax.chain(
            optax.scale_by_adam(eps=cfg.adam_eps),
            optax.scale_by_learning_rate(
                lambda step: position_lr(step, cfg)
            ),
        )

    transforms = {
        "pos": pos_adam(),
        "opacity_raw": adam(cfg.opacity_lr),
        "f_dc": adam(cfg.feature_lr),
        "f_rest": adam(cfg.feature_lr / 20.0),
        "scale_raw": adam(cfg.scaling_lr),
        "q_raw": adam(cfg.rotation_lr),
    }
    return optax.multi_transform(transforms, param_labels=lambda p: {k: k for k in p})


class TrainState(NamedTuple):
    pool: GaussianPool
    opt_state: Any
    step: jnp.ndarray  # [] int32


def init_train_state(pool: GaussianPool, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        pool=pool,
        opt_state=tx.init(pool.params),
        step=jnp.zeros((), jnp.int32),
    )


def _guard_nonfinite(loss, grads, new_params, old_params, new_opt, old_opt):
    """Keep the previous params/opt-state when loss or any grad is
    non-finite. Returns (params, opt_state, skipped_flag)."""
    finite = jnp.isfinite(loss)
    for gleaf in jax.tree.leaves(grads):
        finite &= jnp.all(jnp.isfinite(gleaf))
    params = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), new_params, old_params
    )
    opt_state = jax.tree.map(
        lambda new, old: (
            jnp.where(finite, new, old) if hasattr(new, "shape") else new
        ),
        new_opt, old_opt,
    )
    return params, opt_state, jnp.where(finite, 0, 1).astype(jnp.int32)


def _clip_pos_grad(grads: dict, max_norm: float) -> dict:
    """clip_grad_norm_ on the position leaf only (train.py:536)."""
    g = grads["pos"]
    norm = jnp.sqrt(jnp.sum(g * g))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    out = dict(grads)
    out["pos"] = g * scale
    return out


def sh_warmup_mask(step, cfg: TrainConfig):
    """[45] f32 coefficient mask for SH-degree warmup, or None when off.

    Original-paper oneupSHdegree: active degree = min(step // interval, 3);
    f_rest is laid out [15 R, 15 G, 15 B] with 3 deg-1, 5 deg-2, 7 deg-3
    terms per channel (ops/sh.py). Disabled coefficients get zero gradients
    through the mask multiply, so Adam leaves them untouched until their
    band activates — same trajectory as not evaluating them at all.
    """
    if not cfg.sh_warmup_interval:
        return None
    deg = jnp.minimum(step // cfg.sh_warmup_interval, 3)
    band = jnp.concatenate(
        [
            jnp.full((3,), 1, jnp.int32),
            jnp.full((5,), 2, jnp.int32),
            jnp.full((7,), 3, jnp.int32),
        ]
    )
    return jnp.tile((band <= deg).astype(jnp.float32), 3)  # [45]


def apply_sh_warmup(params: dict, step, cfg: TrainConfig) -> dict:
    """Return params with f_rest masked by the warmup schedule (no-op off)."""
    m = sh_warmup_mask(step, cfg)
    if m is None:
        return params
    return {**params, "f_rest": params["f_rest"] * m}


def batch_loss_fn(
    params: dict,
    alive: jnp.ndarray,
    batch: dict,
    render_cfg: RenderConfig,
    train_cfg: TrainConfig,
    uv_taps: jnp.ndarray | None = None,
):
    """Mean L1+SSIM loss over a batch of views, rendered sequentially.

    batch: dict with 'image' [B,H,W,3], 'c2w' [B,4,4], 'fx','fy','cx','cy' [B].
    uv_taps: optional [B, N, 2] zeros (paper-ADC view-space gradient tap).
    Returns (loss, metrics dict) — metrics gain per-gaussian 'visible' and
    'max_radius' arrays when uv_taps is given.

    With train_cfg.batched_render the whole batch goes through ONE shared
    binning sort + kernel launch (render_batch_from_params); per-view means
    of L1/SSIM equal the batch means, so the loss is identical to the scan
    path up to float reduction order.
    """
    if train_cfg.batched_render:
        imgs, aux = render_batch_from_params(
            params, batch["c2w"], batch["fx"], batch["fy"], batch["cx"],
            batch["cy"], render_cfg, alive=alive, uv_taps=uv_taps,
        )
        total, comps = compute_loss(
            imgs, batch["image"], train_cfg.lambda_l1, train_cfg.lambda_ssim
        )
        metrics = {
            "l1": comps["l1"],
            "ssim": comps["ssim"],
            # Whole-batch pair demand vs the SHARED B * max_pairs capacity
            # (fit()'s auto-capacity growth acts on the ratio).
            "pair_demand": aux.num_pairs,
            "pair_capacity": jnp.int32(aux.pair_capacity),
        }
        if render_cfg.cull_mode == "ellipse":
            metrics["row_demand"] = aux.num_rows
            metrics["row_capacity"] = jnp.int32(aux.row_capacity)
        if render_cfg.tile_rank_cap:
            metrics["trunc_demand"] = aux.trunc_demand
            metrics["trunc_capacity"] = jnp.int32(aux.trunc_capacity)
        if render_cfg.bwd_pairs and aux.bwd_demand is not None:
            metrics["bwd_demand"] = aux.bwd_demand
            metrics["bwd_capacity"] = jnp.int32(aux.bwd_capacity)
        if uv_taps is not None:
            radii = jax.lax.stop_gradient(aux.screen_radius)  # [B, N]
            metrics["visible"] = jnp.sum((radii > 0).astype(jnp.int32), axis=0)
            metrics["max_radius"] = jnp.max(radii, axis=0)
        return total, metrics

    def view_loss(carry, xs):
        view, tap = xs
        img, aux = render_from_params(
            params, view["c2w"], view["fx"], view["fy"], view["cx"],
            view["cy"], render_cfg, alive=alive,
            uv_tap=None if uv_taps is None else tap,
        )
        total, comps = compute_loss(
            img, view["image"], train_cfg.lambda_l1, train_cfg.lambda_ssim
        )
        if uv_taps is None:
            extra = ()
        else:
            radius = jax.lax.stop_gradient(aux.screen_radius)
            extra = (radius,)
        bd = (aux.bwd_demand if aux.bwd_demand is not None
              else jnp.int32(-1))  # XLA fallback: no kernel demand signal
        return carry, (total, comps["l1"], comps["ssim"],
                       aux.num_pairs, aux.num_rows,
                       aux.trunc_demand, bd) + extra

    # NOTE: no jax.checkpoint here — the Pallas rasterizer's custom VJP
    # keeps only O(pixels) residuals and the XLA fallback checkpoints per
    # tile chunk internally; an outer remat would re-run the whole forward
    # in backward (+30% step time measured) for no memory benefit.
    xs = (batch, uv_taps)
    cap = jnp.int32(render_cfg.max_pairs)

    def row_metrics(rows):
        if render_cfg.cull_mode != "ellipse":
            return {}
        return {
            "row_demand": jnp.max(rows),
            "row_capacity": jnp.int32(render_cfg.row_capacity),
        }

    def trunc_metrics(tds):
        if not render_cfg.tile_rank_cap:
            return {}
        return {
            "trunc_demand": jnp.max(tds),
            "trunc_capacity": jnp.int32(render_cfg.trunc_padded_pairs),
        }

    def bwd_metrics(bds):
        if not render_cfg.bwd_pairs:
            return {}
        return {
            "bwd_demand": jnp.max(bds),
            "bwd_capacity": jnp.int32(
                -(-render_cfg.bwd_pairs // render_cfg.pair_block)
                * render_cfg.pair_block
            ),
        }

    if uv_taps is None:
        b = batch["c2w"].shape[0]
        xs = (batch, jnp.zeros((b,), jnp.float32))  # dummy scan operand
        _, (totals, l1s, ssims, pairs, rows, tds, bds) = jax.lax.scan(
            view_loss, 0.0, xs
        )
        return jnp.mean(totals), {
            "l1": jnp.mean(l1s),
            "ssim": jnp.mean(ssims),
            "pair_demand": jnp.max(pairs),
            "pair_capacity": cap,
            **row_metrics(rows),
            **trunc_metrics(tds),
            **bwd_metrics(bds),
        }
    _, (totals, l1s, ssims, pairs, rows, tds, bds, radii) = jax.lax.scan(
        view_loss, 0.0, xs
    )
    return jnp.mean(totals), {
        "l1": jnp.mean(l1s),
        "ssim": jnp.mean(ssims),
        "pair_demand": jnp.max(pairs),
        "pair_capacity": cap,
        "visible": jnp.sum((radii > 0).astype(jnp.int32), axis=0),  # [N]
        "max_radius": jnp.max(radii, axis=0),  # [N]
        **row_metrics(rows),
        **trunc_metrics(tds),
        **bwd_metrics(bds),
    }


def make_train_step(render_cfg: RenderConfig, train_cfg: TrainConfig):
    """Build the jitted single-step update. Returns step_fn(state, batch).

    With train_cfg.adc_mode == 'paper', the step also differentiates w.r.t.
    a zero view-space tap and returns per-gaussian 'uv_grad_sum' (sum over
    the batch of per-view ||dL/duv||), 'visible' counts and 'max_radius' —
    the original-paper densification statistics.
    """
    tx = make_optimizer(train_cfg)
    paper = train_cfg.adc_mode == "paper"

    def step_fn(state: TrainState, batch: dict):
        if paper:
            b = batch["c2w"].shape[0]
            n = state.pool.alive.shape[0]
            taps = jnp.zeros((b, n, 2), jnp.float32)

            def loss_fn(params, taps):
                return batch_loss_fn(
                    apply_sh_warmup(params, state.step, train_cfg),
                    state.pool.alive, batch, render_cfg, train_cfg,
                    uv_taps=taps,
                )

            (loss, metrics), (grads, tap_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.pool.params, taps)
            # Per-view view-space gradient norms, summed over the batch
            # (the paper accumulates per-render norms, 3DGS §5.2). The
            # original thresholds its statistic in NDC units (INRIA's
            # ndc2Pix: d_pix/d_ndc = size/2), while our tap is in PIXELS
            # — scale by (W/2, H/2) so densify_grad_threshold keeps the
            # paper's 2e-4 meaning (round 4: the unscaled statistic was
            # ~1/160 of the paper's, so paper-mode ADC never fired).
            ndc = jnp.asarray(
                [render_cfg.width * 0.5, render_cfg.height * 0.5],
                jnp.float32,
            )
            metrics["uv_grad_sum"] = jnp.sum(
                jnp.linalg.norm(tap_grads * ndc, axis=-1), axis=0
            )  # [N]
        else:
            def loss_fn(params):
                loss, metrics = batch_loss_fn(
                    apply_sh_warmup(params, state.step, train_cfg),
                    state.pool.alive, batch, render_cfg, train_cfg,
                )
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.pool.params)
        grads = _clip_pos_grad(grads, train_cfg.grad_clip_pos)
        # Dead slots must not drift.
        grads = jax.tree.map(
            lambda g: jnp.where(
                state.pool.alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0
            ),
            grads,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.pool.params)
        params = optax.apply_updates(state.pool.params, updates)
        if train_cfg.nan_guard:
            # One poisoned batch must not destroy the run: if the loss or
            # any gradient is non-finite, keep the previous parameters and
            # optimizer state and report the skip.
            params, opt_state, skipped = _guard_nonfinite(
                loss, grads, params, state.pool.params,
                opt_state, state.opt_state,
            )
            metrics = dict(metrics, nonfinite_skipped=skipped)
        new_state = TrainState(
            pool=GaussianPool(params=params, alive=state.pool.alive),
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = dict(metrics, total=loss, pos_grad=grads["pos"])
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def reset_opt_state_slots(opt_state, slot_mask: jnp.ndarray):
    """Zero Adam moments for slots rewritten by the ADC.

    Works on any optax state pytree: every leaf whose leading dim equals the
    pool capacity gets the masked rows zeroed.
    """
    cap = slot_mask.shape[0]

    def reset(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            mask = slot_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(reset, opt_state)


def grow_state_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Grow the pool (and optimizer state) to a larger slot capacity.

    New slots follow the dead-slot conventions of `init_pool_from_points`
    (zeros everywhere, opacity_raw = -10 so a mask bug still culls them);
    every optimizer leaf whose leading dim equals the old capacity gets
    zero rows appended (exactly the fresh-Adam state the ADC's moment
    reset would give them). Downstream jitted steps recompile on the new
    shapes automatically — fit() calls this when the ADC reports dropped
    spawns, so capacity never needs hand-tuning (the reference requires
    picking it up front; its trainer grows tensors freely but rebuilds the
    whole optimizer, scripts/train.py:559-567).
    """
    cap = state.pool.capacity
    if new_capacity <= cap:
        return state
    pad = new_capacity - cap

    def grow(x, fill=0.0):
        rows = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, rows], axis=0)

    params = {
        k: grow(v, -10.0 if k == "opacity_raw" else 0.0)
        for k, v in state.pool.params.items()
    }
    alive = grow(state.pool.alive, False)

    def grow_opt(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == cap:
            return grow(leaf)
        return leaf

    return TrainState(
        pool=GaussianPool(params=params, alive=alive),
        opt_state=jax.tree.map(grow_opt, state.opt_state),
        step=state.step,
    )


@jax.jit
def adc_step(state: TrainState, pos_grad: jnp.ndarray, key, thresholds):
    """Jitted densify/prune + optimizer-moment reset."""
    opacity_threshold, max_grad, scale_threshold = thresholds
    result = densify_and_prune(
        state.pool, pos_grad, key,
        opacity_threshold=opacity_threshold,
        max_grad=max_grad,
        scale_threshold=scale_threshold,
    )
    opt_state = reset_opt_state_slots(state.opt_state, result.new_slot_mask)
    return (
        TrainState(pool=result.pool, opt_state=opt_state, step=state.step),
        result,
    )


@functools.partial(jax.jit, static_argnums=(4,))
def adc_step_paper(
    state: TrainState,
    avg_uv_grad: jnp.ndarray,
    max_radius: jnp.ndarray,
    key,
    cfg: TrainConfig,
):
    """Jitted original-paper densify/prune + optimizer-moment reset."""
    result = densify_and_prune_paper(
        state.pool, avg_uv_grad, max_radius, key,
        grad_threshold=cfg.densify_grad_threshold,
        min_opacity=cfg.min_opacity,
        percent_dense=cfg.percent_dense,
        scene_extent=cfg.scene_extent,
        max_screen_size=cfg.max_screen_size,
    )
    opt_state = reset_opt_state_slots(state.opt_state, result.new_slot_mask)
    return (
        TrainState(pool=result.pool, opt_state=opt_state, step=state.step),
        result,
    )


@jax.jit
def opacity_raise_step(state: TrainState) -> TrainState:
    return TrainState(
        pool=raise_low_opacity(state.pool),
        opt_state=state.opt_state,
        step=state.step,
    )


# --------------------------------------------------------------------------
# Checkpointing (params + optimizer state + alive + step).
# --------------------------------------------------------------------------


def save_checkpoint(path, state: TrainState):
    """Single-file .npz checkpoint: named params/alive/step + flat opt leaves.

    Unlike the reference (train.py:197-208), optimizer state IS saved, so
    resume keeps Adam moments (SURVEY §5.4 gap). Parameters are stored under
    stable names so inference tools can load a pool without knowing the
    optimizer tree (see `restore_pool`).
    """
    opt_leaves = jax.tree.leaves(state.opt_state)
    np.savez(
        path,
        __step__=np.asarray(state.step),
        __alive__=np.asarray(state.pool.alive),
        __num_opt_leaves__=len(opt_leaves),
        **{f"param_{k}": np.asarray(v) for k, v in state.pool.params.items()},
        **{f"opt_{i}": np.asarray(x) for i, x in enumerate(opt_leaves)},
    )


def restore_pool(path) -> GaussianPool:
    """Load only the Gaussian pool (params + alive) from a checkpoint."""
    data = np.load(path)
    params = {
        k[len("param_"):]: jnp.asarray(data[k])
        for k in data.files
        if k.startswith("param_")
    }
    return GaussianPool(params=params, alive=jnp.asarray(data["__alive__"]))


def load_checkpoint(path, state: TrainState) -> TrainState:
    """Restore into an existing (matching-capacity) state."""
    data = np.load(path)
    pool = restore_pool(path)
    treedef = jax.tree.structure(state.opt_state)
    n = int(data["__num_opt_leaves__"])
    if n != treedef.num_leaves:
        raise ValueError(
            f"checkpoint has {n} optimizer leaves, expected "
            f"{treedef.num_leaves} (optimizer config changed?)"
        )
    opt_leaves = [jnp.asarray(data[f"opt_{i}"]) for i in range(n)]
    return TrainState(
        pool=pool,
        opt_state=jax.tree.unflatten(treedef, opt_leaves),
        step=jnp.asarray(data["__step__"]),
    )


# --- orbax backend (multi-host / async; SURVEY §5.4) -----------------------


def _state_tree(state: TrainState) -> dict:
    return {
        "params": state.pool.params,
        "alive": state.pool.alive,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def save_checkpoint_orbax(path, state: TrainState):
    """Directory checkpoint via orbax (sharding-aware, multi-host safe).

    Use this instead of the .npz writer when training across processes —
    every host participates in the save; .npz would race on one file.
    """
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path), _state_tree(state), force=True
        )


def load_checkpoint_orbax(path, state: TrainState) -> TrainState:
    """Restore an orbax checkpoint into a matching-structure state."""
    import os

    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path), _state_tree(state)
        )
    return TrainState(
        pool=GaussianPool(
            params=restored["params"], alive=restored["alive"]
        ),
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
