"""Static configuration objects for the TPU gaussian-splatting pipeline.

Everything in :class:`RenderConfig` is a *static* (hashable) jit argument:
image geometry, tile geometry, cull thresholds, and the fixed capacities that
replace the reference's dynamic-shape boolean-mask culling
(/root/reference/gaussian_splatting/render.py:104-303). XLA requires static
shapes; capacity overflow is surfaced via counters in the render aux output
rather than silent truncation.

Default threshold values mirror the reference defaults (render.py:62-64).
"""

from __future__ import annotations

import dataclasses


def parse_background(s: str) -> tuple:
    """CLI background spec -> RGB tuple: 'black', 'white', or 'r,g,b'."""
    named = {"black": (0.0, 0.0, 0.0), "white": (1.0, 1.0, 1.0)}
    if s in named:
        return named[s]
    parts = tuple(float(x) for x in s.split(","))
    if len(parts) != 3:
        raise ValueError(
            f"background must be 'black', 'white' or 'r,g,b' — got {s!r}"
        )
    return parts


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (hashable; safe as a jit static arg)."""

    height: int
    width: int
    tile: int = 16
    near: float = 0.01
    far: float = 100.0
    pix_guard: float = 32.0
    # Vertical guard override for band-parallel (tile-axis) rendering: a
    # device rendering a horizontal band must not frustum-cull gaussians whose
    # centers lie in other bands but whose splats reach into this one.
    # None -> use pix_guard (single-device behavior).
    pix_guard_v: float | None = None
    min_conic: float = 1e-6
    chi2_clip: float = 6.25
    alpha_max: float = 0.99
    alpha_cutoff: float = 1.0 / 128.0
    transmittance_min: float = 5e-5
    # Fixed capacities (XLA static shapes). `max_pairs_per_gaussian` bounds the
    # per-Gaussian tile footprint used by the capacity-bounded pair expansion;
    # `max_pairs` bounds the global (gaussian, tile) pair list;
    # `max_per_tile` bounds gaussians composited per tile (front-most kept —
    # correct truncation since pairs are depth sorted).
    max_pairs: int = 2**18
    max_per_tile: int = 1024
    tile_chunk: int = 16  # tiles rasterized per scan step (memory knob)
    # Pallas rasterizer: pairs are processed in fixed blocks of `pair_block`
    # per grid step; every tile's pair run is padded to a block multiple so a
    # block never spans two tiles. `backend` selects the compositor:
    # 'pallas' (TPU kernel), 'xla' (lax.map fallback), 'auto' (pallas on TPU).
    pair_block: int = 128
    backend: str = "auto"
    # Antialiasing (beyond reference parity; default off):
    #   "none"   — exact reference behavior (it omits the low-pass filter).
    #   "dilate" — classic 3DGS +0.3 px^2 screen-space low-pass on Sigma2D.
    #   "mip"    — Mip-Splatting-style 2D filter: dilation PLUS opacity
    #              compensation sqrt(det Sigma / det(Sigma + 0.3 I)), so
    #              sub-pixel splats don't gain energy when dilated.
    aa_mode: str = "none"
    aa_dilation: float = 0.3
    # Solid background color composited where transmittance remains
    # (img += T_final * bg). Default black = exact reference behavior
    # (render.py:404-410 composites over zeros). Differentiable w.r.t. the
    # gaussians through the alpha plane; white = (1.0, 1.0, 1.0) for
    # Blender-style datasets.
    background: tuple = (0.0, 0.0, 0.0)
    # Transmittance math inside the default aligned Pallas kernel
    # (raster_pallas fwd + bwd; the mega/seg variants always use "log"):
    #   "log"     — T = exp(cumsum(log1p(-alpha))) via the MXU triangular
    #               matmul (3 transcendental [G, P] ops per block).
    #   "cumprod" — exact two-level direct product of (1 - alpha): zero
    #               transcendentals / zero MXU, the torch reference's own
    #               shifted-cumprod semantics (render.py:379-383); agrees
    #               with "log" to ~2e-7. Default since the round-3 TPU A/B:
    #               orbit median 89.2 ms vs 97.9 ms for "log" (~9% faster).
    transmittance_math: str = "cumprod"
    # Tile-culling granularity of the pair expansion (ops/binning.py):
    #   "rect"    — one-level expansion over the per-gaussian axis-aligned
    #               tile rectangle (marginal-extent AABB).
    #   "ellipse" — two-level (tile-rows -> pairs) expansion with the EXACT
    #               per-row x-interval of the ellipse {q <= k2}: culls the
    #               rectangle corners the splat never reaches (~25-50% fewer
    #               pairs for rotated anisotropic splats). Bit-identical
    #               images/grads: every culled tile has zero alpha at all of
    #               its pixel centers by construction (same k2 the kernel
    #               enforces via chi2_clip + alpha_cutoff).
    cull_mode: str = "rect"
    # Static capacity of the ellipse expansion's intermediate
    # (gaussian, tile-row) stage. 0 -> max_pairs // 2. Overflow drops whole
    # gaussians from the back of the depth order and is reported via
    # RenderAux.num_rows / row_capacity — never silent.
    max_rows: int = 0
    # Per-tile depth-rank truncation (round-4 perf lever): keep only the
    # FRONT-MOST `tile_rank_cap` pairs of every tile (rounded up to a
    # pair_block multiple). The pair-count distribution of trained scenes
    # is extremely tail-heavy (bench ckpt: p99 tiles hold ~8700 pairs,
    # median 0 — rank 1024 keeps only 22.5% of pairs), and deep-ranked
    # pairs sit behind hundreds of closer splats, so their transmittance
    # is ~0. After the binning sort, kept blocks are COMPACTED into a
    # smaller static pair list (`trunc_pairs` capacity), shrinking the
    # pair-feature gather and the kernel grid to the pairs that can
    # actually contribute. 0 = off (exact). Same semantics as the XLA
    # fallback's front-most `max_per_tile` truncation.
    tile_rank_cap: int = 0
    # Static capacity of the truncated pair list (rounded up to a
    # pair_block multiple). 0 = the worst case num_tiles * tile_rank_cap
    # (capped at padded_pairs); size it from pair_demand() like max_pairs.
    # Overflow drops whole trailing-tile blocks and is REPORTED via
    # RenderAux (never silent).
    trunc_pairs: int = 0
    # Saturation-compacted BACKWARD reduction (round-5 training lever;
    # Pallas backend only). The backward kernel emits exact zeros for
    # every block the forward's saturation early-exit skipped (60-70% of
    # blocks on dense trained scenes); with bwd_pairs > 0 those all-zero
    # 128-pair blocks are dropped from the VJP's 10-payload reduction
    # sort by one block-granular compaction gather, so the sort runs at
    # the ACTIVE-pair size. Gradients are EXACT while the active demand
    # (RenderAux.bwd_demand, emitted by the forward kernel) fits; on
    # overflow the excess blocks' grads are dropped and the demand is
    # reported — never silent; fit() auto-grows. 0 = off (full-length
    # sort, the round-2..4 behavior).
    bwd_pairs: int = 0
    # Pre-sort occlusion cull (active only with tile_rank_cap > 0 and
    # cull_mode "rect"): drop a gaussian BEFORE pair expansion when its
    # within-tile depth rank provably reaches >= the truncation cap at
    # EVERY tile of its footprint — such a gaussian contributes nothing
    # to the truncated composite, and removing it does not change any
    # tile's kept-block content (the kept set per tile is its first
    # cap_t pairs, which never include it), so the truncated output is
    # BIT-IDENTICAL. The rank lower bound comes from depth-chunked
    # cumulative footprint-count grids + a min pyramid (ops/binning.py::
    # _occlusion_cull). This shrinks the pre-sort pair DEMAND itself —
    # the lever for close-in serving poses whose raw demand is ~10x the
    # truncated need (round-3 orbit: 38M pairs of which <9M survive
    # truncation).
    occlusion_cull: bool = True
    # Depth chunks of the cull's cumulative count grids: more chunks =
    # tighter rank bounds (only gaussians in strictly earlier chunks
    # count toward the bound) at slightly more grid memory/compute.
    cull_chunks: int = 64
    # Batched-view rendering (render.py::render_batch_from_params): B views
    # are stacked into one virtual image of B * padded_height rows. uv stays
    # VIEW-LOCAL; the rasterizer maps a tile row to its pixel row modulo
    # `view_tile_rows` (the per-view tile-row count), all in exact int32, so
    # per-view results are bit-identical to single-view rendering. 0 = off.
    view_tile_rows: int = 0

    def __post_init__(self):
        # The binning pipeline packs (tile_x0, tile_y0, footprint_width) into
        # 10 bits each for its single-cumsum delta encoding
        # (ops/binning.py); a tile grid >= 1024 per axis would silently
        # corrupt tile ids. 1023 tiles * 16 px = ~16k px per axis — reject
        # loudly rather than scramble pairs.
        if self.tiles_x >= 1024 or self.tiles_y >= 1024:
            raise ValueError(
                f"tile grid {self.tiles_x}x{self.tiles_y} exceeds the "
                f"1023-tile-per-axis limit of the packed binning encoding "
                f"(image {self.width}x{self.height}, tile {self.tile}); "
                f"use a larger tile size"
            )

    @property
    def row_capacity(self) -> int:
        """Static (gaussian, tile-row) capacity of the ellipse expansion."""
        return self.max_rows if self.max_rows else self.max_pairs // 2

    @property
    def padded_pairs(self) -> int:
        """Static capacity of the block-aligned pair list."""
        worst_pad = self.num_tiles * (self.pair_block - 1)
        return cdiv(self.max_pairs + worst_pad, self.pair_block) * self.pair_block

    @property
    def num_pair_blocks(self) -> int:
        return self.padded_pairs // self.pair_block

    @property
    def rank_cap_blocks(self) -> int:
        """Per-tile block cap of the rank truncation (0 = off)."""
        return cdiv(self.tile_rank_cap, self.pair_block)

    @property
    def trunc_padded_pairs(self) -> int:
        """Static capacity of the block-compacted truncated pair list."""
        if not self.tile_rank_cap:
            return self.padded_pairs
        if self.trunc_pairs:
            cap = cdiv(self.trunc_pairs, self.pair_block) * self.pair_block
        else:
            cap = self.num_tiles * self.rank_cap_blocks * self.pair_block
        return min(cap, self.padded_pairs)

    @property
    def num_trunc_blocks(self) -> int:
        return self.trunc_padded_pairs // self.pair_block

    @property
    def tiles_x(self) -> int:
        return cdiv(self.width, self.tile)

    @property
    def tiles_y(self) -> int:
        return cdiv(self.height, self.tile)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def padded_width(self) -> int:
        return self.tiles_x * self.tile

    @property
    def padded_height(self) -> int:
        return self.tiles_y * self.tile

    def with_(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (reference scripts/train.py:222-250)."""

    iterations: int = 30000
    batch_size: int = 1
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    adam_eps: float = 1e-15
    lambda_l1: float = 0.8
    lambda_ssim: float = 0.2
    grad_clip_pos: float = 1.0
    # Adaptive density control schedule.
    densify_until_iter: int = 15000
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    prune_opacity_threshold: float = 0.01
    max_grad: float = 0.01
    scale_threshold: float = 0.01
    # ADC variant: "reference" matches the reference's world-space-gradient
    # rules (scripts/train.py:89-195); "paper" is the original-paper ADC
    # (accumulated view-space gradient norms averaged over visible views,
    # scene-extent-relative size rules, split-replaces-parent, optional
    # screen-size pruning) — the known-better option on real scenes.
    adc_mode: str = "reference"
    # Paper-ADC view-space gradient threshold, in the original paper's NDC
    # units (the statistic scales pixel-space tap grads by (W/2, H/2), so
    # the INRIA default 2e-4 carries over directly).
    densify_grad_threshold: float = 0.0002
    percent_dense: float = 0.01
    scene_extent: float = 5.0
    min_opacity: float = 0.005
    max_screen_size: int = 0  # px; 0 disables screen-size pruning
    checkpoint_interval: int = 1000
    # Fixed-capacity Gaussian pool (on-device ADC; see models/adc.py).
    capacity: int = 2**17
    # SH bands for view-dependent color (f_rest width 0/9/9/45), matching
    # reference data_loader.py:353-358.
    num_sh_bands: int = 3
    # SH-degree warmup (the original paper's oneupSHdegree schedule: band b
    # activates at iteration b * interval, so early training fits geometry
    # with diffuse color before view-dependence). 0 = off — the reference
    # trains all bands from iteration 0. Implemented as a step-dependent
    # coefficient mask, so no recompile per degree.
    sh_warmup_interval: int = 0
    # Skip parameter/optimizer updates whose gradients are non-finite (a
    # poisoned batch or numeric blow-up then costs one step instead of the
    # whole run); skipped steps are counted in metrics['nonfinite_skipped'].
    nan_guard: bool = True
    # Render the whole view batch through ONE shared binning sort + ONE
    # kernel launch (render_batch_from_params) instead of a sequential
    # lax.scan over views — amortizes the binning and kernel fixed costs.
    # Pair capacity becomes batch_size * max_pairs SHARED across views.
    batched_render: bool = False
