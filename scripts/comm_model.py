"""Analytic multi-host scaling model for the three sharded step families.

Closed-form per-step communication volume as a function of
(B, H, W, N, mesh = data:D x tile:T), evaluated against TPU ICI/DCN
bandwidths to predict scaling efficiency at v5p-8 / v5p-16 scale — the
BASELINE.md target row 2 treatment (round-4 VERDICT Weak #7 / demand #6).
No real multi-chip hardware exists in this environment (one v5e chip via
a tunnel), so this model + the virtual-mesh correctness suite is the
strongest multi-host statement we can make.

Collective cost model (ring algorithms, the XLA default on torus ICI):
  all_gather of S bytes total (shard S/K per device, K devices)
      -> each device sends/receives (K-1)/K * S bytes
  reduce_scatter of S bytes  -> (K-1)/K * S
  psum/pmean (all_reduce)    -> 2 * (K-1)/K * S  (reduce_scatter + all_gather)
  ppermute ring stream of S total over K steps -> (K-1)/K * S per device
Link time = bytes_on_wire / per-chip ICI bandwidth (all-gather/reduce
traffic of one device rides its own links; the ring pipelines across
steps, so per-device wire bytes / per-device bandwidth is the standard
estimate — jax-ml.github.io/scaling-book collectives chapter).

Step families (gsplat_tpu/parallel/sharding.py):
  A. band-sharded (`make_sharded_train_step`): params replicated, views
     over 'data', pixel bands over 'tile'.
       fwd:  all_gather of the band images over 'tile' (SSIM needs full
             frames): S_img = B_D*H*W*3*4 bytes
       bwd:  its transpose reduce_scatter (same S_img)
       grads: pmean over 'tile' then pmean over 'data' of the full
             parameter pytree: S_par = N*59*4
       ADC:  tap stats pmean/psum: [B_D,N,2]+[N]ish = S_adc
  B. gaussian-sharded / ZeRO (`make_gauss_sharded_train_step`): pool
     sharded over 'tile' (1/T params+opt state per device).
       fwd:  all_gather of projected screen features over 'tile':
             S_feat = B_D*N*16*4 (per view, x views per device batch)
       bwd:  transpose reduce_scatter (same)
       grads: pmean over 'data' only (tile grads land pre-sharded)
     ring variant: same volume, streamed in T-1 ppermute hops
     overlappable with per-shard binning+raster compute.
  C. serving (`make_sharded_batch_render`): poses over 'data', bands
     over 'tile': all_gather bands once per frame (S_img forward only).

Compute-time anchor: measured v5e train step 96 ms/view at 960x540
(BENCH_r04 train_step_ms_per_view_batched, device-resident batch);
v5p ~ 2.5x v5e (HBM 2765 vs 819 GB/s; the pipeline is memory/index
bound, CLAUDE.md). Serving anchor: 33.1 ms/frame at 1080p truncated.

Hardware (public specs):
  v5e ICI 1600 Gbps/chip = 200 GB/s aggregate; v5p ICI 4800 Gbps/chip
  = 600 GB/s. Within ONE pod slice ICI spans hosts (v5p-16 = 8 chips =
  2 hosts is still a single ICI domain) — DCN (~25 GB/s/host usable)
  only enters between SLICES; we also report a pessimistic 2-slice
  variant where the 'data' axis crosses DCN.
"""

import argparse
import json

GB = 1e9

ICI_BW = {"v5e": 200e9, "v5p": 600e9}  # bytes/s aggregate per chip
DCN_BW_PER_HOST = 25e9  # ~200 Gbps NIC, usable
PARAM_FLOATS = 59  # pos3 scale3 q4 opacity1 f_dc3 f_rest45
FEAT_FLOATS = 16  # projected screen features (sharding.py:304)


def ring_all_gather(total_bytes, k):
    return (k - 1) / k * total_bytes if k > 1 else 0.0


def ring_all_reduce(total_bytes, k):
    return 2 * (k - 1) / k * total_bytes if k > 1 else 0.0


def band_train_comm(B, H, W, N, D, T, views_per_step=None):
    """Family A per-step wire bytes per device (ICI)."""
    B_D = B // D
    views = views_per_step if views_per_step is not None else B_D
    s_img = views * H * W * 3 * 4
    s_par = N * PARAM_FLOATS * 4
    s_adc = views * N * 2 * 4 + 2 * N * 4
    tile = ring_all_gather(s_img, T) + ring_all_gather(s_img, T)  # fwd+bwd
    tile += ring_all_reduce(s_par, T) + ring_all_reduce(s_adc, T)
    data = ring_all_reduce(s_par, D) + ring_all_reduce(s_adc, D)
    return {"tile_bytes": tile, "data_bytes": data}


def gauss_train_comm(B, H, W, N, D, T):
    """Family B per-step wire bytes per device (ICI)."""
    B_D = B // D
    s_feat = B_D * N * FEAT_FLOATS * 4
    s_par = N * PARAM_FLOATS * 4  # full-pool grads, but sharded: /T
    s_img = B_D * H * W * 3 * 4
    tile = ring_all_gather(s_feat, T) + ring_all_gather(s_feat, T)
    tile += ring_all_gather(s_img, T) + ring_all_gather(s_img, T)
    data = ring_all_reduce(s_par / T, D)
    return {"tile_bytes": tile, "data_bytes": data}


def serving_comm(H, W, T):
    """Family C per-frame wire bytes per device."""
    return {"tile_bytes": ring_all_gather(H * W * 3 * 4, T),
            "data_bytes": 0.0}


def efficiency(comm, compute_s, ici_bw, data_on_dcn=False,
               dcn_bw=DCN_BW_PER_HOST, overlap=0.0):
    """Predicted scaling efficiency = ideal step / (compute + exposed comm).

    `compute_s` must already include the Amdahl non-scaling share of the
    tile axis (see band_compute) — comm here only adds wire time.
    """
    t_ici = comm["tile_bytes"] / ici_bw
    t_data = comm["data_bytes"] / (dcn_bw if data_on_dcn else ici_bw)
    t_comm = (1.0 - overlap) * (t_ici + t_data)
    return compute_s + t_comm, (t_ici + t_data)


def band_compute(views, step_s, T, nonscaling):
    """Per-device compute for `views` views with a T-way band split.

    The dominant efficiency loss of the 'tile' axis is NOT comm — it is
    that per-GAUSSIAN stages (cov3d, SH, projection; plus the fixed kernel
    dispatch overheads) run on the FULL gaussian set on every band device
    (each device culls/bins only its own band's tiles, so the pairs-sized
    sort/gather/kernel stages DO shrink ~1/T, but projection does not).
    Measured split at the 1080p bench: proj+cov+SH ~7 ms of ~56 ms total
    (NEXT.md header) -> nonscaling ~0.125 for family A. Family B (ZeRO)
    shards the per-gaussian stages too (each device projects its own 1/T
    shard before the feature all_gather), so its nonscaling share is ~0.
    """
    return views * step_s * (nonscaling + (1.0 - nonscaling) / T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--v5e_step_ms_per_view", type=float, default=96.0)
    ap.add_argument("--v5p_speedup", type=float, default=2.5)
    ap.add_argument("--band_nonscaling", type=float, default=0.125,
                    help="family-A share of per-view step time that does "
                         "not shrink with the tile axis (per-gaussian "
                         "stages; measured ~7/56 at the 1080p bench)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    N, H, W, B = args.n, args.height, args.width, args.batch
    step_v5p = args.v5e_step_ms_per_view / args.v5p_speedup / 1e3  # s/view

    rows = []

    def add(slice_, fam, mesh, D, T, comm, compute, dcn=False):
        ideal = B * step_v5p / (D * T)
        step, t_comm = efficiency(comm, compute, ICI_BW["v5p"],
                                  data_on_dcn=dcn)
        rows.append({
            "slice": slice_, "family": fam, "mesh": mesh,
            "step_ms": round(step * 1e3, 2),
            "comm_ms": round(t_comm * 1e3, 3),
            "ici_GB": round(comm["tile_bytes"] / GB, 4),
            "xaxis_GB": round(comm["data_bytes"] / GB, 4),
            "eff": round(ideal / step, 4),
        })

    # v5p-8 = 4 chips (8 cores), one host; v5p-16 = 8 chips, 2 hosts,
    # ONE ICI domain (pod-slice ICI spans hosts).
    for label, chips in (("v5p-8", 4), ("v5p-16", 8)):
        seen = set()
        for D, T in [(chips, 1), (chips // 2, 2), (2, chips // 2),
                     (1, chips)]:
            if D < 1 or T < 1 or D * T != chips or B % D or (D, T) in seen:
                continue
            seen.add((D, T))
            views = B // D
            add(label, "A band", f"d{D}xt{T}", D, T,
                band_train_comm(B, H, W, N, D, T),
                band_compute(views, step_v5p, T, args.band_nonscaling))
            add(label, "B zero", f"d{D}xt{T}", D, T,
                gauss_train_comm(B, H, W, N, D, T),
                band_compute(views, step_v5p, T, 0.02))
    # serving at 1080p truncated (33.1 ms v5e -> /2.5 on v5p, /T bands;
    # per-frame demand probe + binning are band-local, nonscaling ~0.1)
    for T in (2, 4):
        comm = serving_comm(1080, 1920, T)
        compute = band_compute(1, 33.1e-3 / args.v5p_speedup, T, 0.10)
        step, t_comm = efficiency(comm, compute, ICI_BW["v5p"])
        ideal = 33.1e-3 / args.v5p_speedup / T
        rows.append({
            "slice": "serve", "family": "C serve", "mesh": f"t{T}",
            "step_ms": round(step * 1e3, 2),
            "comm_ms": round(t_comm * 1e3, 3),
            "ici_GB": round(comm["tile_bytes"] / GB, 4),
            "xaxis_GB": 0.0, "eff": round(ideal / step, 4),
        })
    # pessimistic: 'data' axis crosses DCN (2 slices), family A/B best mesh
    D, T = 2, 4  # data across 2 slices, tile on ICI inside each
    add("2xslice(DCN)", "A band", f"d{D}xt{T}", D, T,
        band_train_comm(B, H, W, N, D, T),
        band_compute(B // D, step_v5p, T, args.band_nonscaling), dcn=True)
    add("2xslice(DCN)", "B zero", f"d{D}xt{T}", D, T,
        gauss_train_comm(B, H, W, N, D, T),
        band_compute(B // D, step_v5p, T, 0.02), dcn=True)

    if args.json:
        print(json.dumps(rows))
        return
    hdr = f"{'slice':>14} {'family':>7} {'mesh':>7} {"step ms":>8} " \
          f"{'comm ms':>8} {'ICI GB':>8} {'x GB':>8} {'eff':>7}"
    print(hdr)
    for r in rows:
        print(f"{r['slice']:>14} {r['family']:>7} {r['mesh']:>7} "
              f"{r["step_ms"]:>8} {r['comm_ms']:>8} {r['ici_GB']:>8} "
              f"{r['xaxis_GB']:>8} {r['eff']:>7}")


if __name__ == "__main__":
    main()
