#!/bin/bash
# Round-3 TPU measurement queue — run under nohup when the tunnel is healthy.
# Each stage appends to its own log; never kill mid-compile.
cd /root/repo
mkdir -p .tpuruns
set -x
date
# 1. health probe
timeout 600 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.ones((8,128)).sum()))
" || { echo TUNNEL-STILL-WEDGED; exit 1; }
date
# 2. full bench (headline + train-step scan-vs-batched)
python bench.py > .tpuruns/bench_r3.json 2> .tpuruns/bench_r3.err
date
# 3. trained-ckpt orbit A/B: rect vs ellipse cull vs cumprod transmittance.
CKPT=bench_assets/trained_ckpt.npz
ORBIT="python scripts/render_trained.py --checkpoint $CKPT --benchmark_only --num_frames 24"
$ORBIT --max_pairs 4194304 > .tpuruns/orbit_rect.log 2>&1
$ORBIT --max_pairs 4194304 --cull_mode ellipse > .tpuruns/orbit_ellipse.log 2>&1
$ORBIT --max_pairs 3145728 --cull_mode ellipse > .tpuruns/orbit_ellipse_smallcap.log 2>&1
$ORBIT --max_pairs 4194304 --transmittance_math cumprod > .tpuruns/orbit_cumprod.log 2>&1
$ORBIT --max_pairs 3145728 --cull_mode ellipse --transmittance_math cumprod > .tpuruns/orbit_both.log 2>&1
$ORBIT --max_pairs 4194304 --auto_pairs > .tpuruns/orbit_auto_rect.log 2>&1
$ORBIT --max_pairs 4194304 --auto_pairs --cull_mode ellipse > .tpuruns/orbit_auto_ellipse.log 2>&1
date
# 4. kernel instruction-class ablations
python scripts/profile_kernel.py --iters 20 > .tpuruns/profk_r3.log 2>&1
date
# 4b. stage-level rect-vs-ellipse on the trained checkpoint
python scripts/profile_stages.py --checkpoint $CKPT --max_pairs 4194304 \
  > .tpuruns/stages_rect.log 2>&1
python scripts/profile_stages.py --checkpoint $CKPT --max_pairs 3145728 \
  --cull_mode ellipse --max_rows 1048576 > .tpuruns/stages_ellipse.log 2>&1
date
# 5. batched orbit render B=4 (vs the B=1 rect baseline above)
$ORBIT --max_pairs 4194304 --render_batch 4 > .tpuruns/orbit_b4.log 2>&1
date
echo QUEUE-DONE
# 6. real-photo plane oracle at full scale
python scripts/train_photo.py --iterations 3000 --height 480 --width 640 \
  --n_views 24 --capacity 65536 --holdout_every 8 \
  --output_dir .tpuruns/photo_out > .tpuruns/photo_r3.log 2>&1
date
echo QUEUE-ALL-DONE
