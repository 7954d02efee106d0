#!/bin/bash
cd /root/repo
python scripts/train_synthetic.py --iterations 800 --capacity 131072 \
  --gt_gaussians 120000 --gt_clusters 400 --gt_scale -3.5 \
  --height 540 --width 960 --max_pairs 2097152 --views 16 \
  --output_dir /tmp/synth_run3
python - <<'PY'
import numpy as np, os
d = np.load("/tmp/synth_run3/checkpoint_final.npz")
os.makedirs("/root/repo/bench_assets", exist_ok=True)
keep = {k: d[k] for k in d.files if k.startswith("param_") or k == "__alive__"}
keep["__step__"] = d["__step__"]
keep["__num_opt_leaves__"] = np.int32(0)
np.savez_compressed("/root/repo/bench_assets/trained_ckpt.npz", **keep)
print("saved OK")
PY
echo MAKE_CKPT3_DONE
