#!/bin/bash
cd /root/repo
python scripts/train_synthetic.py --iterations 2000 --capacity 131072 \
  --gt_gaussians 40000 --init_fraction 0.5 --height 540 --width 960 \
  --max_pairs 1048576 --views 24 --output_dir /tmp/synth_run
python - <<'PY'
import numpy as np, os
d = np.load("/tmp/synth_run/checkpoint_final.npz")
os.makedirs("/root/repo/bench_assets", exist_ok=True)
keep = {k: d[k] for k in d.files if k.startswith("param_") or k == "__alive__"}
keep["__step__"] = d["__step__"]
keep["__num_opt_leaves__"] = 0
np.savez_compressed("/root/repo/bench_assets/trained_ckpt.npz", **keep)
print("saved", sum(v.nbytes for v in keep.values())/1e6, "MB raw")
PY
echo MAKE_CKPT_DONE
