#!/bin/bash
# End-to-end CLI drive on the real TPU: synthesize a raw Mip-NeRF-style
# scene dir, prepare it, train briefly, evaluate, render an orbit.
set -e
cd /root/repo
RAW=/tmp/cli_raw; OUT=/tmp/cli_prepared; RUN=/tmp/cli_run; REN=/tmp/cli_renders
rm -rf $RAW $OUT $RUN $REN
python - <<'PY'
import numpy as np, os, struct, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gsplat_tpu import RenderConfig, render_from_params
from gsplat_tpu.data.images import save_image
from gsplat_tpu.viewer import look_at

# GT gaussian scene
rng = np.random.default_rng(0); n = 3000
pos = np.stack([rng.uniform(-1.5,1.5,n), rng.uniform(-1.0,1.0,n), rng.uniform(-1.5,1.5,n)], -1)
colors = rng.uniform(0.1, 0.9, (n,3))
params = {
  "pos": jnp.asarray(pos, jnp.float32),
  "scale_raw": jnp.asarray(rng.normal(0,0.2,(n,3)) - 3.0, jnp.float32),
  "q_raw": jnp.asarray(rng.normal(0,0.5,(n,4)) + [0,0,0,1.5], jnp.float32),
  "opacity_raw": jnp.asarray(rng.normal(1.5,0.5,n), jnp.float32),
  "f_dc": jnp.asarray(colors, jnp.float32),
  "f_rest": jnp.asarray(np.zeros((n,45), np.float32)),
}
H, W, F = 240, 320, 300.0
cfg = RenderConfig(height=H, width=W, max_pairs=2**16, backend="xla")
raw = "/tmp/cli_raw"
os.makedirs(os.path.join(raw, "images"), exist_ok=True)
n_views = 10
pb = np.zeros((n_views, 17))
center = np.zeros(3)
for i in range(n_views):
    th = 2*np.pi*i/n_views
    cam = center + np.array([3.6*np.sin(th), 0.6, -3.6*np.cos(th)])
    c2w = look_at(cam, center)  # z-forward OpenCV (right, down, forward)
    img, _ = render_from_params(params, jnp.asarray(c2w), F, F, W/2, H/2, cfg)
    save_image(os.path.join(raw, "images", f"{i:05d}.png"), np.asarray(img))
    # encode as LLFF poses_bounds: columns (down, right, back)
    R = c2w[:3,:3]; t = c2w[:3,3]
    m = np.zeros((3,5))
    m[:,0] = R[:,1]          # down
    m[:,1] = R[:,0]          # right
    m[:,2] = -R[:,2]         # back
    m[:,3] = t
    m[:,4] = [H, W, F]
    pb[i,:15] = m.reshape(-1); pb[i,15:] = [0.5, 10.0]
np.save(os.path.join(raw, "poses_bounds.npy"), pb)
# sparse points3D.bin (COLMAP binary) from the GT cloud
os.makedirs(os.path.join(raw, "sparse/0"), exist_ok=True)
with open(os.path.join(raw, "sparse/0/points3D.bin"), "wb") as f:
    f.write(struct.pack("<Q", n))
    for i in range(n):
        f.write(struct.pack("<Q", i))
        f.write(struct.pack("<3d", *pos[i]))
        f.write(struct.pack("<3B", *(colors[i]*255).astype(np.uint8)))
        f.write(struct.pack("<d", 0.1))
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iI", 1, 0))
print("raw scene written")
PY
python scripts/prepare_dataset.py mipnerf --input_dir $RAW --output_dir $OUT --scene_name test_scene --downsample 1
python scripts/train.py --data_dir $OUT --output_dir $RUN --iterations 300 \
  --scale_factor 1.0 --capacity 8192 --max_pairs 131072 \
  --densification_interval 100 --densify_until_iter 200 --checkpoint_interval 1000
python scripts/evaluate.py --checkpoint $RUN --data_dir $OUT --scale_factor 1.0 \
  --max_pairs 131072 --json
python scripts/render_trained.py --checkpoint $RUN --data_dir $OUT \
  --output_dir $REN --num_frames 6 --scale_factor 1.0 --max_pairs 131072
ls $REN | head -3
echo CLI_E2E_DONE
