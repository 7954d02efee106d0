import time, numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from bench import make_scene
from gsplat_tpu import RenderConfig, TrainConfig, render_from_params
from gsplat_tpu.models import init_pool_from_points
from gsplat_tpu.train import init_train_state, make_train_step

cfg = RenderConfig(height=540, width=960, max_pairs=2**20, max_per_tile=2048)
tcfg = TrainConfig(capacity=2**17, batch_size=1)
params = make_scene(2**17)
pts = np.concatenate([np.asarray(params["pos"]), np.zeros((2**17, 3), np.float32) + 0.5], axis=-1)
state = init_train_state(init_pool_from_points(pts, capacity=2**17), tcfg)
c2w = jnp.eye(4)
# device-resident target batches (4 distinct)
batches = []
for i in range(4):
    p2 = dict(params); p2["f_dc"] = p2["f_dc"] + 0.1 * i
    img, _ = render_from_params(p2, c2w, 816.0, 816.0, 480.0, 270.0, cfg)
    batches.append({
        "image": img[None], "c2w": c2w[None],
        "fx": jnp.asarray([816.0]), "fy": jnp.asarray([816.0]),
        "cx": jnp.asarray([480.0]), "cy": jnp.asarray([270.0]),
    })
jax.block_until_ready(batches)
step = make_train_step(cfg, tcfg)
state, m = step(state, batches[0])
jax.block_until_ready(m["total"])
print("compiled", flush=True)
t0 = time.perf_counter()
iters = 30
for i in range(iters):
    state, m = step(state, batches[i % 4])
jax.block_until_ready(m["total"])
dt = (time.perf_counter() - t0) / iters
print(f"train step 960x540 131k: {dt*1e3:.1f} ms = {1/dt:.2f} steps/s", flush=True)
print("DONE", flush=True)
