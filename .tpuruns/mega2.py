import time, numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from bench import make_scene, bench_checkpoint
from gsplat_tpu import RenderConfig, render_from_params
params = make_scene(2**17)
c2w = jnp.eye(4); fx = fy = jnp.float32(0.85*1920); cx = jnp.float32(960.); cy = jnp.float32(540.)
common = dict(height=1080, width=1920, max_pairs=5*2**19, max_per_tile=2048)
cfg_m = RenderConfig(backend="pallas_mega", **common)
f_m = jax.jit(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_m)[0])
scenes = [params]
for s in range(1,4):
    p2 = dict(params); p2["opacity_raw"] = p2["opacity_raw"] + 0.001*s; scenes.append(p2)
def t(f, iters=10):
    o = f(scenes[0]); jax.block_until_ready(o)
    t0=time.perf_counter()
    for i in range(iters): o=f(scenes[i % len(scenes)])
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/iters*1e3
print("fwd mega(4slot):", t(f_m), "ms", flush=True)
print(bench_checkpoint("bench_assets/trained_ckpt.npz", 1080, 1920, 15), flush=True)
print("DONE", flush=True)
