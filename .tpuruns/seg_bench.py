import time, numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from bench import make_scene
from gsplat_tpu import RenderConfig, render_from_params

params = make_scene(2**17)
c2w = jnp.eye(4); fx = fy = jnp.float32(0.85*1920); cx = jnp.float32(960.); cy = jnp.float32(540.)
common = dict(height=1080, width=1920, max_pairs=5*2**19, max_per_tile=2048, tile_chunk=32)
cfg_seg = RenderConfig(backend="pallas_seg", **common)
cfg_old = RenderConfig(backend="pallas", **common)

f_seg = jax.jit(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_seg)[0])
f_old = jax.jit(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_old)[0])
t0 = time.time()
a = f_seg(params); a.block_until_ready(); print("seg fwd compiled", time.time()-t0, flush=True)
b = f_old(params); jax.block_until_ready(b)
print("img err seg vs aligned:", float(jnp.abs(a-b).max()), flush=True)
scenes = [params]
for s in range(1,4):
    p2 = dict(params); p2["opacity_raw"] = p2["opacity_raw"] + 0.001*s; scenes.append(p2)
def t(f, iters=10):
    o = f(scenes[0]); jax.block_until_ready(o)
    t0=time.perf_counter()
    for i in range(iters): o=f(scenes[i % len(scenes)])
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/iters*1e3
print("fwd seg:", t(f_seg), "ms", flush=True)
print("fwd old:", t(f_old), "ms", flush=True)
g_seg = jax.jit(jax.grad(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_seg)[0].sum()))
g_old = jax.jit(jax.grad(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_old)[0].sum()))
t0 = time.time()
ga = g_seg(params); jax.block_until_ready(ga); print("seg bwd compiled", time.time()-t0, flush=True)
gb = g_old(params); jax.block_until_ready(gb)
worst = max(float(jnp.abs(ga[k]-gb[k]).max()/(jnp.abs(gb[k]).max()+1e-12)) for k in ga)
print("worst grad rel err seg vs aligned:", worst, flush=True)
print("fwd+bwd seg:", t(g_seg, iters=6), "ms", flush=True)
print("fwd+bwd old:", t(g_old, iters=6), "ms", flush=True)
print("DONE", flush=True)
