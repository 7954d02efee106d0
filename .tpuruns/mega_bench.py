import time, numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from bench import make_scene
from gsplat_tpu import RenderConfig, render_from_params

params = make_scene(2**17)
c2w = jnp.eye(4); fx = fy = jnp.float32(0.85*1920); cx = jnp.float32(960.); cy = jnp.float32(540.)
common = dict(height=1080, width=1920, max_pairs=5*2**19, max_per_tile=2048, tile_chunk=32)
cfg_m = RenderConfig(backend="pallas_mega", **common)
cfg_o = RenderConfig(backend="pallas", **common)

f_m = jax.jit(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_m)[0])
f_o = jax.jit(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_o)[0])
t0 = time.time()
a = f_m(params); a.block_until_ready(); print("mega fwd compiled", time.time()-t0, flush=True)
b = f_o(params); jax.block_until_ready(b)
print("img err mega vs aligned:", float(jnp.abs(a-b).max()), flush=True)
scenes = [params]
for s in range(1,4):
    p2 = dict(params); p2["opacity_raw"] = p2["opacity_raw"] + 0.001*s; scenes.append(p2)
def t(f, iters=10):
    o = f(scenes[0]); jax.block_until_ready(o)
    t0=time.perf_counter()
    for i in range(iters): o=f(scenes[i % len(scenes)])
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/iters*1e3
print("fwd mega:", t(f_m), "ms", flush=True)
print("fwd old:", t(f_o), "ms", flush=True)
g_m = jax.jit(jax.grad(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_m)[0].sum()))
g_o = jax.jit(jax.grad(lambda p: render_from_params(p, c2w, fx, fy, cx, cy, cfg_o)[0].sum()))
t0 = time.time()
ga = g_m(params); jax.block_until_ready(ga); print("mega bwd compiled", time.time()-t0, flush=True)
gb = g_o(params); jax.block_until_ready(gb)
worst = max(float(jnp.abs(ga[k]-gb[k]).max()/(jnp.abs(gb[k]).max()+1e-12)) for k in ga)
print("worst grad rel err mega vs aligned:", worst, flush=True)
print("fwd+bwd mega:", t(g_m, iters=6), "ms", flush=True)
print("fwd+bwd old:", t(g_o, iters=6), "ms", flush=True)
print("DONE", flush=True)
