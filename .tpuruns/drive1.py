import numpy as np, jax, jax.numpy as jnp
import gsplat_tpu as gs
rng = np.random.default_rng(7); n = 2000
params = {
  "pos": jnp.asarray(np.stack([rng.uniform(-2,2,n), rng.uniform(-2,2,n), rng.uniform(3,8,n)],-1), jnp.float32),
  "scale_raw": jnp.asarray(rng.normal(0,0.3,(n,3)) - 2.2, jnp.float32),
  "q_raw": jnp.asarray(rng.normal(0,1,(n,4)) + np.array([0,0,0,2]), jnp.float32),
  "opacity_raw": jnp.asarray(rng.normal(0.5,1,n), jnp.float32),
  "f_dc": jnp.asarray(rng.normal(0,0.8,(n,3)), jnp.float32),
  "f_rest": jnp.asarray(rng.normal(0,0.05,(n,45)), jnp.float32),
}
cfg = gs.RenderConfig(height=256, width=256, max_pairs=2**16, max_per_tile=256)
img, aux = gs.render_from_params(params, jnp.eye(4), 220.0, 220.0, 128.0, 128.0, cfg)
print("mean", float(img.mean()), "pairs", int(aux.num_pairs), flush=True)
tap = jnp.zeros((n, 2), jnp.float32)
g = jax.grad(lambda t: gs.render_from_params(params, jnp.eye(4), 220.0,220.0,128.0,128.0, cfg, uv_tap=t)[0].sum())(tap)
print("uv tap grad finite", bool(jnp.isfinite(g).all()), "norm", float(jnp.abs(g).sum()), flush=True)
print("DONE", flush=True)
