import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", False)

nx, C, NL = 63, 8, 4224
n = 1_000_000
key = jax.random.PRNGKey(0)
feat = jax.random.uniform(key, (nx, 10, C, NL), jnp.float32)
nslots = nx*C*NL
perm = jax.random.permutation(jax.random.PRNGKey(1), nslots)[: :]
ids_plane = jnp.where(perm < n, perm, n).astype(jnp.float32).reshape(nx, 1, C, NL)

@jax.jit
def unbin_scatter(feat, ids):
    valid = feat[:, 9].reshape(-1) > 0.25
    idx = jnp.where(valid, ids[:, 0].reshape(-1), n).astype(jnp.int32)
    vals = feat[:, 0:3].transpose(0, 2, 3, 1).reshape(-1, 3)
    return jnp.zeros((n + 1, 3), vals.dtype).at[idx].set(vals)[:n]

@jax.jit
def unbin_sorted(feat, ids):
    valid = feat[:, 9].reshape(-1) > 0.25
    idx = jnp.where(valid, ids[:, 0].reshape(-1), n).astype(jnp.int32)
    vals = feat[:, 0:3].transpose(0, 2, 3, 1).reshape(-1, 3)
    order = jnp.argsort(idx)
    return vals[order][:n]

for name, f in [("scatter", unbin_scatter), ("sorted", unbin_sorted)]:
    t0=time.perf_counter(); r = f(feat, ids_plane); r.block_until_ready()
    c = time.perf_counter()-t0
    t0=time.perf_counter(); r = f(feat, ids_plane); r.block_until_ready()
    print(name, "compile", round(c,2), "warm", round(time.perf_counter()-t0,3))
