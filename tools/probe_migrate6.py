import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

nx, C, NL, F = 63, 8, 4224, 11
key = jax.random.PRNGKey(0)
A = jax.random.uniform(key, (nx, F, C, NL), jnp.float32)

def timeit(name, f, *args):
    r = f(*args); jax.tree.map(lambda x: x.block_until_ready(), r)
    t0=time.perf_counter()
    for k in range(3):
        r = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    # force a host fetch of a scalar to defeat async accounting
    leaf = jax.tree.leaves(r)[0]
    float(leaf.reshape(-1)[0])
    print(name, round((time.perf_counter()-t0)/3*1000, 1), "ms")

@jax.jit
def phase_cand(A):
    cand = jnp.concatenate([A, jnp.roll(A, 1, 3), jnp.roll(A, -1, 3)], axis=2)
    return cand

@jax.jit
def phase_rank(A):
    cand = jnp.concatenate([A, jnp.roll(A, 1, 3), jnp.roll(A, -1, 3)], axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NL), 2)
    dest = jnp.clip(jnp.floor(cand[:, 0] * 57).astype(jnp.int32), 0, 62)
    ok = (cand[:, 9] > 0.5) & (dest == lane % 64)
    okf = ok.astype(jnp.float32)
    rank = jnp.cumsum(okf, axis=1) - okf
    return rank

@jax.jit
def phase_full(A):
    cand = jnp.concatenate([A, jnp.roll(A, 1, 3), jnp.roll(A, -1, 3)], axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NL), 2)
    dest = jnp.clip(jnp.floor(cand[:, 0] * 57).astype(jnp.int32), 0, 62)
    ok = (cand[:, 9] > 0.5) & (dest == lane % 64)
    okf = ok.astype(jnp.float32)
    rank = jnp.cumsum(okf, axis=1) - okf
    outs = []
    for s in range(C):
        sel = jnp.where(ok & (rank == jnp.float32(s)), 1.0, 0.0)
        outs.append(jnp.sum(sel[:, None] * cand, axis=2))
    return jnp.stack(outs, axis=2)

timeit("cand ", phase_cand, A)
timeit("rank ", phase_rank, A)
timeit("full ", phase_full, A)
