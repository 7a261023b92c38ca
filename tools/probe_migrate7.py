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
    leaf = jax.tree.leaves(r)[0]; float(leaf.reshape(-1)[0])
    print(name, round((time.perf_counter()-t0)/3*1000, 1), "ms")

lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, NL), 2)

def mk_ok(A):
    pos = A[:, 0]; msk = A[:, 9]
    cp = jnp.concatenate([pos, jnp.roll(pos, 1, 2), jnp.roll(pos, -1, 2)], axis=1)
    cm = jnp.concatenate([msk, jnp.roll(msk, 1, 2), jnp.roll(msk, -1, 2)], axis=1)
    dest = jnp.clip(jnp.floor(cp * 57).astype(jnp.int32), 0, 62)
    return (cm > 0.5) & (dest == lane % 64)

@jax.jit
def v_ok(A):
    return mk_ok(A).astype(jnp.float32).sum()

@jax.jit
def v_okcum(A):
    okf = mk_ok(A).astype(jnp.float32)
    rank = jnp.cumsum(okf, axis=1) - okf
    return rank.sum()

@jax.jit
def v_full_lazy(A):
    # ok/rank from slim planes; features rolled on the fly in the place loop
    ok = mk_ok(A)
    okf = ok.astype(jnp.float32)
    rank = jnp.cumsum(okf, axis=1) - okf
    outs = []
    cand = jnp.concatenate([A, jnp.roll(A, 1, 3), jnp.roll(A, -1, 3)], axis=2)
    for s in range(C):
        sel = jnp.where(ok & (rank == jnp.float32(s)), 1.0, 0.0)
        outs.append(jnp.sum(sel[:, None] * cand, axis=2))
    return jnp.stack(outs, axis=2)

@jax.jit
def v_cumsum_only(A):
    okf = (A[:, :, 0:24, :] if False else jnp.tile(A[:, 0], (1, 3, 1))) > 0.5
    r = jnp.cumsum(okf.astype(jnp.float32), axis=1)
    return r.sum()

timeit("ok only        ", v_ok, A)
timeit("ok+cumsum      ", v_okcum, A)
timeit("full slim-rank ", v_full_lazy, A)
timeit("cumsum only    ", v_cumsum_only, A)
