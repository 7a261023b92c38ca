import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from jax import lax
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.cell_dense import migrate_flat

nx, ny, nz, C = 63, 63, 63, 8
SZ = nz + 1
NL = ((ny * SZ + SZ + 1 + 127)//128)*128
grid = GridSpec(origin=(0.,0.,0.), cell_size=0.0175, dims=(nx,ny,nz))
key = jax.random.PRNGKey(0)
feat = jax.random.uniform(key, (nx, 10, C, NL), jnp.float32)
ids = jnp.zeros((nx, 1, C, NL), jnp.float32)

def body(c, _):
    f, i, ov = c
    f2, i2, ov2 = migrate_flat(f, i, grid=grid, SZ=SZ, C=C)
    return (f2, i2, jnp.maximum(ov, ov2)), None

@jax.jit
def run(feat, ids):
    (f, i, ov), _ = lax.scan(body, (feat, ids, jnp.zeros((), jnp.int32)), None, length=3)
    return f, ov

t0=time.perf_counter(); r = run(feat, ids); r[0].block_until_ready(); print("compile+3", round(time.perf_counter()-t0,2))
t0=time.perf_counter(); r = run(feat, ids); r[0].block_until_ready(); print("3 in scan warm", round(time.perf_counter()-t0,3))

# and unjitted-composition check: single call, warm
f1 = jax.jit(lambda a,b: migrate_flat(a,b,grid=grid,SZ=SZ,C=C))
r = f1(feat, ids); r[0].block_until_ready()
t0=time.perf_counter()
for _ in range(3): r = f1(*r[:2])
r[0].block_until_ready(); print("3 solo chained", round(time.perf_counter()-t0,3))
