import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.cell_dense import migrate_flat

nx, ny, nz, C = 63, 63, 63, 8
SZ = nz + 1
NL = ((ny * SZ + SZ + 1 + 127)//128)*128
grid = GridSpec(origin=(0.,0.,0.), cell_size=0.0175, dims=(nx,ny,nz))
key = jax.random.PRNGKey(0)
feat = jax.random.uniform(key, (nx, 10, C, NL), jnp.float32)
ids = jnp.zeros((nx, 1, C, NL), jnp.float32)
f = jax.jit(lambda a, b: migrate_flat(a, b, grid=grid, SZ=SZ, C=C))
t0=time.perf_counter(); r = f(feat, ids); r[0].block_until_ready(); print("compile+run", time.perf_counter()-t0)
t0=time.perf_counter()
for _ in range(3):
    r = f(feat, ids)
r[0].block_until_ready(); print("per call", (time.perf_counter()-t0)/3)
