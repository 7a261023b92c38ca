import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.cell_dense import migrate_flat
print(jax.devices())

nx, ny, nz, C = 63, 63, 63, 8
SZ = nz + 1
NL = ((ny * SZ + SZ + 1 + 127)//128)*128
n = 1_000_000
grid = GridSpec(origin=(0.,0.,0.), cell_size=0.0175, dims=(nx,ny,nz))
key = jax.random.PRNGKey(0)
feat = jax.random.uniform(key, (nx, 10, C, NL), jnp.float32)
ids = jnp.zeros((nx, 1, C, NL), jnp.float32)

f1 = jax.jit(lambda a,b: migrate_flat(a,b,grid=grid,SZ=SZ,C=C))
r = f1(feat, ids); float(r[0].sum())
t0=time.perf_counter()
s = 0.0
for k in range(3):
    r = f1(feat + k*1e-9, ids)
    s += float(r[0][0,0,0,0])
print("3 migrations (forced)", round(time.perf_counter()-t0,3))

@jax.jit
def srt(x):
    return jnp.argsort(x)[:4]
x = jax.random.uniform(jax.random.PRNGKey(2), (2_100_000,))
r = srt(x); np.asarray(r)
t0=time.perf_counter(); r = srt(x + 1e-9); np.asarray(r)
print("argsort 2.1M (forced)", round(time.perf_counter()-t0,3))
