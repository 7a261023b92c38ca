import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.dem.params import DEMParams, DEMMaterial
from chrono_tpu.dem.bc import DEMBoundaries, box_boundaries
from chrono_tpu.dem.cell_dense import make_cell_dense_advance
from chrono_tpu.utils.samplers import grid_sample_box

n_target = 1_000_000
radius = 0.005
spacing = 2.1 * radius
n_side = int(np.ceil(n_target ** (1/3)))
box_w = n_side * spacing * 1.02
box_h = box_w * 1.6
mat = DEMMaterial(youngs=jnp.asarray(1e7), poisson=jnp.asarray(0.3),
                  restitution=jnp.asarray(0.5), mu_s=jnp.asarray(0.5))
mass = 2500.0 * 4/3*np.pi*radius**3
K = int(os.environ.get("K", 100))
params = DEMParams(radius=jnp.asarray(radius), mass=jnp.asarray(mass),
    material=mat, wall_material=mat, gravity=jnp.asarray([0.,0.,-9.81]),
    dt=jnp.asarray(2e-6), friction_mode="single_step", rebuild_every=K,
    max_neighbors=12, max_per_cell=16, skin=0.3)
bcs = DEMBoundaries(planes=box_boundaries((0,0,0),(box_w,box_w,box_h)))
pts = grid_sample_box((radius,)*3, (box_w-radius,)*2+(box_h-radius,), spacing, jitter=0.03, seed=0)[:n_target]
cell = 1.75*2*radius
z_hi = float(pts[:,2].max()) + radius
dims = (int(np.ceil(box_w/cell)), int(np.ceil(box_w/cell)), int(np.ceil(z_hi/cell))+1)
grid = GridSpec(origin=(0.,0.,0.), cell_size=cell, dims=dims)
pos = jnp.asarray(pts, jnp.float32); z = jnp.zeros_like(pos)

mode = sys.argv[1] if len(sys.argv) > 1 else "mig"
adv = make_cell_dense_advance(params, bcs, grid, capacity=8, backend="flat",
                              migrate=(mode=="mig"))
t0=time.perf_counter()
p,v,o,ov = adv(pos,z,z,1); p.block_until_ready()
print("compile+1cycle", round(time.perf_counter()-t0,2), "ovf", int(ov))
t0=time.perf_counter()
p,v,o,ov = adv(p,v,o,2); p.block_until_ready()
print("2 cycles warm", round(time.perf_counter()-t0,2))
