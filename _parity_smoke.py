import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platform_name", "cpu")
from chrono_tpu.fsi.sph.state import SPHParams
from chrono_tpu.fsi.sph.crm import CRMParams
from chrono_tpu.fsi.crm_terrain import (
    make_crm_terrain_state, wheel_bce_markers, CRMFSIState,
    crm_fsi_step, make_crm_fsi_advance_persistent)
from chrono_tpu.fsi.sph.crm_pencil import make_crm_substeps_pencil
from chrono_tpu.physics.builder import SystemBuilder

d0 = 0.02
params = SPHParams(d0=jnp.asarray(d0), h=jnp.asarray(1.2*d0),
    rho0=jnp.asarray(1700.0), mu=jnp.asarray(0.0), c_s=jnp.asarray(20.0),
    gravity=jnp.asarray([0.0,0.0,-9.81]), dt=jnp.asarray(1e-4),
    alpha_visc=jnp.asarray(0.3), kernel="cubic", max_neighbors=64,
    max_per_cell=48, rebuild_every=2)
crm = CRMParams(youngs=jnp.asarray(2e6), poisson=jnp.asarray(0.3),
    friction_angle=jnp.asarray(0.8), cohesion=jnp.asarray(1000.0))
bed=(0.20,0.12); depth=0.06; r_w, w_w = 0.04, 0.05; sink0=0.01
wl = wheel_bce_markers(r_w, w_w, d0)
x0 = np.array([0.08, bed[1]/2, depth + r_w + 0.5*d0 - sink0])
def carve(pts):
    dxz = pts[:,[0,2]] - x0[[0,2]]
    in_r = np.linalg.norm(dxz,axis=1) < (r_w + d0)
    in_y = np.abs(pts[:,1]-x0[1]) < (w_w/2 + d0)
    return ~(in_r & in_y)
bld = SystemBuilder(); bld.set_gravity((0,0,-9.81))
wheel = bld.add_body(mass=5.0, inertia=(0.02,0.03,0.02), pos=x0)
model, bodies = bld.finalize()
terrain, grid = make_crm_terrain_state(params, crm, bed, depth,
    rigid_pts=wl + x0, rigid_body_ids=[wheel]*len(wl), rigid_local=wl,
    carve_fn=carve, air=10.0)
print("markers:", terrain.pos.shape[0], flush=True)
def drive(t,b):
    f = jnp.zeros((model.n_bodies,3)); tau = jnp.zeros((model.n_bodies,3))
    return f, tau.at[wheel,1].set(1.0)
n_sub, n_outer = 2, 3
subs = make_crm_substeps_pencil(params, crm, grid, capacity=32, Bxy=2, interpret=True)
state0 = CRMFSIState(bodies=bodies, terrain=terrain, time=jnp.zeros(()))
with jax.disable_jit():
    ref = state0
    for _ in range(n_outer):
        ref, ov, _ = crm_fsi_step(model, params, crm, grid, ref, n_sub,
                                  [wheel], f_ext_fn=drive, substeps_fn=subs)
        assert int(ov)==0
    print("ref done", flush=True)
    adv1 = make_crm_fsi_advance_persistent(model, params, crm, grid,
        n_substeps=n_sub, wheel_bodies=[wheel], f_ext_fn=drive,
        pencil_capacity=32, pencil_Bxy=2, rebuild_outer=1, interpret=True)
    got1, ov1 = adv1(state0, n_outer)
    assert int(ov1)==0
    np.testing.assert_allclose(np.asarray(got1.bodies.x), np.asarray(ref.bodies.x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got1.bodies.v), np.asarray(ref.bodies.v), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got1.terrain.pos), np.asarray(ref.terrain.pos), rtol=1e-6, atol=1e-7)
    print("rebuild_outer=1 parity OK", flush=True)
    adv3 = make_crm_fsi_advance_persistent(model, params, crm, grid,
        n_substeps=n_sub, wheel_bodies=[wheel], f_ext_fn=drive,
        pencil_capacity=32, pencil_Bxy=2, rebuild_outer=3, interpret=True,
        dv_mode="last")
    got3, ov3 = adv3(state0, n_outer)
    assert int(ov3)==0
    dx = np.abs(np.asarray(got3.bodies.x) - np.asarray(ref.bodies.x))
    print("dv_mode=last rebuild=3 max dx:", dx.max(), flush=True)
    assert dx.max() < 2e-3
    assert np.isfinite(np.asarray(got3.terrain.pos)).all()
    print("ALL OK", flush=True)
