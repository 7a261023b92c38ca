"""FEA node ↔ rigid body anchors (ChLinkNodeFrame role).

Oracles: a plate anchored to a FIXED body equals the clamped-plate statics of
tests/test_shell.py; a plate anchored to a FREE body rides along in free fall
(near-zero internal reactions)."""

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.fea.shell import ShellBuilder, gravity_loads
from chrono_tpu.fea.coupling import (
    make_anchors, make_coupled_step, CoupledState,
)
from chrono_tpu.physics.builder import SystemBuilder


def _plate_on_body(body_fixed, E_=2e9, rho=1000.0, t=0.01, Lx=0.5, Ly=0.1):
    bld_b = SystemBuilder()
    bld_b.set_gravity((0, 0, -9.81))
    block = bld_b.add_body(mass=50.0, inertia=(2.0, 2.0, 2.0),
                           pos=(0, 0.05, 0), fixed=body_fixed)
    model, bodies = bld_b.finalize()

    sb = ShellBuilder()
    ids = sb.add_plate((0, 0, 0), 6, 1, Lx, Ly, t, E_, 0.3, rho,
                       fix_edge="x0")       # x0 nodes are the anchored ones
    mesh, q = sb.finalize()

    # anchor the clamped-edge nodes to the block (offsets in its local frame)
    pairs = []
    for j in range(ids.shape[1]):
        n = int(ids[0, j])
        p = np.asarray(q[n, 0:3]) - np.array([0, 0.05, 0])  # body at (0,.05,0)
        pairs.append((n, block, p, np.array([0.0, 0.0, 1.0])))
    anchors = make_anchors(pairs)
    return model, bodies, mesh, q, ids, anchors, block


def test_anchored_to_fixed_body_matches_clamped_statics():
    E_, rho, t, Lx = 2e9, 1000.0, 0.01, 0.5
    model, bodies, mesh, q, ids, anchors, block = _plate_on_body(True)
    n_nodes = q.shape[0]
    f_grav = gravity_loads(mesh, n_nodes, (0, 0, -9.81))
    h = 3e-3
    step = make_coupled_step(model, mesh, anchors, h, f_ext_nodes=f_grav)
    st = CoupledState(bodies=bodies, q=q, qd=jnp.zeros_like(q),
                      qdd=jnp.zeros_like(q), time=jnp.zeros(()))
    for _ in range(400):                    # ring down (plate has damping)
        st = step(st)
    w_tip = -np.asarray(st.q)[np.asarray(ids[-1, :]), 2].mean()
    p = rho * t * 9.81
    w_beam = p * Lx**4 * 12 / (8 * E_ * t**3)
    assert 0.85 * w_beam * (1 - 0.09) < w_tip < 1.1 * w_beam, \
        (w_tip, w_beam)
    # anchored nodes stayed exactly on the (fixed) body frame
    xa = np.asarray(st.q)[np.asarray(ids[0, :]), 0:3]
    np.testing.assert_allclose(xa[:, 2], 0.0, atol=1e-7)


def test_anchored_plate_rides_free_fall():
    """Zero-gravity-gradient sanity: body + plate in free fall accelerate at
    g together with near-zero coupling reactions."""
    # soft plate: the explicit exchange must resolve ω=√(K_anchor/m_body)
    model, bodies, mesh, q, ids, anchors, block = _plate_on_body(False,
                                                                 E_=2e7)
    n_nodes = q.shape[0]
    f_grav = gravity_loads(mesh, n_nodes, (0, 0, -9.81))
    h = 1e-3
    step = make_coupled_step(model, mesh, anchors, h, f_ext_nodes=f_grav)
    st = CoupledState(bodies=bodies, q=q, qd=jnp.zeros_like(q),
                      qdd=jnp.zeros_like(q), time=jnp.zeros(()))
    for _ in range(150):
        st = step(st)
    t = float(st.time)
    vz = float(st.bodies.v[block, 2])
    # slight overweight: anchored-node weight transfers without its
    # inertia (explicit coupling) — ~10% at this mass ratio
    np.testing.assert_allclose(vz, -9.81 * t, rtol=0.12)
    # plate tip also in free fall (trails by at most a few percent)
    tip_z = np.asarray(st.q)[np.asarray(ids[-1, :]), 2].mean()
    z_ff = -0.5 * 9.81 * t * t
    assert abs(tip_z - z_ff) < 0.25 * abs(z_ff), (tip_z, z_ff)
