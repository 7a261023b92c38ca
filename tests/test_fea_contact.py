"""FEA node-cloud contact surfaces (ChContactSurfaceNodeCloud role):
a beam dropped on the ground plane comes to rest at contact-sphere height;
friction holds it on a slope."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.fea.beam import BeamBuilder, gravity_loads
from chrono_tpu.fea.contact import NodeCloudContact, make_contact_force_fn
from chrono_tpu.fea.dynamics import make_hht_step

E_, G_, RHO = 1e8, 4e7, 1200.0
W = 0.05
A, I = W * W, W**4 / 12.0


def _beam(z0, n=6, L=0.6):
    b = BeamBuilder()
    ids = b.add_straight_beam((0, 0, z0), (L, 0, z0), n,
                              EA=E_ * A, GJ=G_ * 0.141 * W**4,
                              EIy=E_ * I, EIz=E_ * I, rhoA=RHO * A,
                              damping=5e-4)
    return b.finalize() + (ids,)


def _run_scanned(step, q, f, n):
    @functools.partial(jax.jit, static_argnums=2)
    def drive(carry, f, n):
        def body(c, _):
            q, qd, qdd = c
            out = step(q, qd, qdd, f)
            return (out.q, out.qd, out.qdd), None
        return jax.lax.scan(body, carry, None, length=n)[0]

    qd = jnp.zeros_like(q)
    return drive((q, qd, qd), f, n)


def test_beam_falls_and_rests_on_plane():
    r = 0.02
    mesh, q, ids = _beam(z0=0.15)
    cfg = NodeCloudContact(
        node_radius=jnp.asarray(r), kn=jnp.asarray(4e5),
        gn=jnp.asarray(5e4), mu=jnp.asarray(0.3),
        plane_n=jnp.asarray([[0.0, 0.0, 1.0]]), plane_d=jnp.asarray([0.0]))
    step = make_hht_step(mesh, q.shape[0], h=1e-3, newton_iters=8,
                         tol=1e-3, f_state_fn=make_contact_force_fn(cfg))
    f = gravity_loads(mesh, q.shape[0], (0, 0, -9.81))
    q, qd, qdd = _run_scanned(step, q, f, 700)
    z = np.asarray(q[np.asarray(ids), 2])
    assert np.isfinite(z).all()
    # rests on the plane: node centers near radius minus penalty penetration
    assert (z > 0.2 * r).all() and (z < 2.0 * r).all(), z
    v = np.asarray(qd[np.asarray(ids), 2])
    assert np.abs(v).max() < 0.05


def test_friction_holds_beam_on_slope():
    """Equivalent 15° incline via tilted gravity (tan 15° = 0.27): μ=0.6
    must hold the resting beam; μ=0.01 must let it slide visibly."""
    r = 0.02
    slope = np.radians(15.0)

    def run(mu, steps=500):
        mesh, q, ids = _beam(z0=0.022)
        cfg = NodeCloudContact(
            node_radius=jnp.asarray(r), kn=jnp.asarray(4e5),
            gn=jnp.asarray(5e4), mu=jnp.asarray(mu),
            v_reg=jnp.asarray(1e-3),
            plane_n=jnp.asarray([[0.0, 0.0, 1.0]]),
            plane_d=jnp.asarray([0.0]))
        step = make_hht_step(mesh, q.shape[0], h=1e-3, newton_iters=8,
                             tol=1e-3, f_state_fn=make_contact_force_fn(cfg))
        f = gravity_loads(mesh, q.shape[0],
                          (9.81 * np.sin(slope), 0, -9.81 * np.cos(slope)))
        q, qd, qdd = _run_scanned(step, q, f, steps)
        return float(np.asarray(q)[:, 0].mean()) - 0.3   # mean x at start

    x_stick = run(0.6)
    x_slip = run(0.01)
    assert abs(x_stick) < 0.02, x_stick          # held by friction
    assert x_slip > 0.10, x_slip                 # slides down (+x downhill)
