"""Deformable ring tire (ChDeformableTire role): footprint statics — the
loaded ring flattens against the ground, deflection grows with load and
shrinks with foundation stiffness."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from chrono_tpu.fea.contact import NodeCloudContact
from chrono_tpu.fea.dynamics import make_hht_step
from chrono_tpu.vehicle.fea_tire import (
    build_ring_tire, make_tire_force_fn, footprint_deflection,
)


def _settle(load, spoke_k, steps=350):
    """Push the rim DOWN by prescribing the rim center lower than the free
    radius — the foundation transmits the load into the belt and the ground."""
    tire = build_ring_tire(radius=0.33, n_seg=16, spoke_k=spoke_k)
    contact = NodeCloudContact(
        node_radius=jnp.asarray(0.01), kn=jnp.asarray(5e5),
        gn=jnp.asarray(2e4), mu=jnp.asarray(0.8),
        plane_n=jnp.asarray([[0.0, 0.0, 1.0]]), plane_d=jnp.asarray([0.0]))
    drop = load / spoke_k           # rim drop that would transmit `load`/node
    center = jnp.asarray([0.0, 0.0, 0.33 + 0.01 - drop])
    f_fn = make_tire_force_fn(tire, contact,
                              rim_center_fn=lambda t: center)
    step = make_hht_step(tire.mesh, tire.q0.shape[0], h=5e-4,
                         newton_iters=6, tol=1e-3, f_state_fn=f_fn)
    q, qd, qdd = tire.q0, jnp.zeros_like(tire.q0), jnp.zeros_like(tire.q0)

    @functools.partial(jax.jit, static_argnums=1)
    def drive(carry, n):
        def body(c, _):
            q, qd, qdd = c
            out = step(q, qd, qdd, jnp.zeros_like(q))
            return (out.q, out.qd, out.qdd), None
        return jax.lax.scan(body, carry, None, length=n)[0]

    q, qd, qdd = drive((q, qd, qdd), steps)
    return tire, q, qd


def test_ring_flattens_on_ground():
    tire, q, qd = _settle(load=600.0, spoke_k=2e5)
    z = np.asarray(q[:, 2])
    assert np.isfinite(z).all()
    # bottom nodes pressed to the contact height (~node radius), not below 0
    assert z.min() > -0.005
    assert z.min() < 0.013
    # flattening: neighbors of the contact node pulled visibly down
    # (free-ring height of the adjacent node would be 0.33·(1−cos 22.5°)≈0.025)
    assert (z < 0.04).sum() >= 3
    # top of the ring barely moved
    assert abs(z.max() - 0.66) < 0.02
    # settled
    assert float(jnp.abs(qd[:, 0:3]).max()) < 0.6


def test_deflection_scales_with_load():
    _, q1, _ = _settle(load=300.0, spoke_k=2e5)
    t2, q2, _ = _settle(load=900.0, spoke_k=2e5)
    d1 = footprint_deflection(t2, q1)
    d2 = footprint_deflection(t2, q2)
    assert d2 > d1 + 1e-4, (d1, d2)


def test_stiffer_foundation_less_deflection():
    t1, q1, _ = _settle(load=600.0, spoke_k=1e5)
    t2, q2, _ = _settle(load=600.0, spoke_k=4e5)
    d1 = footprint_deflection(t1, q1)
    d2 = footprint_deflection(t2, q2)
    assert d1 > d2 - 1e-4, (d1, d2)
