"""FEA mesh ↔ rigid body coupling (ChLinkNodeFrame / ChLinkNodeSlopeFrame).

Counterpart of the reference's mesh-to-body links
(/root/reference/src/chrono/fea/ChLinkNodeFrame.h — pin an FEA node to a
frame on a rigid body): anchored nodes are kinematically slaved to their
body's frame (position + director), and the constraint reaction — read off
the FEA internal forces at the anchored nodes — loads the body back.  This
is the explicit (per-outer-step) force coupling used throughout the TPU
build's co-simulation layers (same pattern as the FSI BCE exchange).

Works for any mesh type handled by chrono_tpu.fea.dynamics (cable, shell).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q
from chrono_tpu.fea import dynamics as fd
from chrono_tpu.physics.system import (
    Model, SolverSettings, step_euler_implicit_linearized,
)


@pytree_dataclass
class NodeBodyAnchors:
    """A anchored nodes: node i follows body b at local offset ξ with its
    director slaved to a body-local direction."""

    node: Array        # (A,) int32
    body: Array        # (A,) int32
    offset: Array      # (A, 3) body-local anchor position
    director: Array    # (A, 3) body-local director direction


def make_anchors(pairs) -> NodeBodyAnchors:
    """pairs: list of (node, body, offset_local, director_local)."""
    import numpy as np

    return NodeBodyAnchors(
        node=jnp.asarray([p[0] for p in pairs], jnp.int32),
        body=jnp.asarray([p[1] for p in pairs], jnp.int32),
        offset=jnp.asarray(np.stack([p[2] for p in pairs]), jnp.float32),
        director=jnp.asarray(np.stack([p[3] for p in pairs]), jnp.float32))


def slave_nodes(anchors: NodeBodyAnchors, q_nodes, qd_nodes, body_state):
    """Write body-frame kinematics into the anchored nodes' (r, d) dofs."""
    b = anchors.body
    xb, qb = body_state.x[b], body_state.q[b]
    vb = body_state.v[b]
    w_world = Q.qrotate(qb, body_state.w[b])
    r_w = Q.qrotate(qb, anchors.offset)
    pos = xb + r_w
    vel = vb + jnp.cross(w_world, r_w)
    d_w = Q.qrotate(qb, anchors.director)
    dd_w = jnp.cross(w_world, d_w)
    q_nodes = q_nodes.at[anchors.node, 0:3].set(pos)
    q_nodes = q_nodes.at[anchors.node, 3:6].set(d_w)
    qd_nodes = qd_nodes.at[anchors.node, 0:3].set(vel)
    qd_nodes = qd_nodes.at[anchors.node, 3:6].set(dd_w)
    return q_nodes, qd_nodes


@pytree_dataclass
class CoupledState:
    bodies: object      # BodyState
    q: Array
    qd: Array
    qdd: Array
    time: Array


def make_coupled_step(model: Model, mesh, anchors: NodeBodyAnchors,
                      h: float, hht_alpha: float = -0.2,
                      settings: SolverSettings = SolverSettings(
                          solver="direct"),
                      f_ext_nodes=None):
    """Fused rigid-MBS + FEA step with node-frame anchors.

    Per step: slave anchored nodes to body kinematics → FEA HHT step →
    anchor reactions load the bodies → MBS DVI step.

    STABILITY: the exchange is explicit (like the reference's FSI force
    coupling), so the step must resolve the anchor-stiffness frequency:
    h < ~1/ω with ω² = K_anchor/m_body, K_anchor the mesh stiffness seen at
    the anchored nodes.  Very stiff meshes on light bodies need smaller h
    (or a monolithic solve — roadmap).
    """
    n_nodes = mesh.q0.shape[0] if hasattr(mesh, "q0") else None
    if n_nodes is None:
        n_nodes = mesh.fixed.shape[0]
    hht = fd.make_hht_step(mesh, n_nodes, h, alpha=hht_alpha,
                           newton_iters=8, tol=1e-4)
    nb = model.n_bodies

    def step(state: CoupledState):
        q, qd = slave_nodes(anchors, state.q, state.qd, state.bodies)
        fe = jnp.zeros_like(q) if f_ext_nodes is None else f_ext_nodes
        out = hht(q, qd, state.qdd, fe)
        # reactions on bodies from the post-step mesh configuration: node
        # force balance 0 = f_int + f_ext + f_support ⇒ the force the node
        # transmits TO the body is +(f_int + f_ext) (Newton's third law on
        # the support force)
        f_tot = fd.internal_forces(mesh, out.q) + fe
        f_node = f_tot[anchors.node, 0:3]
        tau_dir = f_tot[anchors.node, 3:6]
        b = anchors.body
        qb = state.bodies.q[b]
        r_w = Q.qrotate(qb, anchors.offset)
        f_b = jnp.zeros((nb, 3)).at[b].add(f_node)
        tau_w = jnp.cross(r_w, f_node) + jnp.cross(
            Q.qrotate(qb, anchors.director), tau_dir)
        tau_b = jnp.zeros((nb, 3)).at[b].add(
            Q.qrotate_inv(qb, tau_w))
        bodies, _ = step_euler_implicit_linearized(
            model, state.bodies, state.time, h, settings,
            f_ext=f_b, tau_ext=tau_b)
        # re-slave so the stored mesh state stays consistent with the bodies
        q2, qd2 = slave_nodes(anchors, out.q, out.qd, bodies)
        return CoupledState(bodies=bodies, q=q2, qd=qd2, qdd=out.qdd,
                            time=state.time + h)

    return jax.jit(step)
