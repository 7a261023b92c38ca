"""Von Mises (J2) elastoplasticity for the continuum elements.

Counterpart of the reference's ChContinuumPlasticVonMises
(/root/reference/src/chrono/fea/ChContinuumMaterial.h — elastoplastic
continuum with von Mises yield, used by the corotational tetra family).
Path dependence breaks the pure-energy element pattern, so this module
carries an explicit PLASTIC STATE alongside q and exposes:

* :func:`return_map` — vmapped radial-return stress update per element
  (elastic predictor / plastic corrector, linear isotropic hardening),
* :func:`internal_forces` — nodal forces from the return-mapped stress
  (exact B-matrix via autodiff of the frozen-stress virtual work),
* :func:`plastic_step` — one strain-driven increment: update state, then
  forces.

Strains are small-strain (ε = sym ∇u) on the constant-gradient tetra —
the same regime the reference's corotational plasticity targets (large
rotation handled by the corotation, small plastic stretch per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.fea.tetra import TetraMesh
from chrono_tpu.utils.pytree import pytree_dataclass


@pytree_dataclass
class PlasticParams:
    sigma_y: Array        # initial yield stress
    H: Array              # linear isotropic hardening modulus


@pytree_dataclass
class PlasticState:
    eps_p: Array          # (E, 3, 3) plastic strain (deviatoric, symmetric)
    alpha: Array          # (E,) accumulated equivalent plastic strain


def init_state(mesh: TetraMesh) -> PlasticState:
    ne = mesh.elems.shape[0]
    return PlasticState(eps_p=jnp.zeros((ne, 3, 3)),
                        alpha=jnp.zeros((ne,)))


def _strain(q_elem, q0_elem, Dm_inv):
    u = q_elem[:, 0:3] - q0_elem[:, 0:3]
    dU = jnp.stack([u[1] - u[0], u[2] - u[0], u[3] - u[0]], axis=1)
    H = dU @ Dm_inv
    return 0.5 * (H + H.T)


def return_map(mesh: TetraMesh, par: PlasticParams, state: PlasticState,
               q: Array):
    """Radial-return update; returns (new_state, sigma (E, 3, 3))."""
    qe = q[mesh.elems]
    q0e = mesh.q0[mesh.elems]
    p = mesh.props
    eps = jax.vmap(_strain)(qe, q0e, p.Dm_inv)          # (E, 3, 3)

    lam = p.E * p.nu / ((1 + p.nu) * (1 - 2 * p.nu))
    mu = p.E / (2 * (1 + p.nu))

    def one(eps_e, eps_p, alpha, lam, mu):
        ee = eps_e - eps_p
        tr = jnp.trace(ee)
        sig_tr = lam * tr * jnp.eye(3) + 2.0 * mu * ee
        s = sig_tr - jnp.trace(sig_tr) / 3.0 * jnp.eye(3)
        q_tr = jnp.sqrt(1.5 * jnp.sum(s * s) + 1e-30)
        f = q_tr - (par.sigma_y + par.H * alpha)
        dg = jnp.maximum(f, 0.0) / (3.0 * mu + par.H)
        n = s / q_tr
        eps_p2 = eps_p + 1.5 * dg * n
        alpha2 = alpha + dg
        sig = sig_tr - 3.0 * mu * dg * n
        return eps_p2, alpha2, sig

    eps_p2, alpha2, sig = jax.vmap(one)(eps, state.eps_p, state.alpha,
                                        lam * jnp.ones_like(p.E), mu)
    return PlasticState(eps_p=eps_p2, alpha=alpha2), sig


def internal_forces(mesh: TetraMesh, sigma: Array, q: Array) -> Array:
    """Nodal forces of the FROZEN stress field: f = −∂/∂q Σ V σ:ε(q)
    (σ detached — autodiff only materializes the exact Bᵀ operator)."""
    sig = jax.lax.stop_gradient(sigma)
    p = mesh.props

    def work(qq):
        qe = qq[mesh.elems]
        q0e = mesh.q0[mesh.elems]
        eps = jax.vmap(_strain)(qe, q0e, p.Dm_inv)
        return jnp.sum(p.vol[:, None, None] * sig * eps)

    return -jax.grad(work)(q)


def plastic_step(mesh: TetraMesh, par: PlasticParams, state: PlasticState,
                 q: Array):
    """One strain-driven increment at configuration ``q``: returns
    (new_state, nodal internal forces (Nn, 6))."""
    state2, sig = return_map(mesh, par, state, q)
    return state2, internal_forces(mesh, sig, q)


def vm_stress(sigma: Array) -> Array:
    """(E,) von Mises equivalent stress of a (E, 3, 3) stress field."""
    s = sigma - jnp.trace(sigma, axis1=1, axis2=2)[:, None, None] / 3.0 \
        * jnp.eye(3)[None]
    return jnp.sqrt(1.5 * jnp.sum(s * s, axis=(1, 2)))
