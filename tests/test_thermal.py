"""Thermal conduction on solid meshes vs analytic 1-D solutions
(role of the reference's fea/multiphysics thermal model)."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.fea.solid import SolidBuilder
from chrono_tpu.fea.thermal import make_thermal_step, lumped_capacity


def _rod(nx=16):
    b = SolidBuilder()
    ids = b.add_block((0, 0, 0), nx, 1, 1, 1.0, 0.1, 0.1, 1e6, 0.3, 1000.0)
    mesh, q = b.finalize()
    return mesh, q, ids


def test_steady_linear_profile():
    """Fixed end temperatures → steady linear T(x)."""
    mesh, q, ids = _rod()
    n_nodes = q.shape[0]
    x = np.asarray(q[:, 0])
    hold = (x < 1e-6) | (x > 1.0 - 1e-6)
    T = jnp.asarray(np.where(x < 1e-6, 100.0, 0.0), jnp.float32)
    step = make_thermal_step(mesh, n_nodes, h=20.0, k_cond=10.0,
                             rho_c=1000.0, dirichlet_mask=hold)
    qs = jnp.zeros((n_nodes,))
    for _ in range(400):
        T = step(T, qs)
    T_ref = 100.0 * (1.0 - x)
    np.testing.assert_allclose(np.asarray(T), T_ref, atol=1.5)


def test_transient_mode_decay():
    """Insulated rod, sinusoidal initial profile: decay rate k/(ρc)·(π/L)²."""
    mesh, q, ids = _rod(nx=20)
    n_nodes = q.shape[0]
    x = np.asarray(q[:, 0])
    k_cond, rho_c = 5.0, 2000.0
    T0 = np.cos(np.pi * x)                 # Neumann mode of an insulated rod
    T = jnp.asarray(T0, jnp.float32)
    h = 1.0
    step = make_thermal_step(mesh, n_nodes, h=h, k_cond=k_cond, rho_c=rho_c,
                             dirichlet_mask=np.zeros(n_nodes, bool))
    qs = jnp.zeros((n_nodes,))
    n_steps = 40
    for _ in range(n_steps):
        T = step(T, qs)
    lam = k_cond / rho_c * np.pi ** 2      # mode decay rate, L = 1
    # implicit Euler amplification per step: 1/(1 + λh)
    amp_ref = (1.0 / (1.0 + lam * h)) ** n_steps
    amp = float(jnp.vdot(jnp.asarray(T0), T) / np.dot(T0, T0))
    np.testing.assert_allclose(amp, amp_ref, rtol=0.1)
