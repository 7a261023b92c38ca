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


class TestThermoElastic:
    def _bar(self, nx=6):
        from chrono_tpu.fea.solid import SolidBuilder
        b = SolidBuilder()
        b.add_block((0, 0, 0), nx, 1, 1, 0.6, 0.1, 0.1, E=2e9, nu=0.3,
                    rho=2000.0)
        return b.finalize()

    def test_free_expansion_matches_alpha_dT_L(self):
        """Uniformly heated free bar grows by α·ΔT·L (one end pinned in x)."""
        import numpy as np
        import jax.numpy as jnp
        from chrono_tpu.fea.thermoelastic import thermoelastic_static_solve

        mesh, q0 = self._bar()
        n = q0.shape[0]
        alpha, dT, L = 1.2e-5, 80.0, 0.6
        T = jnp.full((n,), dT)
        fixed = jnp.asarray(np.asarray(q0[:, 0]) < 1e-9)
        q = thermoelastic_static_solve(mesh, q0, T, alpha, T_ref=0.0,
                                       fixed=fixed)
        dx = float(q[:, 0].max() - q0[:, 0].max())
        # fully-clamped root face blocks lateral expansion there (Poisson
        # boundary layer adds ~5% axial push vs the free-bar formula)
        np.testing.assert_allclose(dx, alpha * dT * L, rtol=0.09)

    def test_thermal_moment_bends_toward_cold_side(self):
        """Linear through-thickness temperature gradient bends the clamped
        bar toward the cold side (bimetal-strip behavior)."""
        import numpy as np
        import jax.numpy as jnp
        from chrono_tpu.fea.thermoelastic import thermoelastic_static_solve

        mesh, q0 = self._bar(nx=8)
        n = q0.shape[0]
        alpha = 1.2e-5
        z = np.asarray(q0[:, 2])
        T = jnp.asarray(100.0 * (z - z.mean()) / max(z.max() - z.mean(),
                                                     1e-9))
        fixed = jnp.asarray(np.asarray(q0[:, 0]) < 1e-9)
        q = thermoelastic_static_solve(mesh, q0, T, alpha, fixed=fixed)
        tip = np.asarray(q[np.asarray(q0[:, 0]) > 0.6 - 1e-6, 2])
        tip0 = np.asarray(q0[np.asarray(q0[:, 0]) > 0.6 - 1e-6, 2])
        # hot top expands → curls DOWN (toward cold bottom)
        dz = float((tip - tip0).mean())
        assert dz < -1e-4, dz
        # analytic curvature κ = α·ΔT_grad / h → tip sag κL²/2
        kappa = alpha * 200.0 / 0.1
        expect = -kappa * 0.6 ** 2 / 2.0
        np.testing.assert_allclose(dz, expect, rtol=0.3)
