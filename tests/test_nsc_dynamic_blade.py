"""Dynamic (jointed) rotbox blade in the NSC Pallas DVI engine.

The blade's revolute joint to ground is solved in reduced coordinates
inside the APGD loop (the fused bilateral side-solve): its angular
velocity is a solver variable updated from the contact impulses every
iteration, with a constant drive torque (torque-motor role).  Reference:
the mixer blade driven through the descriptor's bilateral block
(/root/reference/src/tests/benchmark_tests/physics/btest_CH_mixerNSC.cpp:74-108,
src/chrono/solver/ChSystemDescriptor.cpp:519-600).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.solver.nsc_pencil import (
    NSCPencilParams, make_nsc_pencil_advance,
)

R_S = 0.05


def _scene(blade_torque, n_iter=30, backend="xla", interpret=True,
           with_particles=True):
    cell = 2.1 * R_S
    dims = (6, 6, 4)
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=cell, dims=dims)
    # blade center at sphere height so the ring and the blade overlap in z
    c = (3 * cell, 3 * cell, R_S)
    I_b = 0.05
    blade = ("rotbox", 2, c, (2.2 * R_S, 0.8 * R_S, 1.2 * R_S), 0.0, 0.3)
    walls = (
        ("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.4),
        blade,
    )
    p = NSCPencilParams(radius=R_S, mass=0.2, mu=0.3, dt=1e-3,
                        n_iter=n_iter, envelope=0.1 * R_S, omega=0.3,
                        blade_inertia=I_b, blade_torque=blade_torque)
    adv = make_nsc_pencil_advance(p, grid, walls, backend=backend,
                                  interpret=interpret, partners=8, Bxy=1)
    if with_particles:
        # two spheres at zero gap against the +v/−v faces near the blade
        # tips (θ=0: u = x, v = y) — the blade spins INTO them, so they
        # resist from the first step without a penetration-recovery kick
        du, dv = 1.6 * R_S, 0.8 * R_S + 1.001 * R_S
        pos = np.asarray([
            [c[0] + du, c[1] + dv, R_S],
            [c[0] - du, c[1] - dv, R_S],
        ])
    else:
        pos = np.asarray([[0.3, 0.3, 10.0]])   # far away: no contacts
    n = len(pos)
    z = jnp.zeros((n, 3), jnp.float32)
    return adv, jnp.asarray(pos, jnp.float32), z, p, I_b


def test_free_spinup_exact():
    """No contacts: I ω̇ = τ integrates exactly step by step."""
    tau = 0.02
    adv, pos, z, p, I_b = _scene(tau, with_particles=False)
    n = 10
    out = adv(pos, z, z, n, wspin0=np.zeros(1))
    wspin = out[-1]
    expect = n * p.dt * tau / I_b
    np.testing.assert_allclose(np.asarray(wspin)[0], expect, rtol=1e-5)


def test_contacts_resist_spinup():
    """Grounded spheres against the blade faces slow the blade below its
    free-spin speed and gain momentum from it."""
    tau = 5.0
    adv, pos, z, p, I_b = _scene(tau)
    n = 25
    out = adv(pos, z, z, n, wspin0=np.zeros(1))
    pos2, vel2, om2, ovf, wspin = out
    assert int(ovf) == 0
    w = float(np.asarray(wspin)[0])
    w_free = n * p.dt * tau / I_b
    assert np.isfinite(np.asarray(pos2)).all()
    assert 0.0 < w < 0.999 * w_free, (w, w_free)
    # the blade did positive work on the ring: some particle moved
    assert float(jnp.abs(vel2).max()) > 1e-4


def test_half_backend_matches_xla():
    """Dynamic blade on the Pallas half kernel (interpret) == the dense
    XLA reference: same spin trajectory and particle states."""
    tau = 0.05
    adv_x, pos, z, p, I_b = _scene(tau, backend="xla")
    adv_h, _, _, _, _ = _scene(tau, backend="half")
    n = 6
    px, vx, ox, ovx, wx = adv_x(pos, z, z, n, wspin0=np.zeros(1))
    ph, vh, oh, ovh, wh = adv_h(pos, z, z, n, wspin0=np.zeros(1))
    assert int(ovx) == 0 and int(ovh) == 0
    np.testing.assert_allclose(np.asarray(wh), np.asarray(wx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(px),
                               rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(vh), np.asarray(vx),
                               rtol=2e-3, atol=2e-5)
