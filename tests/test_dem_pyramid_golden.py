"""Reference DEM pyramid test, restarted from the reference's own checkpoint
fixture (utest_DEM_pyramid.cpp + data/testing/dem/pyramid_checkpoint.dat):
two settled base spheres, a third dropped on top.

 * hold case (mu=0.5, Schwartz rolling mu_r=0.2): the top ball stays
   supported (z > 2R) — and the pyramid is symmetric (y ~ 0);
 * collapse case (mu=0.01, no rolling resistance): the top ball squeezes
   through and ends on the ground plane (z ~ R).

Also checks the analytic free-fall contact time, as the reference does.
"""

import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

CKPT = "/root/reference/data/testing/dem/pyramid_checkpoint.dat"

pytestmark = pytest.mark.skipif(not os.path.isfile(CKPT),
                                reason="reference checkpoint not available")


def _load(mu, rolling, mu_r):
    from chrono_tpu.io import dem_system_from_checkpoint
    from chrono_tpu.dem.bc import PlaneBCs

    sys, fixed = dem_system_from_checkpoint(CKPT, rebuild_every=4)
    assert bool(fixed[2]) and not fixed[:2].any()
    # ground plane at z=0 (the reference test adds it after load)
    ground = PlaneBCs(point=jnp.asarray([[0.0, 0.0, 0.0]]),
                      normal=jnp.asarray([[0.0, 0.0, 1.0]]),
                      vel=jnp.zeros((1, 3)))
    sys.set_boundaries(planes=ground)
    sys.retune(material=dict(mu_s=mu, mu_r=mu_r),
               wall_material=dict(mu_s=mu, mu_r=mu_r),
               rolling_mode=rolling)
    return sys


def _params():
    from chrono_tpu.io import parse_dem_checkpoint
    p = parse_dem_checkpoint(CKPT)["params"]
    r = float(p["radius"])
    rho = float(p["density"])
    mass = 4.0 / 3.0 * math.pi * r**3 * rho
    return r, mass


@pytest.mark.parametrize("hold", [True, False])
def test_pyramid(hold):
    r, mass = _params()
    inertia = 0.4 * mass * r * r
    if hold:
        sys = _load(mu=0.5, rolling="schwartz", mu_r=0.2)
    else:
        sys = _load(mu=0.01, rolling="none", mu_r=0.0)

    z0 = float(sys.state.pos[2, 2])
    g = 9.81
    z_contact = (1.0 + math.sqrt(3.0)) * r
    t_contact = math.sqrt(2.0 * (z0 - z_contact) / g)

    # free-fall phase: advance until the top ball reaches the contact height
    t, contact_t = 0.0, None
    step = float(sys.params.dt) * 4        # one rebuild cycle
    while t < 1.5:
        sys.advance(step)
        t += step
        if abs(float(sys.state.pos[2, 2]) - z_contact) < 2e-3:
            contact_t = t
            break
        if float(sys.state.pos[2, 2]) < z_contact - 2e-3:
            contact_t = t                  # crossed within one cycle
            break
    assert contact_t is not None
    assert abs(contact_t - t_contact) < 5e-3, (contact_t, t_contact)

    # settling phase: the reference breaks on top-ball KE < 1e-7; chrono_tpu
    # retains ~mm/s numerical jitter at rest (different integrator/unit
    # system), so settle on the physical criterion instead: the top ball's
    # HEIGHT is stationary over the last 0.3 s
    z_hist = []
    while t < 1.5:
        sys.advance(0.01)
        t += 0.01
        z_hist.append(float(sys.state.pos[2, 2]))
        if t < 2 * t_contact or len(z_hist) < 30:
            continue
        if max(z_hist[-30:]) - min(z_hist[-30:]) < 1e-4:
            break
    assert max(z_hist[-30:]) - min(z_hist[-30:]) < 1e-4, \
        "top ball never settled"

    pos = np.asarray(sys.state.pos[2])
    assert abs(pos[1]) < 1e-3
    if hold:
        assert pos[2] > 2 * r, f"pyramid collapsed in the hold case: {pos}"
    else:
        assert abs(pos[2] - r) < 5e-3, f"pyramid held in the collapse case: {pos}"
