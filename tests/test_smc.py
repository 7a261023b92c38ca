"""Penalty (SMC) contact tests — the ChSystemSMC force-model menu.

Validates restitution for Hertz/Hooke/Flores normal models, Hertzian static
penetration, the adhesion laws (Constant/DMT/Perko shift of the equilibrium),
and tangential friction (slide → roll).  Mirrors the physics checked by the
reference's utest_SMC_* unit tests (src/tests/unit_tests/smc)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chrono_tpu.core import quaternion as Q
from chrono_tpu.physics import SystemBuilder
from chrono_tpu.physics.smc import SMCParams, smc_step
from chrono_tpu.collision import (
    GridSpec, SphereShapes, BoxShapes, CollisionModel,
)

E, NU = 1e6, 0.3
R, M = 0.5, 1.0


def ball_scene(mu=0.0):
    b = SystemBuilder()
    g = b.add_ground()
    s = b.add_body(mass=M, inertia=(0.4 * M * R * R,) * 3,
                   pos=(0.0, 0.0, R + 0.01))
    model, state = b.finalize()
    spheres = SphereShapes(
        body=jnp.asarray([s], jnp.int32), offset=jnp.zeros((1, 3)),
        radius=jnp.asarray([R]), mu=jnp.asarray([mu]))
    boxes = BoxShapes(
        body=jnp.asarray([g], jnp.int32),
        pos=jnp.asarray([[0.0, 0.0, -0.5]]), rot=Q.qidentity((1,)),
        half=jnp.asarray([[5.0, 5.0, 0.5]]), mu=jnp.asarray([mu]))
    coll = CollisionModel(
        spheres=spheres, boxes=boxes,
        grid=GridSpec(origin=(-6.0, -6.0, -2.0), cell_size=1.2,
                      dims=(10, 10, 6)),
        max_per_cell=8, max_contacts=16)
    return model, coll, state, s


def run(model, coll, state, params, h, n):
    @jax.jit
    def step_n(state):
        def body(carry, _):
            st, t = carry
            st, _, _ = smc_step(model, coll, st, t, h, params)
            return (st, t + h), (st.x[:, 2], st.v)
        (st, _), (zs, vs) = jax.lax.scan(body, (state, 0.0), None, length=n)
        return st, zs, vs
    return step_n(state)


def bounce_ratio(params, h=2e-4, v0=1.0):
    """Drop with impact speed v0; return rebound/impact speed ratio."""
    model, coll, state, s = ball_scene()
    state = state.replace(v=state.v.at[s, 2].set(-v0))
    _, zs, vs = run(model, coll, state, params, h, 600)
    vz = np.asarray(vs)[:, s, 2]
    return float(vz.max()) / v0


class TestRestitution:
    def test_hertz(self):
        ratio = bounce_ratio(SMCParams(
            youngs=E, poisson=NU, restitution=0.7, adhesion=0.0,
            force_model="hertz", tangential_model="none"))
        assert 0.55 < ratio < 0.85, ratio

    def test_hooke(self):
        # char_vel calibrated to the impact speed — e is then exact for the
        # linear model up to dt resolution
        ratio = bounce_ratio(SMCParams(
            youngs=E, poisson=NU, restitution=0.7, adhesion=0.0,
            char_vel=1.0, force_model="hooke", tangential_model="none"))
        assert 0.55 < ratio < 0.85, ratio

    def test_flores(self):
        ratio = bounce_ratio(SMCParams(
            youngs=E, poisson=NU, restitution=0.7, adhesion=0.0,
            char_vel=1.0, force_model="flores", tangential_model="none"))
        assert 0.4 < ratio < 0.95, ratio

    def test_hertz_more_dissipative_at_lower_e(self):
        hi = bounce_ratio(SMCParams(youngs=E, poisson=NU, restitution=0.9,
                                    force_model="hertz",
                                    tangential_model="none"))
        lo = bounce_ratio(SMCParams(youngs=E, poisson=NU, restitution=0.4,
                                    force_model="hertz",
                                    tangential_model="none"))
        assert lo < hi - 0.2


def settled_penetration(params, h=2e-4, n=3000):
    model, coll, state, s = ball_scene()
    _, zs, vs = run(model, coll, state, params, h, n)
    z = np.asarray(zs)[-1, s]
    return R - z  # ground top at z=0


class TestStaticsAndAdhesion:
    def test_hertz_static_penetration(self):
        params = SMCParams(youngs=E, poisson=NU, restitution=0.4,
                           force_model="hertz", tangential_model="none")
        delta = settled_penetration(params)
        E_star = E / (2 * (1 - NU * NU))
        expected = (M * 9.81 / ((4.0 / 3.0) * E_star * np.sqrt(R))) ** (2 / 3)
        np.testing.assert_allclose(delta, expected, rtol=0.1)

    @pytest.mark.parametrize("model_name,kw,f_adh", [
        ("constant", dict(adhesion=5.0), 5.0),
        ("dmt", dict(adhesion_mult_dmt=5.0 / np.sqrt(R)), 5.0),
        ("perko", dict(adhesion_s_perko=5.0 / R), 5.0),
    ])
    def test_adhesion_deepens_equilibrium(self, model_name, kw, f_adh):
        params = SMCParams(youngs=E, poisson=NU, restitution=0.4,
                           force_model="hertz", tangential_model="none",
                           adhesion_model=model_name, **kw)
        delta = settled_penetration(params)
        E_star = E / (2 * (1 - NU * NU))
        kn = (4.0 / 3.0) * E_star * np.sqrt(R)
        expected = ((M * 9.81 + f_adh) / kn) ** (2 / 3)
        np.testing.assert_allclose(delta, expected, rtol=0.1)


class TestFriction:
    def test_slide_becomes_roll(self):
        model, coll, state, s = ball_scene(mu=0.5)
        params = SMCParams(youngs=E, poisson=NU, restitution=0.4,
                           force_model="hertz", tangential_model="one_step")
        # settle first, then kick horizontally
        state, _, _ = run(model, coll, state, params, 2e-4, 800)
        state = state.replace(v=state.v.at[s, 0].set(2.0))
        h = 2e-4

        @functools.partial(jax.jit, static_argnums=1)
        def advance(state, n):
            def body(carry, _):
                st, t = carry
                st, _, _ = smc_step(model, coll, st, t, h, params)
                return (st, t + h), None
            (st, _), _ = jax.lax.scan(body, (state, 0.0), None, length=n)
            return st

        end = advance(state, 2000)
        v = float(end.v[s, 0])
        # body-frame ω → world; contact-point slip = v_x − ω_y·R
        w_world = np.asarray(Q.qrotate(end.q[s], end.w[s]))
        slip = v - w_world[1] * R
        assert 0.1 < v < 2.0          # decelerated but still moving
        assert abs(slip) < 0.15       # rolling without slip
        # frictionless control keeps sliding at full speed
        params0 = SMCParams(youngs=E, poisson=NU, restitution=0.4,
                            force_model="hertz", tangential_model="none")
        model0, coll0, state0, s0 = ball_scene(mu=0.0)
        state0, _, _ = run(model0, coll0, state0, params0, 2e-4, 800)
        state0 = state0.replace(v=state0.v.at[s0, 0].set(2.0))

        @functools.partial(jax.jit, static_argnums=1)
        def advance0(state, n):
            def body(carry, _):
                st, t = carry
                st, _, _ = smc_step(model0, coll0, st, t, h, params0)
                return (st, t + h), None
            (st, _), _ = jax.lax.scan(body, (state, 0.0), None, length=n)
            return st

        end0 = advance0(state0, 2000)
        np.testing.assert_allclose(float(end0.v[s0, 0]), 2.0, atol=0.05)
