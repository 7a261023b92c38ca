"""RoboSimian-class limbed robot: stance geometry, recorded-gait programs,
and wheel-driving locomotion through NSC contact
(reference: chrono_models/robot/robosimian/ + its driving actuation data)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.models.robosimian import (
    gait_programs, create_robosimian, load_actuation, WHEEL_RADIUS,
)

CYCLE = "/root/reference/data/robot/robosimian/actuation/driving_cycle.txt"
START = "/root/reference/data/robot/robosimian/actuation/driving_start.txt"


@pytest.fixture(scope="module")
def driving():
    progs, posture, T = gait_programs(CYCLE)
    post = posture.reshape(4, 8).copy()
    speeds = post[:, 7].copy()     # driving mode: joint8 column = wheel speed
    post[:, 7] = 0.0
    return progs, post, speeds, T


def test_stance_geometry(driving):
    """All four wheels touch the ground in a symmetric stance; the chassis
    rides flipped (QuatFromAngleX(pi), as the reference demos deploy it)."""
    _, post, speeds, _ = driving
    model, state, coll, chassis, wheels = create_robosimian(
        post.reshape(-1), speeds)
    wp = np.asarray(state.x)[wheels]
    np.testing.assert_allclose(wp[:, 2], WHEEL_RADIUS, atol=1e-5)
    # stance symmetry: x and y mirrored across the chassis
    assert abs(wp[0, 0] + wp[1, 0]) < 1e-4 and abs(wp[0, 1] + wp[3, 1]) < 1e-4
    assert float(state.x[chassis, 2]) > 0.5
    np.testing.assert_allclose(np.asarray(state.q[chassis]), [0, 1, 0, 0],
                               atol=1e-6)


def test_gait_program_phases():
    """RS_Driver role: start + repeated cycle concatenate into monotone,
    zero-based per-motor programs."""
    progs, posture, T = gait_programs(CYCLE, n_cycles=2, start_path=START)
    ts0, qs0 = load_actuation(START)
    tsc, _ = load_actuation(CYCLE)
    assert T > float(ts0[-1] + 2 * tsc[-1]) - 0.1
    for p in progs[:4]:
        t = np.asarray(p.ts)
        assert np.all(np.diff(t) > 0)
        assert abs(float(p.value(0.0))) < 1e-6
    assert len(progs) == 32


def test_driving_locomotion(driving):
    """Wheel-speed actuation rolls the robot forward at ~the rolling speed,
    level and straight (the reference's driving mode on rigid terrain)."""
    from chrono_tpu.collision.pipeline import nsc_step
    from chrono_tpu.physics.system import SolverSettings

    _, post, speeds, _ = driving
    speeds = 4.0 * speeds                     # 1.6 rad/s wheels
    model, state, coll, chassis, wheels = create_robosimian(
        post.reshape(-1), speeds)
    settings = SolverSettings(solver="apgd", max_iter=60, stab_factor=0.2)
    h = 2e-3
    step = jax.jit(lambda s, t: nsc_step(model, coll, s, t, h, settings))
    x0 = np.asarray(state.x[chassis]).copy()
    t = 0.0
    n = 300
    for _ in range(n):
        state, _, _ = step(state, t)
        t += h
    x1 = np.asarray(state.x[chassis])
    d = x1 - x0
    v_roll = abs(float(speeds[0])) * WHEEL_RADIUS
    # forward advance within 40% of pure rolling (settling + micro-slip)
    assert d[0] > 0.5 * v_roll * n * h, f"advance {d[0]:.3f}"
    assert d[0] < 1.3 * v_roll * n * h
    assert abs(d[1]) < 0.2 * abs(d[0])        # straight
    assert abs(d[2]) < 0.05                   # level ride
    # still upright (chassis x-flip preserved)
    assert abs(float(state.q[chassis, 1])) > 0.99
