"""Copter + turtlebot models (remaining chrono_models robot families)."""

import numpy as np
import jax.numpy as jnp


def test_copter_hovers_and_climbs():
    import jax
    from chrono_tpu.models.robots import (create_copter, copter_step,
                                          copter_hover_omega)

    copter, state = create_copter()
    w_h = float(copter_hover_omega(copter))
    h = 2e-3
    step = jax.jit(lambda st, om, t: copter_step(copter, st, om, t, h))
    # hover: stays at altitude
    st = state
    t = 0.0
    om = jnp.full((4,), w_h)
    for _ in range(300):
        st, _ = step(st, om, t)
        t += h
    assert abs(float(st.x[0, 2]) - 1.0) < 0.02
    assert abs(float(st.v[0, 2])) < 0.05
    # +5% rotor speed: climbs
    st2 = state
    for _ in range(300):
        st2, _ = step(st2, 1.05 * om, t)
    assert float(st2.x[0, 2]) > 1.05


def test_copter_yaw_from_differential_torque():
    from chrono_tpu.models.robots import (create_copter, copter_step,
                                          copter_hover_omega)
    from chrono_tpu.core import quaternion as Q

    import jax
    copter, st = create_copter()
    w_h = float(copter_hover_omega(copter))
    # speed up the CW pair, slow the CCW pair (same total thrust²-ish):
    d = 0.1 * w_h
    speeds = jnp.asarray([w_h + d, w_h - d, w_h + d, w_h - d])
    t, h = 0.0, 2e-3
    step = jax.jit(lambda s, om, tt: copter_step(copter, s, om, tt, h))
    for _ in range(400):
        st, _ = step(st, speeds, t)
        t += h
    # yaw rate developed about body z
    assert abs(float(st.w[0, 2])) > 0.3
    # no large pitch/roll (torques balance)
    up = np.asarray(Q.qrotate(st.q[0], jnp.asarray([0.0, 0.0, 1.0])))
    assert up[2] > 0.95


def test_turtlebot_differential_drive():
    from chrono_tpu.models.robots import (create_turtlebot,
                                          set_turtlebot_speeds,
                                          turtlebot_step)
    from chrono_tpu.core import quaternion as Q

    bot, state = create_turtlebot()
    h = 1e-3

    import jax
    step = jax.jit(lambda b, s, tt: turtlebot_step(b, s, tt, h))
    # equal speeds: drives straight
    b1 = set_turtlebot_speeds(bot, 8.0, 8.0)
    st = state
    t = 0.0
    for _ in range(1500):
        st, _ = step(b1, st, t)
        t += h
    x = np.asarray(st.x[bot.chassis])
    assert x[0] > 0.15, x
    assert abs(x[1]) < 0.05 * abs(x[0]) + 1e-3

    # differential speeds: turns toward the slow side
    b2 = set_turtlebot_speeds(bot, 9.0, 5.0)
    st = state
    t = 0.0
    for _ in range(1500):
        st, _ = step(b2, st, t)
        t += h
    e1 = np.asarray(Q.qrotate(st.q[bot.chassis], jnp.asarray([1.0, 0, 0])))
    yaw = np.arctan2(e1[1], e1[0])
    assert yaw < -0.1, yaw        # left wheel faster → turns right (−yaw)
