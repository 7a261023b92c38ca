"""OpenSim parser vs the reference's own sample decks
(/root/reference/data/opensim, role of ChParserOpenSim tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.io.opensim import parse_osim, load_osim
from chrono_tpu.physics.system import (
    SolverSettings, step_euler_implicit_linearized,
)
from chrono_tpu.physics.joints import joint_violation

OSIM = "/root/reference/data/opensim"


def test_parse_double_pendulum_structure():
    p = parse_osim(f"{OSIM}/double_pendulum.osim")
    assert set(p["bodies"]) == {"ground", "rod1", "rod2"}
    assert p["bodies"]["rod1"]["joint"]["tag"] == "PinJoint"
    np.testing.assert_allclose(p["gravity"], [0, -9.80665, 0])


@pytest.mark.parametrize("deck", ["double_pendulum", "spherical_revolute"])
def test_simulate_parsed_deck(deck):
    model, state, idx = load_osim(f"{OSIM}/{deck}.osim")
    # the decks assemble AT their hanging equilibrium — kick one body
    state = state.replace(v=state.v.at[-1].set(jnp.asarray([0.5, 0.0, 0.3])))
    h = 1e-3
    step = jax.jit(lambda s, t: step_euler_implicit_linearized(
        model, s, t, h, SolverSettings(solver="direct"))[0])
    t = 0.0
    x0 = np.asarray(state.x).copy()
    for _ in range(500):
        state = step(state, t)
        t += h
    assert np.isfinite(np.asarray(state.x)).all()
    # gravity made the non-ground bodies move
    moved = np.abs(np.asarray(state.x) - x0).max()
    assert moved > 1e-3
    # constraints hold
    for kind, data in model.joints.items():
        C = joint_violation(kind, data, state.x, state.q)
        assert float(jnp.abs(C).max()) < 1e-3, kind
