"""ADAMS .adm parser: simulate the reference's own solver decks and compare
against the recorded ADAMS golden trajectories (the strongest possible parser
test — input file AND expected output both come from the reference tree)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.io.adams import parse_adm, load_adm
from chrono_tpu.utils.golden import load_adams as load_golden
from chrono_tpu.physics.system import (
    SolverSettings, step_euler_implicit_linearized,
)

ADM_DIR = "/root/reference/data/testing/joints/adams_models"
GOLD = "/root/reference/data/testing/joints"


def test_parse_revolute_deck():
    m = parse_adm(f"{ADM_DIR}/test_Revolute_Case01.adm")
    assert len(m.parts) == 2
    assert m.parts[1].ground and not m.parts[2].ground
    assert m.parts[2].mass == 1.0
    assert m.parts[2].ip == (0.04, 0.1, 0.1)
    assert m.joints == [("REVOLUTE", 102, 202)]
    np.testing.assert_allclose(m.gravity, [0, 0, -9.80665])
    cm = m.markers[201]
    np.testing.assert_allclose(cm.qp, [2, 0, 0])


@pytest.mark.parametrize("case,golden_dir", [
    ("test_Revolute_Case01", "revolute_joint/Revolute_Case01"),
    ("test_Spherical_Case02", "spherical_joint/Spherical_Case02"),
    ("test_Cylindrical_Case03", "cylindrical_joint/Cylindrical_Case03"),
])
def test_simulated_deck_matches_adams_golden(case, golden_dir):
    """Parse the deck, run 1.5 s at the reference's sim step, compare the
    pendulum CM position to the ADAMS recording (RMS ≤ 2e-3 in fp32)."""
    model, state = load_adm(f"{ADM_DIR}/{case}.adm")
    h = 5e-4
    rec_every = 20                      # golden cadence 1e-2
    step = jax.jit(lambda s, t: step_euler_implicit_linearized(
        model, s, t, h, SolverSettings(solver="direct"))[0])
    xs = [np.asarray(state.x[1])]
    t = 0.0
    for k in range(150 * rec_every):
        state = step(state, t)
        t += h
        if (k + 1) % rec_every == 0:
            xs.append(np.asarray(state.x[1]))
    sim = np.asarray(xs)

    ref = load_golden(f"{GOLD}/{golden_dir}_ADAMS_Pos.txt")[: len(sim), 1:4]
    rms = np.sqrt(np.mean((sim - ref) ** 2, axis=0))
    assert rms.max() < 2e-3, (case, rms)
