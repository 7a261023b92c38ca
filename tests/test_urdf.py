"""URDF importer tests (the reference's parser tests role)."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.io import parse_urdf, build_from_urdf
from chrono_tpu.physics import SolverSettings, simulate
from chrono_tpu.physics.joints import joint_violation

TWO_LINK = """
<robot name="arm">
  <link name="base">
    <inertial>
      <mass value="0"/>
      <inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="upper">
    <inertial>
      <origin xyz="0.25 0 0"/>
      <mass value="2.0"/>
      <inertia ixx="0.01" iyy="0.05" izz="0.05" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <link name="lower">
    <inertial>
      <origin xyz="0.2 0 0"/>
      <mass value="1.0"/>
      <inertia ixx="0.005" iyy="0.02" izz="0.02" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="upper"/>
    <origin xyz="0 0 1"/>
    <axis xyz="0 1 0"/>
  </joint>
  <joint name="elbow" type="continuous">
    <parent link="upper"/>
    <child link="lower"/>
    <origin xyz="0.5 0 0"/>
    <axis xyz="0 1 0"/>
  </joint>
</robot>
"""


class TestURDF:
    def test_parse(self):
        m = parse_urdf(TWO_LINK)
        assert set(m.links) == {"base", "upper", "lower"}
        assert m.root == "base"
        assert len(m.joints) == 2
        assert m.joints[1]["type"] == "continuous"

    def test_build_and_simulate(self):
        model, state, names = build_from_urdf(TWO_LINK)
        assert model.n_bodies == 3
        # COM positions from forward kinematics
        np.testing.assert_allclose(np.asarray(state.x[names["upper"]]),
                                   [0.25, 0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.x[names["lower"]]),
                                   [0.7, 0, 1.0], atol=1e-6)
        # the arm falls under gravity; joints stay closed
        final, _ = simulate(model, state, 1e-3, 500,
                            SolverSettings(solver="direct"))
        assert float(final.x[names["lower"], 2]) < 0.99
        for kind, jd in model.joints.items():
            C = np.asarray(joint_violation(kind, jd, final.x, final.q))
            assert np.abs(C).max() < 2e-3

    def test_fixed_joint(self):
        urdf = TWO_LINK.replace('type="continuous"', 'type="fixed"')
        model, state, names = build_from_urdf(urdf)
        final, _ = simulate(model, state, 1e-3, 300,
                            SolverSettings(solver="direct"))
        # elbow welded: distance upper-lower COM stays fixed
        d0 = 0.45
        d = np.linalg.norm(np.asarray(final.x[names["lower"]])
                           - np.asarray(final.x[names["upper"]]))
        np.testing.assert_allclose(d, d0, atol=2e-3)
