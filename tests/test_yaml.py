"""YAML spec parser/runner tests (the reference's parser-module test role)."""

import numpy as np
import pytest
import yaml

from chrono_tpu.io.yaml_spec import load_spec, run_spec, build_mbs


PENDULUM_YAML = """
simulation:
  time_step: 1.0e-3
  end_time: 0.5
  gravity: [0, 0, -9.81]
  solver: {type: direct}
model:
  type: mbs
  bodies:
    - {name: ground, fixed: true}
    - {name: rod, mass: 1.0, inertia: [0.01, 0.01, 0.01], pos: [1, 0, 0]}
  joints:
    - {type: revolute, body1: ground, body2: rod, pos: [0, 0, 0], axis: [0, 1, 0]}
output: {}
"""

MOTOR_YAML = """
simulation: {time_step: 1.0e-3, end_time: 0.3}
model:
  type: mbs
  bodies:
    - {name: ground, fixed: true}
    - {name: disc, mass: 1.0, inertia: [0.1, 0.1, 0.2]}
  motors:
    - {type: rotation_speed, body1: ground, body2: disc, axis: [0, 0, 1],
       profile: {type: const, value: 2.0}}
"""

DEM_YAML = """
simulation: {end_time: 0.05, gravity: [0, 0, -9.81]}
model:
  type: dem
  radius: 0.05
  density: 2500
  box: [[0, 0, 0], [0.5, 0.5, 0.5]]
  material: {youngs: 5.0e+6, restitution: 0.4, mu_s: 0.5}
  particles: {sampler: grid, region: [[0.1, 0.1, 0.1], [0.4, 0.4, 0.4]],
              spacing: 0.12}
"""


class TestYAML:
    def test_pendulum_runs(self, tmp_path):
        spec = yaml.safe_load(PENDULUM_YAML)
        spec["output"]["csv"] = str(tmp_path / "traj.csv")
        final = run_spec(spec, verbose=False)
        # pendulum swung down from horizontal
        assert float(final.x[1, 2]) < -0.2
        # csv written with named columns
        from chrono_tpu.io.writers import CSVWriter
        cols, data = CSVWriter.read(str(tmp_path / "traj.csv"))
        assert "rod_z" in cols
        assert data.shape[0] == 500

    def test_motor_spec(self):
        spec = yaml.safe_load(MOTOR_YAML)
        final = run_spec(spec, verbose=False)
        np.testing.assert_allclose(float(final.w[1, 2]), 2.0, atol=1e-2)

    def test_dem_spec(self):
        spec = yaml.safe_load(DEM_YAML)
        final = run_spec(spec, verbose=False)
        assert final.n == 8
        assert float(final.time) > 0.04

    def test_bad_joint_type_errors(self):
        spec = yaml.safe_load(PENDULUM_YAML)
        spec["model"]["joints"][0]["type"] = "bogus"
        with pytest.raises(ValueError, match="unknown joint"):
            build_mbs(spec)

    def test_file_roundtrip(self, tmp_path):
        p = tmp_path / "spec.yaml"
        p.write_text(PENDULUM_YAML)
        spec = load_spec(str(p))
        assert spec["model"]["bodies"][1]["name"] == "rod"
