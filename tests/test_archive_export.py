"""Archive (ChArchive analogue) + postprocess exporter tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.io import archive_out, archive_in
from chrono_tpu.io.export import (
    write_ply_points, write_obj_mesh, write_vtk_structured_grid,
)


class TestArchive:
    def test_model_roundtrip(self):
        from chrono_tpu.physics import SystemBuilder
        from chrono_tpu.core import functions as F

        b = SystemBuilder()
        g = b.add_ground()
        rod = b.add_body(mass=2.0, inertia=(0.1, 0.2, 0.3), pos=(1, 0, 0))
        b.add_joint("revolute", g, rod, world_pos=(0, 0, 0),
                    world_axis=(0, 1, 0))
        b.add_motor_rotation_speed(g, rod, world_pos=(0, 0, 0),
                                   world_axis=(0, 1, 0),
                                   profile=F.FSine(amp=jnp.asarray(2.0),
                                                   freq=jnp.asarray(0.5),
                                                   phase=jnp.asarray(0.0)))
        b.add_tsda(g, rod, pa_world=(0, 0, 1), pb_world=(1, 0, 0), k=100.0)
        model, state = b.finalize()

        s = archive_out(model)
        model2 = archive_in(s)
        # identical structure and values
        import jax
        l1, t1 = jax.tree_util.tree_flatten(model)
        l2, t2 = jax.tree_util.tree_flatten(model2)
        assert t1 == t2
        for a, c in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c))
        # and it still simulates
        from chrono_tpu.physics import SolverSettings, simulate
        f1, _ = simulate(model, state, 1e-3, 50, SolverSettings("direct"))
        f2, _ = simulate(model2, state, 1e-3, 50, SolverSettings("direct"))
        np.testing.assert_allclose(np.asarray(f1.x), np.asarray(f2.x),
                                   atol=1e-7)

    def test_state_roundtrip_file(self, tmp_path):
        from chrono_tpu.physics.body import make_body_state
        st = make_body_state(x=[[1., 2., 3.]])
        p = str(tmp_path / "state.json")
        archive_out(st, p)
        st2 = archive_in(p)
        np.testing.assert_allclose(np.asarray(st2.x), [[1, 2, 3]])

    def test_unregistered_type_errors(self):
        class Foo:
            pass
        with pytest.raises(TypeError, match="cannot archive"):
            archive_out(Foo())


class TestExport:
    def test_ply(self, tmp_path):
        p = str(tmp_path / "pts.ply")
        write_ply_points(p, np.random.rand(10, 3),
                         values=np.arange(10.0))
        txt = open(p).read()
        assert "element vertex 10" in txt
        assert txt.count("\n") >= 18

    def test_obj(self, tmp_path):
        p = str(tmp_path / "m.obj")
        write_obj_mesh(p, [[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 1, 2]])
        from chrono_tpu.native import load_obj
        v, f = load_obj(p)
        assert v.shape == (3, 3) and f.shape == (1, 3)

    def test_vtk(self, tmp_path):
        p = str(tmp_path / "g.vtk")
        write_vtk_structured_grid(p, np.zeros((4, 5)), (0, 0), 0.1)
        txt = open(p).read()
        assert "DIMENSIONS 4 5 1" in txt
        assert txt.count("\n") > 25
