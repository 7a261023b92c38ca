"""Visual asset layer (reference assets/: ChVisualModel/ChVisualShape/
ChVisualMaterial) — data-model + tessellation + export round-trip."""

import os
import numpy as np

from chrono_tpu.assets import VisualScene, VisualModel, VisualMaterial
from chrono_tpu.io.export import write_obj_mesh


def test_tessellate_and_pose():
    scene = VisualScene()
    scene.model(0).add_sphere(0.5, material=VisualMaterial(color=(1, 0, 0)))
    scene.model(1).add_box((0.1, 0.2, 0.3)).add_cylinder(0.05, 0.4,
                                                         pos=(0, 0, 0.5))
    x = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    q = np.array([[1.0, 0, 0, 0], [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    v, f, c = scene.tessellate(x, q)
    assert len(v) > 0 and len(f) > 0 and len(c) == len(f)
    assert f.max() < len(v)
    # sphere vertices all at radius 0.5 around body 0
    sph = v[:96]                                  # 12x8 sphere verts
    np.testing.assert_allclose(np.linalg.norm(sph, axis=1), 0.5, atol=1e-6)
    # body-1 shapes translated to x=2
    assert abs(v[96:, 0].mean() - 2.0) < 0.2
    # colors carried through
    np.testing.assert_allclose(c[0], (1, 0, 0))


def test_mesh_shape_and_export(tmp_path):
    scene = VisualScene()
    tri_v = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    scene.model(0).add_mesh(tri_v, [[0, 1, 2]])
    x = np.array([[0.0, 0.0, 1.0]])
    q = np.array([[1.0, 0, 0, 0]])
    v, f, c = scene.tessellate(x, q)
    np.testing.assert_allclose(v[:, 2], 1.0)
    p = os.path.join(tmp_path, "frame.obj")
    write_obj_mesh(p, v, f)
    txt = open(p).read()
    assert txt.count("v ") == 3 and txt.count("f ") == 1


def test_rotation_poses_offset_shape():
    """90° body yaw carries a shape offset along +x to +y."""
    scene = VisualScene()
    scene.model(0).add_sphere(0.1, pos=(1.0, 0.0, 0.0))
    q90 = np.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    v, _, _ = scene.tessellate(np.zeros((1, 3)), q90)
    center = v.mean(axis=0)
    np.testing.assert_allclose(center, [0, 1, 0], atol=1e-2)
