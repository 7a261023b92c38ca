"""Approximate convex decomposition (VHACD role): an L-shaped mesh splits
into boxes that cover the interior without crossing the concavity."""

import numpy as np

from chrono_tpu.collision.decomp import voxelize, decompose_boxes


def _box_mesh(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    v = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                  [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                  [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                  [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                  [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                  [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    return v, f


def _l_mesh():
    """L shape = union of two boxes sharing a face (watertight via
    merged soup: parity voxelization tolerates internal faces)."""
    v1, f1 = _box_mesh((0, 0, 0), (1.0, 0.4, 0.4))
    v2, f2 = _box_mesh((0, 0, 0.4), (0.4, 0.4, 1.0))
    return np.concatenate([v1, v2]), np.concatenate([f1, f2 + 8])


def test_voxelize_box_volume():
    v, f = _box_mesh((0, 0, 0), (1.0, 0.5, 0.25))
    occ, lo = voxelize(v, f, pitch=0.05)
    vol = occ.sum() * 0.05**3
    assert abs(vol - 0.125) < 0.015


def test_l_decomposition_covers_without_crossing():
    v, f = _l_mesh()
    parts = decompose_boxes(v, f, pitch=0.05, max_parts=16)
    assert 2 <= len(parts) <= 10
    vol = sum(float(np.prod(2 * h)) for _, h in parts)
    v_ref = 1.0 * 0.4 * 0.4 + 0.4 * 0.4 * 0.6
    assert 0.75 * v_ref < vol < 1.1 * v_ref
    # no box pokes into the empty quadrant (x > 0.45, z > 0.45)
    for c, h in parts:
        assert not (c[0] + h[0] > 0.45 and c[2] + h[2] > 0.45), (c, h)
