"""Fluid surface reconstruction (splashsurf role, ChFsiSplashsurfSPH):
density splat + marching tetrahedra recover a block of markers as a
closed mesh of the right size."""

import numpy as np
import pytest

from chrono_tpu.fsi.surface import reconstruct_surface
from chrono_tpu.utils.samplers import grid_sample_box


def test_block_surface():
    d0 = 0.02
    pts = grid_sample_box((0, 0, 0), (0.2, 0.12, 0.08), d0)
    verts, faces = reconstruct_surface(pts, d0)
    assert len(verts) > 100 and len(faces) > 100
    # surface wraps the block: bounds within ~1.5 d0 of the marker cloud
    for a in range(3):
        assert abs(verts[:, a].min() - pts[:, a].min()) < 1.6 * d0
        assert abs(verts[:, a].max() - pts[:, a].max()) < 1.6 * d0
    # closed 2-manifold: every edge shared by exactly two faces
    edges = {}
    for f in faces:
        for u, v in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            k = (min(u, v), max(u, v))
            edges[k] = edges.get(k, 0) + 1
    counts = np.asarray(list(edges.values()))
    assert (counts == 2).mean() > 0.99
    # total area ~ block surface area
    v0 = verts[faces[:, 0]]
    area = 0.5 * np.linalg.norm(
        np.cross(verts[faces[:, 1]] - v0, verts[faces[:, 2]] - v0),
        axis=1).sum()
    Lx, Ly, Lz = 0.2, 0.12, 0.08
    a_ref = 2 * (Lx * Ly + Ly * Lz + Lx * Lz)
    assert 0.6 * a_ref < area < 1.6 * a_ref


def test_outward_orientation():
    d0 = 0.02
    pts = grid_sample_box((0, 0, 0), (0.1, 0.1, 0.1), d0)
    verts, faces = reconstruct_surface(pts, d0)
    ctr = pts.mean(axis=0)
    v0 = verts[faces[:, 0]]
    nrm = np.cross(verts[faces[:, 1]] - v0, verts[faces[:, 2]] - v0)
    outward = np.einsum("ij,ij->i", nrm, verts[faces].mean(axis=1) - ctr)
    assert (outward > 0).mean() > 0.9
