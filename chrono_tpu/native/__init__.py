"""Native (C++) runtime components, loaded via ctypes.

The compute path is XLA; this package owns what the reference implements in
host C++: file IO, mesh preprocessing, and other irregular host-side work.
The library auto-builds on first import (g++ available in the image) and every
entry point has a numpy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libchronotpu_mesh.so")
_SRC = os.path.join(_DIR, "meshlib.cpp")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.mesh_load_obj.argtypes = [ctypes.c_char_p]
    lib.mesh_load_obj.restype = ctypes.c_int32
    lib.mesh_num_verts.argtypes = [ctypes.c_int32]
    lib.mesh_num_verts.restype = ctypes.c_int64
    lib.mesh_num_faces.argtypes = [ctypes.c_int32]
    lib.mesh_num_faces.restype = ctypes.c_int64
    lib.mesh_get_verts.argtypes = [ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
    lib.mesh_get_faces.argtypes = [ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.mesh_free.argtypes = [ctypes.c_int32]
    lib.mesh_bin_triangles.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.mesh_bin_triangles.restype = ctypes.c_int32
    lib.mesh_weld_vertices.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_float]
    lib.mesh_weld_vertices.restype = ctypes.c_int64
    lib.mesh_surface_markers.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_float, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.mesh_surface_markers.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def load_obj(path: str):
    """Load an OBJ mesh → (verts (V,3) float32, faces (F,3) int32).

    Uses the native parser when available, else the python fallback.
    """
    lib = get_lib()
    if lib is None:
        from chrono_tpu.dem.mesh import load_obj_numpy
        return load_obj_numpy(path)
    h = lib.mesh_load_obj(path.encode())
    if h < 0:
        raise FileNotFoundError(path)
    nv = lib.mesh_num_verts(h)
    nf = lib.mesh_num_faces(h)
    verts = np.empty((nv, 3), np.float32)
    faces = np.empty((nf, 3), np.int32)
    lib.mesh_get_verts(h, _fptr(verts))
    lib.mesh_get_faces(h, _iptr(faces))
    lib.mesh_free(h)
    return verts, faces


def bin_triangles(v0, v1, v2, origin, cell_size, dims, cap=8, margin=0.0):
    """Triangle→grid-cell binning table (n_cells, cap) int32 (-1 empty).

    Returns (table, max_count). ``max_count > cap`` means capacity overflow.
    """
    lib = get_lib()
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    nx, ny, nz = dims
    if lib is None:
        from chrono_tpu.dem.mesh import bin_triangles_numpy
        from chrono_tpu.collision.cell_list import GridSpec
        grid = GridSpec(origin=tuple(origin), cell_size=float(cell_size),
                        dims=tuple(dims))
        bins, maxc = bin_triangles_numpy(grid, (v0, v1, v2), cap, margin)
        return np.asarray(bins.tri_ids), maxc
    table = np.empty((nx * ny * nz, cap), np.int32)
    og = np.asarray(origin, np.float32)
    maxc = lib.mesh_bin_triangles(
        _fptr(v0), _fptr(v1), _fptr(v2), len(v0), _fptr(og),
        ctypes.c_float(cell_size), nx, ny, nz, ctypes.c_float(margin),
        cap, _iptr(table))
    return table, int(maxc)


def weld_vertices(verts, faces, tol=1e-6):
    """Merge duplicate vertices (native); returns (verts', faces')."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32).copy()
    faces = np.ascontiguousarray(faces, np.int32).copy()
    if lib is None:
        return verts, faces
    n_out = lib.mesh_weld_vertices(_fptr(verts), len(verts), _iptr(faces),
                                   len(faces), ctypes.c_float(tol))
    return verts[:n_out].copy(), faces


def surface_markers(verts, faces, spacing, layers=3):
    """BCE markers over a triangle surface (native; numpy fallback).

    ``layers`` sheets are offset INTO the solid along the inward face normal
    (OBJ outward-normal convention) — the reference's mesh-BCE construction
    (ChFsiProblemSPH AddRigidBodyMesh).  Returns (M, 3) float32.
    """
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if lib is not None and hasattr(lib, "mesh_surface_markers"):
        cap = 4 * len(faces) * max(1, layers)
        while True:
            out = np.empty((cap, 3), np.float32)
            n = lib.mesh_surface_markers(_fptr(verts), len(verts),
                                         _iptr(faces), len(faces),
                                         ctypes.c_float(spacing),
                                         ctypes.c_int32(layers),
                                         _fptr(out), cap)
            if n <= cap:
                return out[:n].copy()
            cap = int(n) + 16
    # numpy fallback: same barycentric grid per triangle
    pts = []
    for f in faces:
        a, b, c = verts[f[0]], verts[f[1]], verts[f[2]]
        e1, e2 = b - a, c - a
        nrm = np.cross(e1, e2)
        nl = np.linalg.norm(nrm)
        if nl < 1e-12:
            continue
        nrm /= nl
        nu = max(1, int(np.ceil(np.linalg.norm(e1) / spacing)))
        nv = max(1, int(np.ceil(np.linalg.norm(e2) / spacing)))
        uu, vv = np.meshgrid((np.arange(nu) + 0.5) / nu,
                             (np.arange(nv) + 0.5) / nv, indexing="ij")
        keep = (uu + vv) <= 1.0
        base = a + uu[keep][:, None] * e1 + vv[keep][:, None] * e2
        for L in range(layers):
            pts.append(base - spacing * L * nrm)
    return (np.concatenate(pts).astype(np.float32) if pts
            else np.zeros((0, 3), np.float32))
