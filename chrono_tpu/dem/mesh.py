"""DEM ↔ triangle-mesh coupling (one-way kinematic mesh, force feedback).

Counterpart of the reference's mesh variant
(/root/reference/src/chrono_dem/gpu/ChDemSMCtrimesh.cu:157
``interactionGranMat_TriangleSoup``; physics/ChSystemDemMesh_impl host API
``ApplyMeshMotion``/``CollectMeshContactForces``): spheres collide with a
triangle soup attached to rigid frames; per-frame force/torque reductions come
back for co-simulation with the MBS.

Broadphase: triangles are binned into the same uniform grid as the particles
(triangle → cells its AABB overlaps, precomputed host-side by the native mesh
library chrono_tpu.native.meshlib or numpy fallback); each particle tests the
triangles listed in its cell — fixed capacity, masked, zero scatter except the
final per-mesh segment-sum.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.core import quaternion as Q
from chrono_tpu.collision.cell_list import GridSpec, cell_index
from chrono_tpu.collision.narrowphase import sphere_triangle
from chrono_tpu.dem.params import DEMParams, hertz_coefficients


@pytree_dataclass
class TriangleMesh:
    """A triangle soup attached to a moving frame (one 'mesh family')."""

    v0: Array      # (T, 3) vertices in MESH-LOCAL coords
    v1: Array
    v2: Array
    frame_pos: Array   # (3,) current world position of the mesh frame
    frame_rot: Array   # (4,)
    frame_vel: Array   # (3,)
    frame_omega: Array  # (3,) world angular velocity

    @property
    def n_tris(self) -> int:
        return self.v0.shape[0]


@pytree_dataclass
class MeshBins:
    """Static triangle→cell binning table (rebuilt host-side when the mesh
    moves far; valid while displacement < margin)."""

    tri_ids: Array   # (n_cells, cap) int32, -1 empty
    cap: int = static_field(default=8)


def bin_triangles_numpy(grid: GridSpec, tris_world, cap=8, margin=0.0):
    """Host-side triangle binning: triangle AABB (+margin) → overlapped cells."""
    import numpy as np

    v0, v1, v2 = tris_world
    nx, ny, nz = grid.dims
    origin = np.asarray(grid.origin)
    cs = grid.cell_size
    table = -np.ones((nx * ny * nz, cap), np.int32)
    counts = np.zeros(nx * ny * nz, np.int32)
    lo = np.minimum(np.minimum(v0, v1), v2) - margin
    hi = np.maximum(np.maximum(v0, v1), v2) + margin
    ilo = np.clip(((lo - origin) / cs).astype(int), 0,
                  np.asarray([nx - 1, ny - 1, nz - 1]))
    ihi = np.clip(((hi - origin) / cs).astype(int), 0,
                  np.asarray([nx - 1, ny - 1, nz - 1]))
    for t in range(len(v0)):
        for i in range(ilo[t, 0], ihi[t, 0] + 1):
            for jj in range(ilo[t, 1], ihi[t, 1] + 1):
                for k in range(ilo[t, 2], ihi[t, 2] + 1):
                    c = (i * ny + jj) * nz + k
                    if counts[c] < cap:
                        table[c, counts[c]] = t
                        counts[c] += 1
    return MeshBins(tri_ids=jnp.asarray(table), cap=cap), int(counts.max())


def mesh_world_triangles(mesh: TriangleMesh):
    """Transform the local triangle soup to world coordinates."""
    tw = lambda v: mesh.frame_pos + Q.qrotate(mesh.frame_rot[None, :], v)
    return tw(mesh.v0), tw(mesh.v1), tw(mesh.v2)


def sphere_mesh_forces(params: DEMParams, grid: GridSpec, bins: MeshBins,
                       mesh: TriangleMesh, pos, vel, omega):
    """Hertzian (frictional, history-free) sphere–triangle forces.

    Returns (f_particles (N,3), tau_particles (N,3), force_on_mesh (3,),
    torque_on_mesh (3,) about the mesh frame origin).
    Friction here is the single-step (viscous-capped Coulomb) model; persistent
    mesh-contact history can be layered like the wall history if needed.
    """
    r = params.radius
    m_eff = params.mass
    kn, gn, kt, gt = hertz_coefficients(params.wall_material, m_eff, r)

    v0w, v1w, v2w = mesh_world_triangles(mesh)
    cells = cell_index(grid, pos)                    # (N,)
    cand = bins.tri_ids[cells]                       # (N, cap)
    valid = cand >= 0
    t = jnp.maximum(cand, 0)

    gap, n, p = sphere_triangle(pos[:, None, :], r,
                                v0w[t], v1w[t], v2w[t])
    overlap = jnp.maximum(-gap, 0.0)
    active = valid & (overlap > 0)

    # mesh surface velocity at the contact point
    rp = p - mesh.frame_pos
    v_mesh = mesh.frame_vel + jnp.cross(mesh.frame_omega, rp)
    arm = r - 0.5 * overlap
    v_part = vel[:, None, :] + jnp.cross(omega[:, None, :],
                                         -arm[..., None] * n)
    # n points from sphere toward triangle; force on sphere along -n
    v_rel = v_mesh - v_part
    sq = jnp.sqrt(overlap)
    q4 = jnp.sqrt(sq)
    vn_s = jnp.sum(v_rel * n, axis=-1)
    fn_mag = jnp.maximum(kn * sq * overlap - gn * q4 * vn_s, 0.0)
    f_n = -fn_mag[..., None] * n
    vt = v_rel - vn_s[..., None] * n
    ft = gt * q4[..., None] * vt
    ft_mag = jnp.sqrt(jnp.sum(ft * ft, axis=-1) + 1e-18)
    cap_f = params.wall_material.mu_s * fn_mag
    ft = ft * jnp.where(ft_mag > cap_f, cap_f / ft_mag, 1.0)[..., None]

    f_pair = jnp.where(active[..., None], f_n + ft, 0.0)
    f_particles = jnp.sum(f_pair, axis=1)
    tau_particles = jnp.sum(jnp.cross(-arm[..., None] * n, f_pair), axis=1)

    f_mesh_pairs = -f_pair
    force_mesh = jnp.sum(f_mesh_pairs, axis=(0, 1))
    torque_mesh = jnp.sum(jnp.cross(p - mesh.frame_pos, f_mesh_pairs),
                          axis=(0, 1))
    return f_particles, tau_particles, force_mesh, torque_mesh


def load_obj_numpy(path: str):
    """Minimal OBJ loader fallback (the native C++ loader is preferred)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):   # fan-triangulate
                    faces.append([idx[0], idx[k], idx[k + 1]])
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int32)
    return v, f


def make_triangle_mesh(verts, faces, dtype=jnp.float32) -> TriangleMesh:
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    return TriangleMesh(
        v0=jnp.asarray(verts[faces[:, 0]], dtype),
        v1=jnp.asarray(verts[faces[:, 1]], dtype),
        v2=jnp.asarray(verts[faces[:, 2]], dtype),
        frame_pos=jnp.zeros(3, dtype), frame_rot=Q.qidentity((), dtype),
        frame_vel=jnp.zeros(3, dtype), frame_omega=jnp.zeros(3, dtype),
    )
