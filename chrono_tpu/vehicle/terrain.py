"""Terrain models: flat, heightmap, and SCM deformable (Bekker–Wong).

Counterparts of the reference's ``RigidTerrain`` and ``SCMTerrain``
(/root/reference/src/chrono_vehicle/terrain/SCMTerrain.cpp:148-163: Bekker
pressure-sinkage with Janosi–Hanamoto shear and bulldozing): the SCM grid is a
dense (nx, ny) array pytree updated in-place each step — ray-casting per node
becomes a vectorized footprint test of all wheels against all (local window)
nodes, and erosion is a convolution-style relaxation — no per-node hit lists.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass, static_field


# ---------------- rigid terrain ----------------

def flat_terrain(height: float = 0.0) -> Callable:
    """(N,2) xy → (N,) height."""
    def h(xy):
        return jnp.full(xy.shape[:-1], height, xy.dtype)
    return h


@pytree_dataclass
class Heightmap:
    """Bilinear-interpolated height field (the reference's height-map patch)."""

    z: Array                 # (nx, ny)
    origin: Array            # (2,)
    spacing: Array           # ()

    def height(self, xy: Array) -> Array:
        u = (xy[..., 0] - self.origin[0]) / self.spacing
        v = (xy[..., 1] - self.origin[1]) / self.spacing
        nx, ny = self.z.shape
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nx - 2)
        j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, ny - 2)
        fu = jnp.clip(u - i0, 0.0, 1.0)
        fv = jnp.clip(v - j0, 0.0, 1.0)
        z00 = self.z[i0, j0]
        z10 = self.z[i0 + 1, j0]
        z01 = self.z[i0, j0 + 1]
        z11 = self.z[i0 + 1, j0 + 1]
        return ((1 - fu) * (1 - fv) * z00 + fu * (1 - fv) * z10
                + (1 - fu) * fv * z01 + fu * fv * z11)


# ---------------- SCM deformable terrain ----------------

@pytree_dataclass
class SCMParams:
    """Bekker–Wong soil parameters (reference SCMTerrain::SetSoilParameters)."""

    Kphi: Array = 2e6        # frictional modulus [N/m^(n+2)]
    Kc: Array = 0.0          # cohesive modulus [N/m^(n+1)]
    n_exp: Array = 1.1       # sinkage exponent
    cohesion: Array = 0.0    # Mohr cohesion [Pa]
    friction_angle: Array = 0.6  # tan(phi) internal friction
    janosi_k: Array = 0.01   # Janosi shear modulus [m]
    elastic_K: Array = 4e7   # unloading stiffness [Pa/m]
    damping_R: Array = 3e4   # vertical damping [Pa s/m]


@pytree_dataclass
class SCMState:
    """Deformable grid state (persistent plastic sinkage)."""

    z0: Array        # (nx, ny) undeformed height
    sinkage: Array   # (nx, ny) plastic sinkage (≥0, accumulated)
    origin: Array    # (2,)
    spacing: Array   # ()

    @property
    def height(self) -> Array:
        return self.z0 - self.sinkage

    def height_fn(self):
        hm = Heightmap(z=self.height, origin=self.origin, spacing=self.spacing)
        return hm.height


def make_scm_state(lo, hi, spacing, z0_fn=None, dtype=jnp.float32) -> SCMState:
    import numpy as np

    nx = int(np.ceil((hi[0] - lo[0]) / spacing)) + 1
    ny = int(np.ceil((hi[1] - lo[1]) / spacing)) + 1
    xs = lo[0] + spacing * np.arange(nx)
    ys = lo[1] + spacing * np.arange(ny)
    if z0_fn is None:
        z0 = np.zeros((nx, ny))
    else:
        g = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1)
        z0 = z0_fn(g[..., 0], g[..., 1])
    return SCMState(
        z0=jnp.asarray(z0, dtype),
        sinkage=jnp.zeros((nx, ny), dtype),
        origin=jnp.asarray(lo[:2], dtype),
        spacing=jnp.asarray(spacing, dtype),
    )


class SCMWheelOut(NamedTuple):
    force: Array      # (W, 3) world force on each wheel
    torque_spin: Array  # (W,) resistance torque about the spin axis
    new_state: "SCMState"
    sinkage_max: Array


def scm_wheel_forces(params: SCMParams, state: SCMState,
                     wheel_x, wheel_q, wheel_v, wheel_w_local,
                     wheel_radius, wheel_width):
    """Vectorized SCM contact for W cylindrical wheels.

    For every grid node, test the footprint of every wheel (cylinder lower
    surface), compute node pressure from Bekker sinkage + elastic rebound,
    Janosi shear traction from slip, then reduce per-wheel forces and update
    plastic sinkage — the reference's per-node ray-cast loop
    (SCMTerrain.cpp SCMLoader::ComputeInternalForces) as dense array ops.
    """
    from chrono_tpu.core import quaternion as Q

    nx, ny = state.z0.shape
    xs = state.origin[0] + state.spacing * jnp.arange(nx)
    ys = state.origin[1] + state.spacing * jnp.arange(ny)
    gx = xs[:, None]                    # (nx,1)
    gy = ys[None, :]                    # (1,ny)
    cell_area = state.spacing**2
    terrain_z = state.height            # (nx,ny)

    W = wheel_x.shape[0]
    R = Q.q_to_matrix(wheel_q)
    e_spin = R[:, :, 1]                                  # (W,3)
    up = jnp.asarray([0.0, 0.0, 1.0], wheel_x.dtype)
    e_lon = jnp.cross(e_spin, up)
    e_lon = e_lon / jnp.maximum(jnp.linalg.norm(e_lon, axis=-1, keepdims=True),
                                1e-9)
    e_lat = jnp.cross(up, e_lon)

    # node position relative to each wheel center, in wheel footprint coords
    dx = gx[None] - wheel_x[:, None, None, 0]            # (W,nx,ny)
    dy = gy[None] - wheel_x[:, None, None, 1]
    u_lon = dx * e_lon[:, None, None, 0] + dy * e_lon[:, None, None, 1]
    u_lat = dx * e_lat[:, None, None, 0] + dy * e_lat[:, None, None, 1]

    r = wheel_radius
    inside = (jnp.abs(u_lat) <= 0.5 * wheel_width) & (jnp.abs(u_lon) < r)
    # cylinder lower surface height above the node
    surf_z = wheel_x[:, None, None, 2] - jnp.sqrt(
        jnp.maximum(r * r - u_lon**2, 1e-12))
    # TOTAL sinkage below the UNDEFORMED surface (z0), elastic-plastic
    # response exactly as the reference (SCMTerrain.cpp ComputeInternalForces
    # plastic/elastic split): virgin loading follows the Bekker curve
    # σ_B(z) = (Kc/b + Kφ) zⁿ; unload/reload is elastic with slope
    # elastic_K against the stored plastic sinkage p.  The return-mapping
    # form σ = clip(min(elastic_K·(z − p), σ_B(z)), 0) needs no branch
    # bookkeeping and converges to a static equilibrium (the previous
    # "add current pen to plastic sinkage each step" form had no
    # equilibrium: the surface chased the wheel at a constant sink rate).
    z_tot = jnp.where(inside, state.z0[None] - surf_z, 0.0)
    z_tot = jnp.maximum(z_tot, 0.0)                      # (W,nx,ny)
    b = jnp.minimum(wheel_width, r)
    sigma_B = (params.Kc / b + params.Kphi) * z_tot ** params.n_exp
    sigma_e = params.elastic_K * (z_tot - state.sinkage[None])
    sigma_st = jnp.clip(jnp.minimum(sigma_e, sigma_B), 0.0, None)
    contact = sigma_st > 0
    # vertical damping from the approach rate of the wheel surface
    vz_node = (wheel_v[:, None, None, 2]
               - wheel_w_local[:, None, None, 1] * 0.0)
    sigma = sigma_st + params.damping_R * jnp.maximum(-vz_node, 0.0) * contact

    # slip velocity at the node: wheel surface velocity vs ground
    v_lon_w = jnp.sum(wheel_v * e_lon, axis=-1)          # (W,)
    omega = wheel_w_local[:, 1]
    v_slip_lon = (v_lon_w[:, None, None]
                  - omega[:, None, None] * jnp.sqrt(
                      jnp.maximum(r * r - u_lon**2, 1e-12)))
    v_slip_lat = jnp.sum(wheel_v * e_lat, axis=-1)[:, None, None] \
        + 0.0 * u_lat
    v_slip = jnp.sqrt(v_slip_lon**2 + v_slip_lat**2) + 1e-9

    # Janosi–Hanamoto shear stress: τ = τ_max (1 − e^(−j/k)); j ≈ slip·dwell
    tau_max = params.cohesion + sigma * params.friction_angle
    j_shear = v_slip * 0.1                               # dwell-time surrogate
    tau = tau_max * (1.0 - jnp.exp(-j_shear / params.janosi_k))
    tau_lon = -tau * v_slip_lon / v_slip
    tau_lat = -tau * v_slip_lat / v_slip

    # per-wheel force reduction over nodes
    fz_w = jnp.sum(sigma, axis=(1, 2)) * cell_area       # (W,)
    f_lon_w = jnp.sum(tau_lon * contact, axis=(1, 2)) * cell_area
    f_lat_w = jnp.sum(tau_lat * contact, axis=(1, 2)) * cell_area
    force = (f_lon_w[:, None] * e_lon + f_lat_w[:, None] * e_lat
             + fz_w[:, None] * up)
    # resistance torque: shear acting at radius about the spin axis
    t_spin = jnp.sum(tau_lon * contact * jnp.sqrt(
        jnp.maximum(r * r - u_lon**2, 1e-12)), axis=(1, 2)) * cell_area

    # plastic sinkage update: on virgin (Bekker-branch) loading the plastic
    # set-point moves to z − σ/elastic_K; elastic reload leaves it unchanged
    # (max() keeps the deepest imprint across wheels and history)
    p_new = jnp.max(jnp.where(contact, z_tot - sigma_st / params.elastic_K,
                              0.0), axis=0)              # (nx,ny)
    new_sink = jnp.maximum(state.sinkage, p_new)
    new_state = state.replace(sinkage=new_sink)
    return SCMWheelOut(force=force, torque_spin=t_spin, new_state=new_state,
                       sinkage_max=(new_sink - state.sinkage).max())


def scm_erosion_step(state: SCMState, max_slope: float = 0.6) -> SCMState:
    """Bulldozing-style erosion: relax sinkage slopes steeper than the angle
    of repose by diffusing material to neighbors (the reference's erosion
    iterations, SCMTerrain.cpp:173-181), one Jacobi pass."""
    z = state.height
    dz_lim = max_slope * state.spacing

    def flow(a, b):
        # material moving from the higher to the lower column
        return jnp.clip((a - b - dz_lim) * 0.25, 0.0, None)

    zp = jnp.pad(z, 1, mode="edge")
    out = (flow(z, zp[2:, 1:-1]) + flow(z, zp[:-2, 1:-1])
           + flow(z, zp[1:-1, 2:]) + flow(z, zp[1:-1, :-2]))
    inc = (flow(zp[2:, 1:-1], z) + flow(zp[:-2, 1:-1], z)
           + flow(zp[1:-1, 2:], z) + flow(zp[1:-1, :-2], z))
    new_z = z - out + inc
    return state.replace(sinkage=state.z0 - new_z)


def scm_relocate(state: SCMState, center_xy, z0_fn=None) -> SCMState:
    """Moving-patch relocation (reference SCMTerrain moving patches +
    GranularTerrain patch advance): shift the grid window by WHOLE cells so
    its center tracks ``center_xy``, carrying plastic sinkage with the roll
    and exposing fresh undeformed soil at the leading edges.

    Fully traced (the shift is data-dependent but the shapes are static), so
    it can run inside the jitted vehicle step every cycle.  ``z0_fn(x, y)``
    re-evaluates the undeformed height on newly exposed strips (default 0 —
    flat virgin soil).
    """
    nx, ny = state.sinkage.shape
    half = jnp.asarray([(nx - 1) / 2.0, (ny - 1) / 2.0]) * state.spacing
    target_origin = jnp.asarray(center_xy) - half
    shift = jnp.round((target_origin - state.origin)
                      / state.spacing).astype(jnp.int32)
    new_origin = state.origin + shift.astype(state.origin.dtype) \
        * state.spacing

    def roll_and_clear(a, fresh):
        a = jnp.roll(a, (-shift[0], -shift[1]), axis=(0, 1))
        ii = jnp.arange(nx)[:, None]
        jj = jnp.arange(ny)[None, :]
        # indices wrapped around by the roll hold stale data → reset
        stale_i = jnp.where(shift[0] >= 0, ii >= nx - shift[0],
                            ii < -shift[0])
        stale_j = jnp.where(shift[1] >= 0, jj >= ny - shift[1],
                            jj < -shift[1])
        return jnp.where(stale_i | stale_j, fresh, a)

    xs = new_origin[0] + state.spacing * jnp.arange(nx)[:, None]
    ys = new_origin[1] + state.spacing * jnp.arange(ny)[None, :]
    z0_fresh = jnp.zeros((nx, ny), state.z0.dtype) if z0_fn is None \
        else z0_fn(xs + 0 * ys, ys + 0 * xs)
    return state.replace(
        z0=roll_and_clear(state.z0, z0_fresh),
        sinkage=roll_and_clear(state.sinkage, jnp.zeros((), state.z0.dtype)),
        origin=new_origin,
    )
