"""Handling tire models: TMeasy and Fiala, as pure batched functions.

Capability counterparts of the reference's handling-tire family
(/root/reference/src/chrono_vehicle/wheeled_vehicle/tire/ChTMeasyTire.h,
ChFialaTire.h): slip-based semi-empirical force models evaluated per wheel per
step.  Written as vectorized pure functions of (wheel state, terrain query,
params) → (force, torque) so all four (or N) wheels evaluate in one fused pass
inside the jitted vehicle step — no per-tire objects, no host callbacks.

Conventions: wheel frame has spin axis = local y; terrain supplies height and
normal at the contact point; forces returned in world frame at the contact
patch plus the rolling-resistance/driving torque about the spin axis.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.core import quaternion as Q


@pytree_dataclass
class TMeasyParams:
    """TMeasy coefficient set (degressive force vs slip characteristic).

    Nominal values parameterized at the rated load Fz0; force curves scale
    ~linearly with load between 1·Fz0 and 2·Fz0 (standard TMeasy structure).
    """

    radius: Array = 0.35          # unloaded radius [m]
    width: Array = 0.25
    Fz0: Array = 3000.0           # rated vertical load [N]
    cz: Array = 250000.0          # vertical stiffness [N/m]
    dz: Array = 3000.0            # vertical damping [N s/m]
    # longitudinal characteristic at Fz0 / 2·Fz0
    dfx0_1: Array = 80000.0       # initial slope dFx/dsx
    fxm_1: Array = 3500.0         # peak force
    fxs_1: Array = 3100.0         # sliding force
    sxm_1: Array = 0.12           # slip at peak
    sxs_1: Array = 0.7            # slip at full sliding
    dfx0_2: Array = 160000.0
    fxm_2: Array = 6800.0
    fxs_2: Array = 6000.0
    sxm_2: Array = 0.14
    sxs_2: Array = 0.8
    # lateral characteristic
    dfy0_1: Array = 50000.0
    fym_1: Array = 3200.0
    fys_1: Array = 2800.0
    sym_1: Array = 0.25
    sys_1: Array = 0.9
    dfy0_2: Array = 95000.0
    fym_2: Array = 6100.0
    fys_2: Array = 5400.0
    sym_2: Array = 0.28
    sys_2: Array = 1.0
    rolling_resistance: Array = 0.015


def _tmeasy_curve(s, dfx0, fm, fs, sm, ss):
    """TMeasy master curve: polynomial rise to the peak, smooth decay to
    sliding level (branch-free)."""
    s = jnp.abs(s)
    # rising segment 0..sm (cubic-like rational form from TMeasy)
    sigma = s / jnp.maximum(sm, 1e-6)
    denom = 1.0 + sigma * (sigma + dfx0 * sm / jnp.maximum(fm, 1e-6) - 2.0)
    f_rise = dfx0 * sm * sigma / jnp.maximum(denom, 1e-6)
    # falling segment sm..ss: smooth cubic blend from fm to fs
    a = jnp.clip((s - sm) / jnp.maximum(ss - sm, 1e-6), 0.0, 1.0)
    f_fall = fm - (fm - fs) * a * a * (3.0 - 2.0 * a)
    return jnp.where(s <= sm, f_rise, f_fall)


def _load_interp(fz, v1, v2, Fz0):
    """TMeasy 2-point load scaling (linear between Fz0 and 2Fz0, clamped)."""
    t = jnp.clip(fz / Fz0 - 1.0, -0.75, 1.0)
    return v1 + (v2 - v1) * t


def tmeasy_forces(p: TMeasyParams, wheel_x, wheel_q, wheel_v, wheel_w_local,
                  terrain_height_fn, terrain_mu=1.0, eps=1e-3):
    """Tire forces for N wheels (all arrays batched on the leading axis).

    terrain_height_fn: (N,2) xy → (N,) height (flat/heightmap/SCM query).
    Returns (force_world (N,3) applied at the wheel center, torque_spin (N,)
    about the wheel's local y axis, fz (N,) normal load).
    """
    # contact geometry: penetration of the lowest point vs terrain
    z_terrain = terrain_height_fn(wheel_x[..., :2])
    # wheel axes in world
    R = Q.q_to_matrix(wheel_q)
    e_spin = R[..., :, 1]                               # local y = spin axis
    up = jnp.asarray([0.0, 0.0, 1.0], wheel_x.dtype)
    # longitudinal direction: forward = spin × up (right-handed, wheel rolls +x)
    e_lon = jnp.cross(e_spin, up)
    e_lon = e_lon / jnp.maximum(
        jnp.linalg.norm(e_lon, axis=-1, keepdims=True), 1e-9)
    e_lat = jnp.cross(up, e_lon)

    pen = (p.radius + z_terrain) - wheel_x[..., 2]      # >0 in contact
    vz = wheel_v[..., 2]
    fz = jnp.maximum(p.cz * pen - p.dz * vz, 0.0)
    in_contact = pen > 0

    # slip kinematics at the contact point
    v_lon = jnp.sum(wheel_v * e_lon, axis=-1)
    v_lat = jnp.sum(wheel_v * e_lat, axis=-1)
    omega = jnp.sum(wheel_w_local * jnp.asarray([0.0, 1.0, 0.0]), axis=-1)
    r_eff = p.radius - pen / 3.0
    v_roll = omega * r_eff
    v_ref = jnp.maximum(jnp.abs(v_lon), 1.0)            # low-speed regularized
    sx = (v_roll - v_lon) / v_ref
    sy = -v_lat / v_ref

    # load-interpolated characteristics
    dfx0 = _load_interp(fz, p.dfx0_1, p.dfx0_2, p.Fz0)
    fxm = _load_interp(fz, p.fxm_1, p.fxm_2, p.Fz0) * terrain_mu
    fxs = _load_interp(fz, p.fxs_1, p.fxs_2, p.Fz0) * terrain_mu
    sxm = _load_interp(fz, p.sxm_1, p.sxm_2, p.Fz0)
    sxs = _load_interp(fz, p.sxs_1, p.sxs_2, p.Fz0)
    dfy0 = _load_interp(fz, p.dfy0_1, p.dfy0_2, p.Fz0)
    fym = _load_interp(fz, p.fym_1, p.fym_2, p.Fz0) * terrain_mu
    fys = _load_interp(fz, p.fys_1, p.fys_2, p.Fz0) * terrain_mu
    sym = _load_interp(fz, p.sym_1, p.sym_2, p.Fz0)
    sys_ = _load_interp(fz, p.sys_1, p.sys_2, p.Fz0)

    # combined slip via the normalized-slip trick (TMeasy combined approach)
    sxn = sx / jnp.maximum(sxm, 1e-6)
    syn = sy / jnp.maximum(sym, 1e-6)
    sc = jnp.sqrt(sxn * sxn + syn * syn) + 1e-9
    cphi = sxn / sc
    sphi = syn / sc
    # blended characteristic along the combined direction
    sm_c = jnp.sqrt((sxm * cphi) ** 2 + (sym * sphi) ** 2)
    ss_c = jnp.sqrt((sxs * cphi) ** 2 + (sys_ * sphi) ** 2)
    fm_c = jnp.sqrt((fxm * cphi) ** 2 + (fym * sphi) ** 2)
    fs_c = jnp.sqrt((fxs * cphi) ** 2 + (fys * sphi) ** 2)
    df0_c = jnp.sqrt((dfx0 * cphi) ** 2 + (dfy0 * sphi) ** 2)
    s_c = sc * sm_c                                     # physical combined slip
    f_c = _tmeasy_curve(s_c, df0_c, fm_c, fs_c, sm_c, ss_c)
    # cphi/sphi already carry the slip signs — they are the (normalized,
    # signed) slip direction components
    fx = f_c * cphi
    fy = f_c * sphi

    zero = jnp.zeros_like(fz)
    fx = jnp.where(in_contact, fx, zero)
    fy = jnp.where(in_contact, fy, zero)
    fzc = jnp.where(in_contact, fz, zero)

    force = (fx[..., None] * e_lon + fy[..., None] * e_lat
             + fzc[..., None] * up)
    # spin-axis torque: tire longitudinal reaction + rolling resistance
    t_spin = -fx * r_eff - jnp.where(
        in_contact, p.rolling_resistance * fzc * r_eff * jnp.tanh(2.0 * omega),
        zero)
    return force, t_spin, fzc


@pytree_dataclass
class FialaParams:
    """Fiala tire (simpler brush model; reference ChFialaTire)."""

    radius: Array = 0.35
    cz: Array = 250000.0
    dz: Array = 3000.0
    c_slip: Array = 80000.0     # dFx/dsx at sx=0
    c_alpha: Array = 50000.0    # dFy/dα at α=0
    mu: Array = 0.9
    rolling_resistance: Array = 0.015


def fiala_forces(p: FialaParams, wheel_x, wheel_q, wheel_v, wheel_w_local,
                 terrain_height_fn):
    """Fiala brush-model forces (no combined-slip coupling, like the ref)."""
    z_terrain = terrain_height_fn(wheel_x[..., :2])
    R = Q.q_to_matrix(wheel_q)
    e_spin = R[..., :, 1]
    up = jnp.asarray([0.0, 0.0, 1.0], wheel_x.dtype)
    e_lon = jnp.cross(e_spin, up)
    e_lon = e_lon / jnp.maximum(
        jnp.linalg.norm(e_lon, axis=-1, keepdims=True), 1e-9)
    e_lat = jnp.cross(up, e_lon)

    pen = (p.radius + z_terrain) - wheel_x[..., 2]
    fz = jnp.maximum(p.cz * pen - p.dz * wheel_v[..., 2], 0.0)
    in_contact = pen > 0

    v_lon = jnp.sum(wheel_v * e_lon, axis=-1)
    v_lat = jnp.sum(wheel_v * e_lat, axis=-1)
    omega = wheel_w_local[..., 1]
    r_eff = p.radius - pen / 3.0
    v_ref = jnp.maximum(jnp.abs(v_lon), 1.0)
    sx = (omega * r_eff - v_lon) / v_ref
    alpha = jnp.arctan2(-v_lat, v_ref)

    # longitudinal: linear then friction-clamped (Fiala critical slip)
    fx = jnp.clip(p.c_slip * sx, -p.mu * fz, p.mu * fz)
    # lateral: cubic brush saturation
    a_crit = jnp.arctan(3.0 * p.mu * fz / jnp.maximum(p.c_alpha, 1e-6))
    ta = jnp.tan(jnp.clip(jnp.abs(alpha), 0.0, a_crit))
    xi = 1.0 - p.c_alpha * ta / jnp.maximum(3.0 * p.mu * fz, 1e-6)
    fy_mag = jnp.where(jnp.abs(alpha) < a_crit,
                       p.mu * fz * (1.0 - xi**3), p.mu * fz)
    fy = jnp.sign(alpha) * fy_mag

    zero = jnp.zeros_like(fz)
    fx = jnp.where(in_contact, fx, zero)
    fy = jnp.where(in_contact, fy, zero)
    fzc = jnp.where(in_contact, fz, zero)
    force = (fx[..., None] * e_lon + fy[..., None] * e_lat
             + fzc[..., None] * up)
    t_spin = -fx * r_eff - jnp.where(
        in_contact, p.rolling_resistance * fzc * r_eff * jnp.tanh(2.0 * omega),
        zero)
    return force, t_spin, fzc


@pytree_dataclass
class Pac89Params:
    """Magic Formula (Pacejka '89-style) coefficient set.

    Counterpart of the reference's ChPac89Tire: F = D sin(C arctan(B s − E(B s
    − arctan B s))) for longitudinal (slip ratio κ) and lateral (slip angle α)
    forces, with load-proportional peak D = μ Fz.
    """

    radius: Array = 0.35
    cz: Array = 250000.0
    dz: Array = 3000.0
    mu: Array = 1.0            # peak friction scale (D = mu·Fz)
    Bx: Array = 10.0           # longitudinal stiffness factor
    Cx: Array = 1.65           # shape
    Ex: Array = 0.6            # curvature
    By: Array = 8.0
    Cy: Array = 1.3
    Ey: Array = -1.0
    rolling_resistance: Array = 0.015


def _magic(s, B, C, D, E):
    Bs = B * s
    return D * jnp.sin(C * jnp.arctan(Bs - E * (Bs - jnp.arctan(Bs))))


def pac89_forces(p: Pac89Params, wheel_x, wheel_q, wheel_v, wheel_w_local,
                 terrain_height_fn):
    """Magic Formula tire forces (uncombined, like the reference Pac89)."""
    z_terrain = terrain_height_fn(wheel_x[..., :2])
    R = Q.q_to_matrix(wheel_q)
    e_spin = R[..., :, 1]
    up = jnp.asarray([0.0, 0.0, 1.0], wheel_x.dtype)
    e_lon = jnp.cross(e_spin, up)
    e_lon = e_lon / jnp.maximum(
        jnp.linalg.norm(e_lon, axis=-1, keepdims=True), 1e-9)
    e_lat = jnp.cross(up, e_lon)

    pen = (p.radius + z_terrain) - wheel_x[..., 2]
    fz = jnp.maximum(p.cz * pen - p.dz * wheel_v[..., 2], 0.0)
    in_contact = pen > 0

    v_lon = jnp.sum(wheel_v * e_lon, axis=-1)
    v_lat = jnp.sum(wheel_v * e_lat, axis=-1)
    omega = wheel_w_local[..., 1]
    r_eff = p.radius - pen / 3.0
    v_ref = jnp.maximum(jnp.abs(v_lon), 1.0)
    kappa = (omega * r_eff - v_lon) / v_ref
    alpha = jnp.arctan2(-v_lat, v_ref)

    fx = _magic(kappa, p.Bx, p.Cx, p.mu * fz, p.Ex)
    fy = _magic(alpha, p.By, p.Cy, p.mu * fz, p.Ey)

    zero = jnp.zeros_like(fz)
    fx = jnp.where(in_contact, fx, zero)
    fy = jnp.where(in_contact, fy, zero)
    fzc = jnp.where(in_contact, fz, zero)
    force = (fx[..., None] * e_lon + fy[..., None] * e_lat
             + fzc[..., None] * up)
    t_spin = -fx * r_eff - jnp.where(
        in_contact, p.rolling_resistance * fzc * r_eff * jnp.tanh(2.0 * omega),
        zero)
    return force, t_spin, fzc


@pytree_dataclass
class Pac02Params:
    """Pacejka 2002 Magic Formula subset (ChPac02Tire counterpart,
    /root/reference/src/chrono_vehicle/wheeled_vehicle/tire/ChPac02Tire.h).

    Over Pac89 this adds the MF-Tyre structure the reference exposes:
    nondimensional load dependence (dfz), camber sensitivity, COMBINED slip
    via cosine weighting functions Gxα/Gyκ, and a pneumatic-trail aligning
    moment.  Coefficients are the standard MF names (p*, r*, q*).
    """

    radius: Array = 0.35
    cz: Array = 250000.0
    dz: Array = 3000.0
    Fz0: Array = 4000.0        # nominal load
    # longitudinal pure slip
    pCx1: Array = 1.65
    pDx1: Array = 1.0          # peak μx at Fz0
    pDx2: Array = -0.08        # load sensitivity of μx
    pEx1: Array = 0.6
    pKx1: Array = 20.0         # Kx/Fz at Fz0
    pKx2: Array = -0.5
    # lateral pure slip
    pCy1: Array = 1.3
    pDy1: Array = 0.95
    pDy2: Array = -0.1
    pEy1: Array = -1.0
    pKy1: Array = 15.0         # cornering stiffness factor
    pKy2: Array = 1.6          # load at peak stiffness (·Fz0)
    pKy3: Array = 0.4          # camber gain
    pHy3: Array = 0.02         # camber-induced slip shift
    pVy3: Array = -1.0         # camber-induced force shift (·Fz·γ)
    # combined slip weighting
    rBx1: Array = 12.0
    rCx1: Array = 1.0
    rBy1: Array = 10.0
    rCy1: Array = 1.0
    # aligning moment (pneumatic trail)
    qDz1: Array = 0.12         # trail / contact-patch fraction
    qBz1: Array = 8.0
    rolling_resistance: Array = 0.015


def pac02_forces(p: Pac02Params, wheel_x, wheel_q, wheel_v, wheel_w_local,
                 terrain_height_fn):
    """MF-2002 combined-slip tire forces.

    Returns (force_world (…,3), spin_torque, fz) like the other tire models;
    the aligning moment rides the spin-torque channel's sibling (returned
    forces are applied at the contact patch by the vehicle step).
    """
    z_terrain = terrain_height_fn(wheel_x[..., :2])
    R = Q.q_to_matrix(wheel_q)
    e_spin = R[..., :, 1]
    up = jnp.asarray([0.0, 0.0, 1.0], wheel_x.dtype)
    e_lon = jnp.cross(e_spin, up)
    e_lon = e_lon / jnp.maximum(
        jnp.linalg.norm(e_lon, axis=-1, keepdims=True), 1e-9)
    e_lat = jnp.cross(up, e_lon)
    # camber: inclination of the spin axis out of the ground plane
    gamma = jnp.arcsin(jnp.clip(e_spin[..., 2], -0.5, 0.5))

    pen = (p.radius + z_terrain) - wheel_x[..., 2]
    fz = jnp.maximum(p.cz * pen - p.dz * wheel_v[..., 2], 0.0)
    in_contact = pen > 0
    dfz = (fz - p.Fz0) / p.Fz0

    v_lon = jnp.sum(wheel_v * e_lon, axis=-1)
    v_lat = jnp.sum(wheel_v * e_lat, axis=-1)
    omega = wheel_w_local[..., 1]
    r_eff = p.radius - pen / 3.0
    v_ref = jnp.maximum(jnp.abs(v_lon), 1.0)
    kappa = (omega * r_eff - v_lon) / v_ref
    alpha = jnp.arctan2(-v_lat, v_ref)

    # --- longitudinal pure slip ---
    mux = (p.pDx1 + p.pDx2 * dfz)
    Dx = mux * fz
    Kx = fz * (p.pKx1 + p.pKx2 * dfz)
    Bx = Kx / jnp.maximum(p.pCx1 * Dx, 1e-6)
    fx0 = _magic(kappa, Bx, p.pCx1, Dx, p.pEx1)

    # --- lateral pure slip with camber ---
    muy = (p.pDy1 + p.pDy2 * dfz)
    Dy = muy * fz
    Ky = p.pKy1 * p.Fz0 * jnp.sin(
        2.0 * jnp.arctan(fz / jnp.maximum(p.pKy2 * p.Fz0, 1e-6))) \
        * (1.0 - p.pKy3 * jnp.abs(gamma))
    By = Ky / jnp.maximum(p.pCy1 * Dy, 1e-6)
    Shy = p.pHy3 * gamma
    Svy = fz * p.pVy3 * gamma
    fy0 = _magic(alpha + Shy, By, p.pCy1, Dy, p.pEy1) + Svy

    # --- combined slip (cosine weighting, MF-Tyre G functions) ---
    Gxa = jnp.cos(p.rCx1 * jnp.arctan(p.rBx1 * alpha)) \
        / jnp.maximum(jnp.cos(p.rCx1 * jnp.arctan(0.0)), 1e-6)
    Gyk = jnp.cos(p.rCy1 * jnp.arctan(p.rBy1 * kappa))
    fx = fx0 * Gxa
    fy = fy0 * Gyk

    # --- aligning moment via pneumatic trail (reported; not yet applied) ---
    trail = p.qDz1 * (2.0 * p.radius * 0.35) \
        * jnp.cos(jnp.arctan(p.qBz1 * alpha))
    mz = -trail * fy
    del mz  # exposed in a later vehicle-step revision

    zero = jnp.zeros_like(fz)
    fx = jnp.where(in_contact, fx, zero)
    fy = jnp.where(in_contact, fy, zero)
    fzc = jnp.where(in_contact, fz, zero)
    force = (fx[..., None] * e_lon + fy[..., None] * e_lat
             + fzc[..., None] * up)
    t_spin = -fx * r_eff - jnp.where(
        in_contact, p.rolling_resistance * fzc * r_eff * jnp.tanh(2.0 * omega),
        zero)
    return force, t_spin, fzc


@pytree_dataclass
class TMsimpleParams:
    """TMsimple handling tire (reference ChTMsimpleTire: two-point quadratic
    load interpolation of (F_max, dF0, F_s) per axis and the force law
    F(s) = μ K sin(B (1 − e^{−s/A})), B = π − asin(Fs/Fmax), A = K·B/dF0,
    with combined slip blended by the slip direction —
    /root/reference/src/chrono_vehicle/wheeled_vehicle/tire/
    ChTMsimpleTire.cpp TMcombinedForces)."""

    radius: Array = 0.35
    width: Array = 0.2
    Fz0: Array = 4000.0          # nominal load pn
    cz: Array = 250e3
    dz: Array = 1e3
    # characteristics at Fz0 and 2·Fz0
    dfx0_1: Array = 80e3
    dfx0_2: Array = 150e3
    fxm_1: Array = 4500.0
    fxm_2: Array = 8500.0
    fxs_1: Array = 3500.0
    fxs_2: Array = 6800.0
    dfy0_1: Array = 60e3
    dfy0_2: Array = 110e3
    fym_1: Array = 4000.0
    fym_2: Array = 7500.0
    fys_1: Array = 3200.0
    fys_2: Array = 6200.0
    rolling_resistance: Array = 0.01


def _tms_quad(fz, v1, v2, Fz0):
    """Two-point quadratic a1·q + a2·q² through (1, v1), (2, v2)."""
    q = fz / Fz0
    a2 = 0.5 * (v2 - 2.0 * v1)
    a1 = v1 - a2
    return a1 * q + a2 * q * q


def tmsimple_forces(p: TMsimpleParams, wheel_x, wheel_q, wheel_v,
                    wheel_w_local, terrain_height_fn, terrain_mu=1.0):
    """Same batched contact/slip kinematics as tmeasy_forces, TMsimple law."""
    z_terrain = terrain_height_fn(wheel_x[..., :2])
    R = Q.q_to_matrix(wheel_q)
    e_spin = R[..., :, 1]
    up = jnp.asarray([0.0, 0.0, 1.0], wheel_x.dtype)
    e_lon = jnp.cross(e_spin, up)
    e_lon = e_lon / jnp.maximum(
        jnp.linalg.norm(e_lon, axis=-1, keepdims=True), 1e-9)
    e_lat = jnp.cross(up, e_lon)

    pen = (p.radius + z_terrain) - wheel_x[..., 2]
    vz = wheel_v[..., 2]
    fz = jnp.maximum(p.cz * pen - p.dz * vz, 0.0)
    in_contact = pen > 0

    v_lon = jnp.sum(wheel_v * e_lon, axis=-1)
    v_lat = jnp.sum(wheel_v * e_lat, axis=-1)
    omega = jnp.sum(wheel_w_local * jnp.asarray([0.0, 1.0, 0.0]), axis=-1)
    r_eff = p.radius - pen / 3.0
    v_ref = jnp.maximum(jnp.abs(v_lon), 1.0)
    sx = (omega * r_eff - v_lon) / v_ref
    sy = -v_lat / v_ref

    Fx_max = _tms_quad(fz, p.fxm_1, p.fxm_2, p.Fz0)
    Fy_max = _tms_quad(fz, p.fym_1, p.fym_2, p.Fz0)
    dFx0 = _tms_quad(fz, p.dfx0_1, p.dfx0_2, p.Fz0)
    dFy0 = _tms_quad(fz, p.dfy0_1, p.dfy0_2, p.Fz0)
    Fxs = _tms_quad(fz, p.fxs_1, p.fxs_2, p.Fz0)
    Fys = _tms_quad(fz, p.fys_1, p.fys_2, p.Fz0)

    s = jnp.sqrt(sx * sx + sy * sy) + 1e-12
    cbeta = sx / s
    sbeta = sy / s
    K = jnp.sqrt((Fx_max * cbeta) ** 2 + (Fy_max * sbeta) ** 2) + 1e-9
    dF0 = jnp.sqrt((dFx0 * cbeta) ** 2 + (dFy0 * sbeta) ** 2) + 1e-9
    Fs = jnp.sqrt((Fxs * cbeta) ** 2 + (Fys * sbeta) ** 2)
    Qcrit = jnp.clip(Fs / K, -1.0, 1.0)
    B = jnp.pi - jnp.arcsin(Qcrit)
    A = K * B / dF0
    Fa = terrain_mu * K * jnp.sin(B * (1.0 - jnp.exp(-s / A)))

    zero = jnp.zeros_like(fz)
    fx = jnp.where(in_contact, Fa * cbeta, zero)
    fy = jnp.where(in_contact, Fa * sbeta, zero)
    fzc = jnp.where(in_contact, fz, zero)
    force = (fx[..., None] * e_lon + fy[..., None] * e_lat
             + fzc[..., None] * up)
    t_spin = -fx * r_eff - jnp.where(
        in_contact,
        p.rolling_resistance * fzc * r_eff * jnp.tanh(2.0 * omega), zero)
    return force, t_spin, fzc
