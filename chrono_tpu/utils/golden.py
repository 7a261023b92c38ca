"""Golden-trajectory validation against the reference's recorded ADAMS data.

The reference validates every joint type by simulating a canonical pendulum
mechanism and comparing eight recorded quantities (Pos/Vel/Acc/Quat/Avel/Aacc/
Rforce/Rtorque) against golden ADAMS trajectories with RMS norms
(/root/reference/src/tests/unit_tests/joints/utest_JOINT_revolute.cpp:33-51,
utils/ChValidation.h:42-45).  This module reproduces those exact scenarios on
the chrono_tpu stack: same mechanism, same Euler-implicit-linearized stepping
semantics, golden files read straight from the reference's data tree.

Run standalone (prints JSON norms for every case):

    python -m chrono_tpu.utils.golden [--dtype f64] [--cases revolute,...]

The test-suite invokes this in a subprocess with x64 enabled so the tight
reference tolerances (Vel RMS 1e-4) are met without flipping the global x64
switch for the rest of the (fp32) test session.
"""

from __future__ import annotations

import json
import os

import numpy as np

GOLDEN_ROOT = "/root/reference/data/testing/joints"

_G = 9.80665


def load_adams(path: str) -> np.ndarray:
    """Load a reference golden file: tab-separated, '#' comments, one header."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                continue  # header line
    return np.asarray(rows)


def quat_x(angle):
    return np.array([np.cos(angle / 2), np.sin(angle / 2), 0.0, 0.0])


def quat_y(angle):
    return np.array([np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0])


def quat_z(angle):
    return np.array([np.cos(angle / 2), 0.0, 0.0, np.sin(angle / 2)])


def _qrot_np(q, v):
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return R @ np.asarray(v)


# ---------------------------------------------------------------------------
# Case registry: mirrors the reference's utest_JOINT_* main() scenarios.
# Every case: 1 kg pendulum, 5e-4 s steps, 5 s, outputs every 1e-2 s,
# g = 9.80665 in -z, started at rest.
# ---------------------------------------------------------------------------

def _pend_cases():
    """(name, joint_kind, joint_loc, joint_quat, pend_pos, pend_quat,
    inertia, golden_dir, ref_name, axis_convention)"""
    cases = []

    # revolute: CG at jointLoc + rot*(L/2,0,0); joint z = rotation axis
    for nm, loc, qj in [
        ("Revolute_Case01", (0, 0, 0), quat_x(-np.pi / 2)),
        ("Revolute_Case02", (1, 2, 3), quat_x(-np.pi / 4)),
    ]:
        pend = np.asarray(loc) + _qrot_np(qj, (2.0, 0, 0))
        cases.append(dict(name=nm, kind="revolute", joint_loc=loc,
                          joint_quat=qj, pend_pos=pend, pend_quat=qj,
                          inertia=(0.04, 0.1, 0.1),
                          golden_dir="revolute_joint"))

    for nm, loc, qj in [
        ("Spherical_Case01", (0, 0, 0), np.array([1.0, 0, 0, 0])),
        ("Spherical_Case02", (1, 2, 3), quat_x(-np.pi / 4)),
    ]:
        pend = np.asarray(loc) + _qrot_np(qj, (2.0, 0, 0))
        cases.append(dict(name=nm, kind="spherical", joint_loc=loc,
                          joint_quat=qj, pend_pos=pend, pend_quat=qj,
                          inertia=(0.04, 0.1, 0.1),
                          golden_dir="spherical_joint"))

    # prismatic: slider translates along joint z
    for nm, loc, qj in [
        ("Prismatic_Case01", (0, 0, 0), np.array([1.0, 0, 0, 0])),
        ("Prismatic_Case02", (1, 2, 3), quat_x(-np.pi / 4)),
        ("Prismatic_Case03", (1, 2, 3), quat_x(-np.pi / 2)),
    ]:
        pend = np.asarray(loc) + _qrot_np(qj, (2.0, 0, 0))
        cases.append(dict(name=nm, kind="prismatic", joint_loc=loc,
                          joint_quat=qj, pend_pos=pend, pend_quat=qj,
                          inertia=(0.04, 0.1, 0.1),
                          golden_dir="prismatic_joint"))

    for nm, loc, qj in [
        ("Cylindrical_Case01", (0, 0, 0), np.array([1.0, 0, 0, 0])),
        ("Cylindrical_Case02", (0, 0, 0), quat_x(-np.pi / 2)),
        ("Cylindrical_Case03", (1, 2, 3), quat_x(-np.pi / 4)),
    ]:
        pend = np.asarray(loc) + _qrot_np(qj, (2.0, 0, 0))
        cases.append(dict(name=nm, kind="cylindrical", joint_loc=loc,
                          joint_quat=qj, pend_pos=pend, pend_quat=qj,
                          inertia=(0.04, 0.1, 0.1),
                          golden_dir="cylindrical_joint"))

    # universal: CG at jointLoc + rot*(0,0,-L/2), inertia (0.1,0.1,0.04)
    for nm, loc, qj in [
        ("Universal_Case01", (0, 0, 0), quat_x(np.pi / 2)),
        ("Universal_Case02", (0, 0, 0), quat_y(np.pi / 2)),
    ]:
        pend = np.asarray(loc) + _qrot_np(qj, (0, 0, -2.0))
        cases.append(dict(name=nm, kind="universal", joint_loc=loc,
                          joint_quat=qj, pend_pos=pend, pend_quat=qj,
                          inertia=(0.1, 0.1, 0.04),
                          golden_dir="universal_joint"))

    # rotational spring-damper on a revolute (ChLinkRSDA on the joint z;
    # Case02's nonlinear spring modulation is out of scope for the linear
    # RSDA element)
    cases.append(dict(
        name="RotSpring_Case01", kind="rotspring", joint_loc=(0, 0, 0),
        joint_quat=quat_x(-np.pi / 2),
        pend_pos=_qrot_np(quat_x(-np.pi / 2), (2.0, 0, 0)),
        pend_quat=quat_x(-np.pi / 2), inertia=(0.04, 0.1, 0.1),
        spring_k=200.0, spring_c=10.0, sim_step=2e-4,
        golden_dir="rotspring_force"))

    # translational spring-damper on a free body (ChLinkTSDA; rest length =
    # initial anchor distance, the reference's default)
    for nm, pgnd, ppend, cs_pos, k, c in [
        ("TranSpring_Case01", (0, 0, 0), (0, 0, 0), (0, 0, 0), 10.0, 0.5),
        ("TranSpring_Case02", (0, 0, 0), (0, 2, 0), (0, 2, 0), 100.0, 5.0),
    ]:
        cases.append(dict(name=nm, kind="tsda", anchor_gnd=pgnd,
                          anchor_pend=ppend, pend_pos=cs_pos,
                          pend_quat=np.array([1.0, 0, 0, 0]),
                          inertia=(0.04, 0.1, 0.1), spring_k=k, spring_c=c,
                          sim_step=1e-4, golden_dir="transpring_force"))

    # revolute-spherical composite (ChLinkRevoluteSpherical)
    for nm, gl, ax, pl, cs in [
        ("RevSpherical_Case01", (0, 0, 0), (0, 0, 1), (2, 0, 0), (2, 2, 0)),
        ("RevSpherical_Case02", (1, 2, 3), (0, 1, 1), (3, 2, 3), (3, 4, 3)),
    ]:
        cases.append(dict(name=nm, kind="rev_spherical", gnd_loc=gl,
                          axis=ax, pend_loc=pl, pend_pos=cs,
                          pend_quat=np.array([1.0, 0, 0, 0]),
                          inertia=(0.1, 0.04, 0.1), sim_step=1e-5,
                          golden_dir="revsph_constraint"))

    # linear actuator: plate on a prismatic driven at constant speed
    # (ChLinkLockLinActuator with a ramp function)
    for nm, qj, speed in [
        ("LinActuator_Case01", np.array([1.0, 0, 0, 0]), 1.0),
        ("LinActuator_Case02", quat_y(np.pi / 4), 0.5),
    ]:
        cases.append(dict(name=nm, kind="lin_actuator", joint_loc=(0, 0, 0),
                          joint_quat=qj, pend_pos=(0, 0, 0), pend_quat=qj,
                          inertia=(1.0, 1.0, 1.0), speed=speed,
                          golden_dir="lin_actuator"))

    # distance: anchor points in world + explicit pendulum csys
    for nm, pgnd, ppend, cs_pos, cs_q in [
        ("Distance_Case01", (0, 0, 0), (0, 2, 0), (0, 2, 0),
         np.array([1.0, 0, 0, 0])),
        ("Distance_Case02", (1, 2, 3), (1, 4, 3), (-1, 4, 3),
         np.array([1.0, 0, 0, 0])),
        ("Distance_Case03", (0, 0, 0), (0, 2, 0), (0, 4, 0),
         quat_z(-np.pi / 2)),
    ]:
        cases.append(dict(name=nm, kind="distance", anchor_gnd=pgnd,
                          anchor_pend=ppend, pend_pos=cs_pos, pend_quat=cs_q,
                          inertia=(0.04, 0.1, 0.1),
                          golden_dir="distance_constraint"))
    return cases


CASES = {c["name"]: c for c in _pend_cases()}


def run_case(case: dict, dtype_str: str = "f64",
             sim_step: float = None, out_step: float = 1e-2,
             t_end: float = 5.0) -> dict:
    """Simulate one golden scenario; return RMS norms per quantity.

    Returns {"norms": {"Pos": [...], ...}, "energy_rms": x,
             "constraint_rms": x, "missing": [...]}.
    """
    import jax
    import jax.numpy as jnp
    from chrono_tpu.core import quaternion as Q
    from chrono_tpu.physics.builder import SystemBuilder
    from chrono_tpu.physics.system import (
        SolverSettings, step_euler_implicit_linearized, bilateral_rows,
    )
    from chrono_tpu.physics import body as B
    from chrono_tpu.solver import descriptor as desc
    from chrono_tpu.utils.validation import rms_norm

    dt = jnp.float64 if dtype_str == "f64" else jnp.float32
    if sim_step is None:
        # per-case step size — the reference's utest mains differ (1e-5 for
        # revsph, 1e-4 transpring, 2e-4 rotspring, 5e-4 the rest)
        sim_step = case.get("sim_step", 5e-4)

    kind = case["kind"]
    bld = SystemBuilder(dtype=dt)
    bld.set_gravity((0, 0, -_G))
    gnd = bld.add_ground()
    init_vel = (0.0, 0.0, 0.0)
    if kind == "lin_actuator":
        axis_w = _qrot_np(case["joint_quat"], (0, 0, 1))
        init_vel = tuple(case["speed"] * axis_w)
    pend = bld.add_body(mass=1.0, inertia=case["inertia"],
                        pos=case["pend_pos"], rot=case["pend_quat"],
                        vel=init_vel)
    if kind == "distance":
        bld.add_distance(pend, gnd, case["anchor_pend"], case["anchor_gnd"])
        joint_loc = np.asarray(case["anchor_gnd"], float)
    elif kind == "tsda":
        bld.add_tsda(pend, gnd, case["anchor_pend"], case["anchor_gnd"],
                     k=case["spring_k"], c=case["spring_c"])
        joint_loc = np.asarray(case["anchor_gnd"], float)
    elif kind == "rev_spherical":
        bld.add_rev_spherical(gnd, pend, case["gnd_loc"],
                              axis_world=case["axis"],
                              point_world=case["pend_loc"])
        joint_loc = np.asarray(case["gnd_loc"], float)
    elif kind == "lin_actuator":
        from chrono_tpu.core.functions import FRamp
        qj = case["joint_quat"]
        bld.add_joint_frames(
            "prismatic", pend, gnd,
            fa_pos=bld._world_to_local(pend, np.asarray(case["joint_loc"],
                                                        float), qj)[0],
            fa_rot=bld._world_to_local(pend, np.zeros(3), qj)[1],
            fb_pos=np.asarray(case["joint_loc"], float),
            fb_rot=qj,
        )
        import jax.numpy as _jnp
        bld.add_motor_linear_position(
            gnd, pend, case["joint_loc"], tuple(axis_w),
            FRamp(y0=_jnp.asarray(0.0, dt), slope=_jnp.asarray(
                case["speed"], dt)), add_joint=False)
        joint_loc = np.asarray(case["joint_loc"], float)
    else:
        if kind == "rotspring":
            axis_w = _qrot_np(case["joint_quat"], (0, 0, 1))
            bld.add_rsda(pend, gnd, world_axis=tuple(axis_w),
                         k=case["spring_k"], c=case["spring_c"])
        # world joint frame: z axis = quat's z column (reference convention)
        qj = case["joint_quat"]
        axis = _qrot_np(qj, (0, 0, 1))
        bld.add_joint_frames(
            "revolute" if kind == "rotspring" else kind, pend, gnd,
            fa_pos=bld._world_to_local(pend, np.asarray(case["joint_loc"],
                                                        float), qj)[0],
            fa_rot=bld._world_to_local(pend, np.zeros(3), qj)[1],
            fb_pos=np.asarray(case["joint_loc"], float),
            fb_rot=qj,
        )
        del axis
        joint_loc = np.asarray(case["joint_loc"], float)
    model, state0 = bld.finalize()

    # fp32: plain Baumgarte turns the eps32·|x| violation-evaluation noise
    # into stab/h velocity kicks (measured ≈3e-4 white jitter per substep,
    # i.e. Acc RMS ≈ √2·σ/h ≈ 1); "filtered" runs Baumgarte on a
    # bias-corrected running mean of C, keeping corrections velocity-level
    # (energy-consistent — position projection instead drifts O(h²·t)) while
    # dividing the white noise by k
    stab_mode = os.environ.get(
        "CHRONO_GOLDEN_STAB", "baumgarte" if dtype_str == "f64" else "filtered")
    # α=1/128 measured best on Revolute fp32: Vel 5.8e-5 / Acc 1.2e-2 /
    # cviol 3.8e-6 (larger windows let out-of-plane violations random-walk
    # √L·eps32·|x|; smaller ones pass more white kick noise)
    alpha = float(os.environ.get("CHRONO_GOLDEN_ALPHA", 1.0 / 128.0))
    settings = SolverSettings(solver="direct", stab_mode=stab_mode,
                              stab_alpha_min=alpha)
    h = sim_step
    record_every = int(round(out_step / sim_step))
    n_out = int(round(t_end / out_step)) + 1

    from chrono_tpu.physics.joints import joint_violation

    def _side_reaction(rows, gamma, state, side, body, point_w, sl=None):
        """(F, T) applied to ``body`` at world point, world frame.

        ``sl``: optional row slice (start, stop) to isolate one link's rows
        out of the concatenated bilateral set."""
        Jv = rows.Ja_v if side == "a" else rows.Jb_v
        Jw = rows.Ja_w if side == "a" else rows.Jb_w
        g = gamma
        if sl is not None:
            g = jnp.zeros_like(gamma).at[sl[0]:sl[1]].set(
                gamma[sl[0]:sl[1]])
        F = jnp.sum(Jv * g[:, None], axis=0)
        T_loc = jnp.sum(Jw * g[:, None], axis=0)
        T_w = Q.qrotate(state.q[body], T_loc)
        r = jnp.asarray(point_w, dt) - state.x[body]
        return F, T_w - jnp.cross(r, F)

    def _reaction(state_at_rows, gamma):
        """Per-case reaction channels: ((n_ch, 3) F, (n_ch, 3) T)."""
        rows = bilateral_rows(model, state_at_rows, jnp.asarray(0.0, dt), h,
                              settings)
        jl = jnp.asarray(joint_loc, dt)
        if kind == "tsda":
            # spring force on the ground anchor, from state (no rows)
            pa = state_at_rows.x[1]        # pendulum anchor == its CG here
            d = pa - jl
            L = jnp.linalg.norm(d) + 1e-12
            u = d / L
            Ldot = jnp.dot(state_at_rows.v[1], u)
            l0 = float(np.linalg.norm(np.asarray(case["anchor_pend"], float)
                                      - joint_loc))
            fmag = case["spring_k"] * (L - l0) + case["spring_c"] * Ldot
            F = fmag * u
            return jnp.stack([F]), jnp.stack([jnp.zeros(3, dt)])
        if kind == "rev_spherical":
            # Body1 = ground (side a) at the revolute; Body2 = pendulum
            # (side b) at the CURRENT spherical point (it moves with the
            # body — the body-local offset is fixed)
            off0 = np.asarray(case["pend_loc"], float) - np.asarray(
                case["pend_pos"], float)
            off_loc = _qrot_np(np.asarray(case["pend_quat"], float)
                               * np.array([1.0, -1, -1, -1]), off0)
            p2 = state_at_rows.x[1] + Q.qrotate(
                state_at_rows.q[1], jnp.asarray(off_loc, dt))
            F1, T1 = _side_reaction(rows, gamma, state_at_rows, "a", 0, jl)
            F2, T2 = _side_reaction(rows, gamma, state_at_rows, "b", 1, p2)
            return jnp.stack([F1, F2]), jnp.stack([T1, T2])
        if kind == "lin_actuator":
            # rows: 5 prismatic then 1 motor (bilateral_rows order);
            # reference reports the actuator reaction ON THE PLATE
            # (GetReaction2, body2 = plate)
            FP, TP = _side_reaction(rows, gamma, state_at_rows, "b", 0, jl,
                                    sl=(0, 5))
            FA, TA = _side_reaction(rows, gamma, state_at_rows, "a", 1, jl,
                                    sl=(5, 6))
            return jnp.stack([FP, -FA]), jnp.stack([TP, -TA])
        F, T = _side_reaction(rows, gamma, state_at_rows, "b", 0, jl)
        if kind == "rotspring":
            # the golden Rtorque includes the spring-damper torque about the
            # joint axis (the reference logs the whole link's reaction)
            from chrono_tpu.physics.motors import relative_angle_about_axis
            rs = model.rsda
            za = Q.qrotate(Q.qmul(state_at_rows.q[1], rs.fa_rot[0]),
                           jnp.asarray([0.0, 0.0, 1.0], dt))
            ang = relative_angle_about_axis(
                state_at_rows.x[1], state_at_rows.q[1],
                state_at_rows.x[0], state_at_rows.q[0],
                rs.fa_rot[0], rs.fb_rot[0])
            wa = Q.qrotate(state_at_rows.q[1], state_at_rows.w[1])
            wb = Q.qrotate(state_at_rows.q[0], state_at_rows.w[0])
            rate = jnp.sum(za * (wb - wa))
            tmag = rs.k[0] * (ang - rs.rest_angle[0]) + rs.c[0] * rate
            T = T - za * tmag
        return jnp.stack([F]), jnp.stack([T])

    def _violation(state):
        vals = [jnp.max(jnp.abs(joint_violation(kd, data, state.x, state.q)))
                for kd, data in model.joints.items()]
        if not vals:
            return jnp.zeros((), dt)
        return jnp.max(jnp.stack(vals))

    def one_output_block(carry, _):
        state, t, cx, cq, ss = carry

        def substep(c, __):
            s, tt, cx_, cq_, ss_ = c
            # Kahan-compensated integration: at fp32 the plain x += h v drops
            # the increment's low bits every step (up to N·eps·|x| over the
            # 5e5-step cases); the carry restores O(eps) accumulation
            s2, (cx2, cq2), ss2, info = step_euler_implicit_linearized(
                model, s, tt, h, settings, position_comp=(cx_, cq_),
                stab_state=ss_)
            return (s2, tt + h, cx2, cq2, ss2), (s2, info.joint_reactions)

        (state2, t2, cx2, cq2, ss2), (straj, gammas) = jax.lax.scan(
            substep, (state, t, cx, cq, ss), None, length=record_every)
        # acceleration over the LAST substep (Chrono scatters Dv/h as accel)
        last = jax.tree_util.tree_map(lambda a: a[-1], straj)
        prev = jax.tree_util.tree_map(
            lambda a: a[-2], straj) if record_every > 1 else state
        acc = (last.v - prev.v) / h
        aacc_loc = (last.w - prev.w) / h
        # gamma of the last substep pairs with rows built at its start state
        F, T = _reaction(prev, gammas[-1])
        return (state2, t2, cx2, cq2, ss2), (last, acc, aacc_loc, F, T,
                                             _violation(last))

    # initial accelerations: reference does a full DoAssembly before the loop;
    # approximate with the first-step Dv/h (error O(h), far below Acc tol)
    from chrono_tpu.physics.system import init_stab_state

    @jax.jit
    def run_all():
        st1, info0 = step_euler_implicit_linearized(
            model, state0, jnp.asarray(0.0, dt), h,
            settings.replace(stab_mode="baumgarte"))
        acc0 = (st1.v - state0.v) / h
        aacc0 = (st1.w - state0.w) / h
        F0, T0 = _reaction(state0, info0.joint_reactions)
        zc = jnp.zeros_like(state0.x), jnp.zeros_like(state0.q)
        ss0 = init_stab_state(model, state0, jnp.asarray(0.0, dt), h,
                              settings)
        _, outs = jax.lax.scan(
            one_output_block,
            (state0, jnp.asarray(0.0, dt)) + zc + (ss0,), None,
            length=n_out - 1)
        return (acc0, aacc0, F0, T0, _violation(state0)), outs

    (acc0, aacc0, F0, T0, viol0), \
        (traj, accs, aaccs, Fbs, Tbs, viols) = run_all()

    # prepend t=0 sample
    cat = lambda a0, a: np.concatenate([np.asarray(a0)[None], np.asarray(a)])
    xs = cat(state0.x, traj.x)[:, 1]          # pendulum is body index 1
    qs = cat(state0.q, traj.q)[:, 1]
    vs = cat(state0.v, traj.v)[:, 1]
    ws = cat(state0.w, traj.w)[:, 1]
    accs = cat(acc0, accs)[:, 1]
    aaccs_loc = cat(aacc0, aaccs)[:, 1]
    Fb = cat(F0, Fbs)
    Tb = cat(T0, Tbs)
    cviol = cat(viol0, viols)

    # angular velocity/acceleration in the PARENT (world) frame:
    # w_parent = R(q) w_local;  dw_parent = R(q) dw_local + w_parent x w_parent
    # (transport term w x Rw vanishes since w_parent || R w_local derivative
    #  needs R_dot w_local = w_parent x (R w_local) = w_p x w_p = 0)
    qj_ = jnp.asarray(qs)
    avel = np.asarray(Q.qrotate(qj_, jnp.asarray(ws)))
    aacc = np.asarray(Q.qrotate(qj_, jnp.asarray(aaccs_loc)))

    # energy bookkeeping (reference columns: transKE, rotKE, deltaPE, E-E0)
    inertia = np.asarray(case["inertia"])
    transKE = 0.5 * np.sum(vs ** 2, axis=1)
    rotKE = 0.5 * np.sum(inertia * ws ** 2, axis=1)
    deltaPE = _G * (xs[:, 2] - joint_loc[2])
    totalE = transKE + rotKE + deltaPE
    energy_drift = totalE - totalE[0]

    # --- compare against golden files ---------------------------------------
    gdir = os.path.join(GOLDEN_ROOT, case["golden_dir"])
    chan_names = {
        "rev_spherical": ["Rforce_Body1", "Rforce_Body2"],
        "lin_actuator": ["RforceP", "RforceA"],
    }.get(kind, ["Rforce"])
    sim = {
        "Pos": xs, "Vel": vs, "Acc": accs, "Quat": qs,
        "Avel": avel, "Aacc": aacc,
    }
    for ci, cn in enumerate(chan_names):
        sim[cn] = Fb[:, ci]
        sim[cn.replace("force", "torque")] = Tb[:, ci]
    norms, missing = {}, []
    for what, simdata in sim.items():
        path = os.path.join(gdir, f"{case['name']}_ADAMS_{what}.txt")
        if not os.path.exists(path):
            missing.append(what)
            continue
        ref = load_adams(path)
        ncols = simdata.shape[1]
        n = min(len(ref), len(simdata))
        # quaternion sign ambiguity: align to golden hemisphere
        sd = simdata[:n].copy()
        if what == "Quat":
            flip = np.sign(np.sum(sd * ref[:n, 1:1 + ncols], axis=1))
            flip = np.where(flip == 0, 1.0, flip)
            sd *= flip[:, None]
        norms[what] = [rms_norm(sd[:, c] - ref[:n, 1 + c])
                       for c in range(ncols)]
    return {
        "norms": norms,
        "energy_rms": rms_norm(energy_drift),
        "constraint_max": float(np.max(cviol)),
        "missing": missing,
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f64", choices=["f32", "f64"])
    ap.add_argument("--cases", default="")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)

    wanted = [c for c in args.cases.split(",") if c] or list(CASES)
    out = {}
    for name in wanted:
        out[name] = run_case(CASES[name], args.dtype)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
