"""Tests for the NSC/DVI pencil-lattice stepper (BASELINE config #2 engine).

Physics fixtures in the spirit of the reference's NSC unit tests
(utest_SMC/utest_CH contact tests): rest on plane, stack equilibrium,
momentum conservation, friction-cone behavior — plus cross-backend parity
(XLA dense rolls vs the Pallas kernels in interpret mode) and the
duplicated-multiplier bitwise-symmetry invariant.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.solver.nsc_pencil import (
    NSCPencilParams, make_nsc_pencil_advance, dense_sweep_g, dense_sweep_u,
    APGDState,
)
from chrono_tpu.dem.cell_dense import to_cells

R = 0.05


def _grid(n=6, cell_mult=2.1):
    return GridSpec(origin=(0.0, 0.0, 0.0), cell_size=cell_mult * R,
                    dims=(n, n, n))


FLOOR = (("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.4),)

# one shared stepping config for the plain-floor physics tests — each
# distinct (params, grid, walls, backend) is a separate XLA compile, and
# compiles dominate this file's runtime on one CPU core
_P_STD = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=50,
                         envelope=0.002 * R)
_ADV_CACHE = {}


def _adv_std():
    if "std" not in _ADV_CACHE:
        _ADV_CACHE["std"] = make_nsc_pencil_advance(_P_STD, _grid(4), FLOOR,
                                                    backend="xla")
    return _ADV_CACHE["std"]


def test_sphere_rest_on_plane():
    adv = _adv_std()
    pos = jnp.asarray([[0.2, 0.2, R]])
    vel = jnp.zeros((1, 3))
    om = jnp.zeros((1, 3))
    pos, vel, om, ovf = adv(pos, vel, om, 40)
    assert int(ovf) == 0
    # stays on the floor: small residual velocity, penetration < 5% R
    assert abs(float(vel[0, 2])) < 0.02
    assert float(pos[0, 2]) > 0.95 * R


def test_two_sphere_stack_equilibrium():
    adv = _adv_std()
    pos = jnp.asarray([[0.2, 0.2, R], [0.2, 0.2, 3.0 * R]])
    vel = jnp.zeros((2, 3))
    om = jnp.zeros((2, 3))
    pos, vel, om, ovf = adv(pos, vel, om, 60)
    assert int(ovf) == 0
    assert np.all(np.abs(np.asarray(vel)) < 0.05)
    # stack preserved (top sphere supported by bottom)
    assert float(pos[1, 2] - pos[0, 2]) > 1.8 * R
    assert float(pos[0, 2]) > 0.9 * R


def test_head_on_momentum_conservation():
    # no gravity, no walls: DVI contact conserves linear momentum exactly
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, gravity=(0.0, 0.0, 0.0),
                        dt=1e-3, n_iter=40, envelope=0.1 * R)
    adv = make_nsc_pencil_advance(p, _grid(5), (), backend="xla")
    pos = jnp.asarray([[0.2, 0.25, 0.25], [0.2 + 2.05 * R, 0.25, 0.25]])
    vel = jnp.asarray([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    om = jnp.zeros((2, 3))
    ptot0 = jnp.sum(vel, axis=0) * p.mass
    for _ in range(3):
        pos, vel, om, _ = adv(pos, vel, om, 10)
    ptot = jnp.sum(vel, axis=0) * p.mass
    np.testing.assert_allclose(np.asarray(ptot), np.asarray(ptot0),
                               atol=1e-5)
    # inelastic normal impact (DVI, zero restitution): relative normal
    # velocity killed up to the Baumgarte penetration-recovery push-out
    # (the reference's max_penetration_recovery_speed artifact,
    # ChSystem.cpp:1626 — separation ≤ stab_factor·pen/h)
    assert abs(float(vel[1, 0] - vel[0, 0])) < 0.15


def test_friction_slows_slider():
    # sphere sliding on the floor decelerates at ~ mu g while slipping
    adv = _adv_std()
    pos = jnp.asarray([[0.12, 0.2, R * 0.999]])
    vel = jnp.asarray([[1.0, 0.0, 0.0]])
    om = jnp.zeros((1, 3))
    n = 100  # travels ≤ 0.1 m, stays inside the 0.42 m box
    pos, vel, om, _ = adv(pos, vel, om, n)
    v1 = float(vel[0, 0])
    # friction transfers slip into rolling: terminal state rolls at 5/7 v0
    # (sphere on plane, sliding→rolling transition), never accelerates
    assert v1 < 1.0
    assert v1 > 0.4
    # rolling direction consistent: ω_y > 0 for +x motion
    assert float(om[0, 1]) > 0.0

    # frictionless: keeps sliding at v0
    p0 = NSCPencilParams(radius=R, mass=0.5, mu=0.0, dt=1e-3, n_iter=40,
                         envelope=0.002 * R)
    adv0 = make_nsc_pencil_advance(p0, _grid(4), (
        ("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.0),),
        backend="xla")
    pos = jnp.asarray([[0.12, 0.2, R * 0.999]])
    vel = jnp.asarray([[1.0, 0.0, 0.0]])
    om = jnp.zeros((1, 3))
    pos, vel, om, _ = adv0(pos, vel, om, n)
    np.testing.assert_allclose(float(vel[0, 0]), 1.0, rtol=2e-3)


def test_backend_parity_pallas_interpret():
    # identical few-step trajectories from the dense-roll and Pallas paths
    rng = np.random.default_rng(3)
    n = 14
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=10,
                        envelope=0.002 * R)
    grid = _grid(5)
    pos0 = jnp.asarray(rng.uniform(0.12, 0.4, (n, 3)))
    vel0 = jnp.asarray(rng.normal(0.0, 0.2, (n, 3)))
    om0 = jnp.zeros((n, 3))
    adv_x = make_nsc_pencil_advance(p, grid, FLOOR, backend="xla")
    adv_p = make_nsc_pencil_advance(p, grid, FLOOR, backend="pallas",
                                    interpret=True)
    px, vx, ox, ovx = adv_x(pos0, vel0, om0, 2)
    pp, vp, op_, ovp = adv_p(pos0, vel0, om0, 2)
    assert int(ovx) == 0 and int(ovp) == 0
    np.testing.assert_allclose(np.asarray(px), np.asarray(pp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vp), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op_), atol=2e-3)


def test_duplicated_multiplier_symmetry():
    """γ stored from either side of a pair stays consistent: mirrored slot
    with (n, u) equal and v negated."""
    rng = np.random.default_rng(5)
    n = 16
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=12,
                        envelope=0.002 * R)
    grid = _grid(5)
    pos = jnp.asarray(rng.uniform(0.12, 0.4, (n, 3)))
    vel = jnp.asarray(rng.normal(0.0, 0.3, (n, 3)))
    om = jnp.zeros((n, 3))
    field = to_cells(grid, 8, pos, vel, om)

    C = 8

    @jax.jit
    def one_iter(st):
        uv, uw = dense_sweep_u(p, grid, FLOOR, field.pos, field.vel,
                               field.omega, field.mask, st.gam, st.gprev,
                               st.wgam, st.wgprev, st.beta)
        gnew, wnew = dense_sweep_g(p, grid, FLOOR, field.pos, uv, uw,
                                   field.mask, st.gam, st.gprev, st.wgam,
                                   st.wgprev, st.beta)
        return APGDState(gam=gnew, gprev=st.gam, wgam=wnew, wgprev=st.wgam,
                         beta=jnp.asarray(0.3), theta=st.theta)

    st = APGDState(
        gam=jnp.zeros(grid.dims + (27, 3, C, C), jnp.float32),
        gprev=jnp.zeros(grid.dims + (27, 3, C, C), jnp.float32),
        wgam=jnp.zeros(grid.dims + (C, 1, 3), jnp.float32),
        wgprev=jnp.zeros(grid.dims + (C, 1, 3), jnp.float32),
        beta=jnp.zeros(()), theta=jnp.ones(()))
    for _ in range(p.n_iter):
        st = one_iter(st)

    gam = np.asarray(st.gam)
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    nx, ny, nz = grid.dims
    checked = 0
    for k, (dx, dy, dz) in enumerate(offs):
        km = offs.index((-dx, -dy, -dz))
        for ix in range(max(0, -dx), min(nx, nx - dx)):
            for iy in range(max(0, -dy), min(ny, ny - dy)):
                for iz in range(max(0, -dz), min(nz, nz - dz)):
                    a = gam[ix, iy, iz, k]            # (3, C, C)
                    b = gam[ix + dx, iy + dy, iz + dz, km]
                    if not np.any(a):
                        continue
                    np.testing.assert_array_equal(a[0], b[0].T)
                    np.testing.assert_array_equal(a[1], b[1].T)
                    np.testing.assert_array_equal(a[2], -b[2].T)
                    checked += 1
    assert checked > 0


def test_residual_history_converges():
    """track_residual returns the per-iteration ‖Δγ‖ series (the reference's
    ChIterativeSolverVI Δλ history role) and it decays over the solve."""
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.4, dt=1e-3, n_iter=30,
                        envelope=0.002 * R, track_residual=True,
                        restart_every=12)
    adv = make_nsc_pencil_advance(p, _grid(4), FLOOR, backend="xla")
    pos = jnp.asarray([[0.2, 0.2, R], [0.2, 0.2, 3.0 * R],
                       [0.2 + 2.02 * R, 0.2, R]])
    out = adv(pos, jnp.zeros((3, 3)), jnp.zeros((3, 3)), 8)
    pos2, vel2, om2, ovf, dgam = out
    dgam = np.asarray(dgam)
    assert dgam.shape == (30,)
    assert np.isfinite(dgam).all()
    # stagnation metric decays by the end of the solve
    assert dgam[-1] < 0.5 * (dgam[1:6].max() + 1e-12)


def test_rotating_drum_entrains():
    # a spinning drum (axis y) drags particles up the wall via friction
    p = NSCPencilParams(radius=R, mass=0.2, mu=0.5, dt=2e-3, n_iter=30,
                        envelope=0.002 * R)
    grid = GridSpec(origin=(0.0, 0.0, 0.0), cell_size=2.1 * R,
                    dims=(8, 4, 8))
    cx, cz = 4 * 2.1 * R, 4 * 2.1 * R
    drum = (("cyl", 1, (cx, 0.0, cz), 3.5 * 2.1 * R, 3.0, 0.5),
            ("plane", (0.0, 1.0, 0.0), 0.0, (0.0, 0.0, 0.0), 0.2),
            ("plane", (0.0, -1.0, 0.0), -4 * 2.1 * R, (0.0, 0.0, 0.0), 0.2))
    rng = np.random.default_rng(7)
    n = 30
    pos = np.stack([rng.uniform(cx - 0.2, cx + 0.2, n),
                    rng.uniform(0.1, 0.3, n),
                    rng.uniform(0.12, 0.3, n)], axis=1)
    adv = make_nsc_pencil_advance(p, grid, drum, backend="xla")
    pos, vel, om, ovf = adv(jnp.asarray(pos), jnp.zeros((n, 3)),
                            jnp.zeros((n, 3)), 45)
    assert int(ovf) == 0
    # wall friction entrains the touching particles, and none escaped
    sp = np.linalg.norm(np.asarray(vel), axis=1)
    assert float(np.max(sp)) > 0.1
    rad = np.sqrt((np.asarray(pos)[:, 0] - cx) ** 2
                  + (np.asarray(pos)[:, 2] - cz) ** 2)
    assert float(rad.max()) < 3.5 * 2.1 * R


def test_backend_parity_partner_interpret():
    """Partner-lattice kernels (v3) reproduce the dense-roll trajectory."""
    rng = np.random.default_rng(7)
    n = 14
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=6,
                        envelope=0.002 * R)
    grid = _grid(4)
    pos0 = jnp.asarray(rng.uniform(0.12, 0.36, (n, 3)))
    vel0 = jnp.asarray(rng.normal(0.0, 0.2, (n, 3)))
    om0 = jnp.zeros((n, 3))
    # P=6 keeps the interpret-mode op count testable on one CPU core; the
    # kernel math is P-independent
    adv_x = make_nsc_pencil_advance(p, grid, FLOOR, backend="xla")
    adv_p = make_nsc_pencil_advance(p, grid, FLOOR, backend="partner",
                                    interpret=True, partners=6)
    px, vx, ox, ovx = adv_x(pos0, vel0, om0, 1)
    pp, vp, op_, ovp = adv_p(pos0, vel0, om0, 1)
    assert int(ovx) == 0 and int(ovp) == 0
    np.testing.assert_allclose(np.asarray(px), np.asarray(pp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vp), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op_), atol=2e-3)


def test_partner_detection_symmetry_and_budget():
    """Every detected pair appears once on EACH side with mirrored codes;
    overflow reports dropped partners."""
    from chrono_tpu.ops.pallas.nsc_partner_kernel import detect_partners

    rng = np.random.default_rng(11)
    n = 24
    p = NSCPencilParams(radius=R, mass=0.5, envelope=0.05 * R)
    grid = _grid(5)
    pos = jnp.asarray(rng.uniform(0.12, 0.42, (n, 3)))
    field = to_cells(grid, 8, pos, jnp.zeros((n, 3)), jnp.zeros((n, 3)))
    C, P = 8, 12
    codes, over = detect_partners(p.radius, p.envelope, grid, field.pos,
                                  field.mask, P)
    assert int(over) == 0
    codes = np.asarray(codes)
    nx, ny, nz = grid.dims
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    pairs = 0
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                for a in range(C):
                    for code in codes[ix, iy, iz, a]:
                        if code < 0:
                            continue
                        k27, b = int(code) // C, int(code) % C
                        dx, dy, dz = offs[k27]
                        jx, jy, jz = ix + dx, iy + dy, iz + dz
                        mirror = offs.index((-dx, -dy, -dz)) * C + a
                        assert mirror in codes[jx, jy, jz, b].astype(int), (
                            (ix, iy, iz, a), code)
                        pairs += 1
    assert pairs > 0 and pairs % 2 == 0


def test_backend_parity_half_interpret():
    """Single-sided half-stencil kernels (v4: each pair stored and updated
    once, u-sweep reactions through the rolling window) reproduce the
    dense-roll trajectory."""
    rng = np.random.default_rng(7)
    n = 14
    p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=6,
                        envelope=0.002 * R)
    grid = _grid(4)
    pos0 = jnp.asarray(rng.uniform(0.12, 0.36, (n, 3)))
    vel0 = jnp.asarray(rng.normal(0.0, 0.2, (n, 3)))
    om0 = jnp.zeros((n, 3))
    adv_x = make_nsc_pencil_advance(p, grid, FLOOR, backend="xla")
    adv_h = make_nsc_pencil_advance(p, grid, FLOOR, backend="half",
                                    interpret=True, partners=6)
    px, vx, ox, ovx = adv_x(pos0, vel0, om0, 1)
    ph, vh, oh, ovh = adv_h(pos0, vel0, om0, 1)
    assert int(ovx) == 0 and int(ovh) == 0
    np.testing.assert_allclose(np.asarray(px), np.asarray(ph), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vh), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(oh), atol=2e-3)


def test_half_detection_single_sided():
    """detect_half: every geometric pair appears exactly ONCE across both
    sides, always on the forward-stencil owner."""
    from chrono_tpu.ops.pallas.nsc_half_kernel import (
        detect_half, _class_offset, N_CLASS,
    )
    from chrono_tpu.ops.pallas.nsc_partner_kernel import detect_partners

    rng = np.random.default_rng(11)
    n = 24
    p = NSCPencilParams(radius=R, mass=0.5, envelope=0.05 * R)
    grid = _grid(5)
    pos = jnp.asarray(rng.uniform(0.12, 0.42, (n, 3)))
    field = to_cells(grid, 8, pos, jnp.zeros((n, 3)), jnp.zeros((n, 3)))
    C, P = 8, 12
    codes_h, over_h = detect_half(p.radius, p.envelope, grid, field.pos,
                                  field.mask, P)
    codes_d, over_d = detect_partners(p.radius, p.envelope, grid, field.pos,
                                      field.mask, P)
    assert int(over_h) == 0 and int(over_d) == 0
    n_half = int(np.sum(np.asarray(codes_h) >= 0))
    n_dup = int(np.sum(np.asarray(codes_d) >= 0))
    assert n_dup == 2 * n_half and n_half > 0


class TestRotatingBoxBlade:
    """Rotating box obstacle (the reference mixer's blade,
    btest_CH_mixerNSC.cpp:100-108) as a traced-pose wall: parity across
    backends + the blade actually stirs."""

    WALLS = (("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.4),
             ("rotbox", 2, (0.3, 0.3, 0.1), (0.25, 0.04, 0.1),
              np.pi / 3, 0.4))

    def test_blade_parity_half_interpret(self):
        rng = np.random.default_rng(11)
        n = 14
        p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=10,
                            envelope=0.002 * R)
        grid = _grid(5)
        pos0 = jnp.asarray(rng.uniform(0.12, 0.45, (n, 3)))
        vel0 = jnp.asarray(rng.normal(0.0, 0.2, (n, 3)))
        om0 = jnp.zeros((n, 3))
        adv_x = make_nsc_pencil_advance(p, grid, self.WALLS, backend="xla")
        adv_h = make_nsc_pencil_advance(p, grid, self.WALLS, backend="half",
                                        interpret=True)
        theta0 = jnp.asarray([0.3])
        px, vx, ox, ovx = adv_x(pos0, vel0, om0, 2, theta0=theta0)
        ph, vh, oh, ovh = adv_h(pos0, vel0, om0, 2, theta0=theta0)
        assert int(ovx) == 0 and int(ovh) == 0
        np.testing.assert_allclose(np.asarray(px), np.asarray(ph),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(vx), np.asarray(vh),
                                   atol=2e-4)

    def test_blade_stirs_and_reacts(self):
        """A sphere resting in the blade's path gets pushed tangentially,
        and the blade reaction torque opposes its spin."""
        p = NSCPencilParams(radius=R, mass=0.5, mu=0.3, dt=1e-3, n_iter=40,
                            envelope=0.002 * R,
                            track_wall_reactions=True)
        grid = _grid(6)
        # blade spins about z through (0.3, 0.3); sphere sits ahead of the
        # +u face at theta=0 (blade along x), i.e. at y slightly > 0.3
        walls = (("plane", (0.0, 0.0, 1.0), 0.0, (0.0, 0.0, 0.0), 0.4),
                 ("rotbox", 2, (0.3, 0.3, 0.1), (0.25, 0.03, 0.1),
                  np.pi / 2, 0.4))
        pos = jnp.asarray([[0.45, 0.3 + 0.03 + R + 0.001, R]])
        vel = jnp.zeros((1, 3))
        om = jnp.zeros((1, 3))
        adv = make_nsc_pencil_advance(p, grid, walls, backend="xla")
        pos2, vel2, om2, ovf, (wf, wt) = adv(pos, vel, om, 60)
        assert int(ovf) == 0
        # blade rotates counterclockwise (+z); at x>c the +v face moves +y:
        # the sphere must be pushed in +y
        assert float(vel2[0, 1]) > 0.05, float(vel2[0, 1])
        # reaction torque on the blade about +z is negative (sphere resists)
        assert float(wt[1, 2]) < -1e-4, float(wt[1, 2])

    def test_rotbox_geometry(self):
        from chrono_tpu.ops.pallas.nsc_pencil_kernel import wall_geometry
        wall = ("rotbox", 2, (0.0, 0.0, 0.0), (0.5, 0.1, 0.2), 1.0, 0.3)
        px = jnp.asarray([0.0, 0.0, 0.7, 0.0])
        py = jnp.asarray([0.3, -0.3, 0.0, 0.05])
        pz = jnp.asarray([0.0, 0.0, 0.0, 0.0])
        # theta = 0
        cs = (jnp.asarray(1.0), jnp.asarray(0.0))
        (nx, ny, nz), gap, (sx, sy, sz) = wall_geometry(
            wall, px, py, pz, 0.05, cs)
        np.testing.assert_allclose(gap[0], 0.3 - 0.1 - 0.05, atol=1e-6)
        np.testing.assert_allclose(ny[0], -1.0, atol=1e-6)  # self→wall: −y
        np.testing.assert_allclose(ny[1], 1.0, atol=1e-6)
        np.testing.assert_allclose(gap[2], 0.2 - 0.05, atol=1e-6)
        np.testing.assert_allclose(nx[2], -1.0, atol=1e-6)
        # inside: least-penetration face is ±y
        np.testing.assert_allclose(gap[3], -0.05 - 0.05, atol=1e-6)
        np.testing.assert_allclose(ny[3], -1.0, atol=1e-6)
        # surface velocity = ω ẑ × p
        np.testing.assert_allclose(sx[0], -0.3, atol=1e-6)
        # theta = 90°: the long axis lies along y — the point at y=0.3 is
        # now deep inside; nearest face is the thin ±v face (|0−0.1|)
        cs = (jnp.asarray(0.0), jnp.asarray(1.0))
        _, gap90, _ = wall_geometry(wall, px, py, pz, 0.05, cs)
        np.testing.assert_allclose(gap90[0], -0.1 - 0.05, atol=1e-6)
        # ... and the point at x=0.7 is now outside the thin face
        np.testing.assert_allclose(gap90[2], 0.7 - 0.1 - 0.05, atol=1e-6)
