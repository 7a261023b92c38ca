"""ANCF beam elements vs the reference's recorded golden data.

Validates mass matrix, generalized gravity force, internal force vectors and
K/R Jacobians of the fully parameterized ANCF beams against
/root/reference/data/testing/fea/UT_ANCFBeam_{3243,3333}_*.txt, at the exact
element states the reference unit tests use
(utest_FEA_ANCFbeam_3243_Formulation.cpp / _3333_Formulation.cpp) and with
the same tolerances (fp32-adjusted where the reference assumes double).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from chrono_tpu.fea import ancf

REF = "/root/reference/data/testing/fea"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference golden data not available")


def load(name, rows, cols):
    data = np.loadtxt(os.path.join(REF, name))
    return data.reshape(rows, cols)


def _beam_3243():
    L, thick, width = 1.0, 0.1, 0.1
    rho, E, nu = 7850.0, 210e9, 0.3
    k = 10 * (1 + nu) / (12 + 11 * nu)
    D0, Dv = ancf.beam_material_D0_Dv(E, nu, k1=k, k2=k)
    e0 = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
        [L, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
    ], float)
    el = ancf.build_ancf_element("beam_3243", e0, (L, thick, width),
                                 rho, D0, Dv)
    return el, e0


def _beam_3333():
    L, thick, width = 1.0, 0.1, 0.1
    rho, E, nu = 7850.0, 210e9, 0.3
    k = 10 * (1 + nu) / (12 + 11 * nu)
    D0, Dv = ancf.beam_material_D0_Dv(E, nu, k1=k, k2=k)
    e0 = np.array([
        [0, 0, 0], [0, 1, 0], [0, 0, 1],          # node A (x=0)
        [L, 0, 0], [0, 1, 0], [0, 0, 1],          # node B (x=L)
        [L / 2, 0, 0], [0, 1, 0], [0, 0, 1],      # node C (x=L/2)
    ], float)
    el = ancf.build_ancf_element("beam_3333", e0, (L, thick, width),
                                 rho, D0, Dv)
    return el, e0


def _shell_3443():
    L, W, t = 1.0, 1.0, 0.01
    rho, E, nu = 7850.0, 210e9, 0.3
    D = ancf.shell_material_D(E, nu)
    e0 = []
    for px, py in [(0, 0), (L, 0), (L, W), (0, W)]:
        e0 += [[px, py, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    e0 = np.asarray(e0, float)
    el = ancf.build_ancf_element("shell_3443", e0, (L, W, t), rho, D)
    return el, e0


def _shell_3833():
    L, W, t = 1.0, 1.0, 0.01
    rho, E, nu = 7850.0, 210e9, 0.3
    D = ancf.shell_material_D(E, nu)
    e0 = []
    for px, py in [(0, 0), (L, 0), (L, W), (0, W),
                   (L / 2, 0), (L, W / 2), (L / 2, W), (0, W / 2)]:
        e0 += [[px, py, 0], [0, 0, 1], [0, 0, 0]]
    e0 = np.asarray(e0, float)
    el = ancf.build_ancf_element("shell_3833", e0, (L, W, t), rho, D)
    return el, e0


def _hexa_3843():
    L = W = H = 1.0
    rho, E, nu = 7850.0, 210e9, 0.3
    D = ancf.hexa_material_D(E, nu)
    e0 = []
    for px, py, pz in [(0, 0, 0), (L, 0, 0), (L, W, 0), (0, W, 0),
                       (0, 0, H), (L, 0, H), (L, W, H), (0, W, H)]:
        e0 += [[px, py, pz], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    e0 = np.asarray(e0, float)
    el = ancf.build_ancf_element("hexa_3843", e0, (L, W, H), rho, D)
    return el, e0


CASES = {
    # family: (builder, NSF, golden prefix, index of the node-position row
    #          displaced/velocitized by the reference test)
    "beam_3243": (_beam_3243, 8, "UT_ANCFBeam_3243", 4),    # node B
    "beam_3333": (_beam_3333, 9, "UT_ANCFBeam_3333", 6),    # node C
    "shell_3443": (_shell_3443, 16, "UT_ANCFShell_3443", 4),  # node B
    "shell_3833": (_shell_3833, 24, "UT_ANCFShell_3833", 3),  # node B
    "hexa_3843": (_hexa_3843, 32, "UT_ANCFBrick_3843", 4),  # node B
}


@pytest.mark.parametrize("family", list(CASES))
def test_mass_matrix(family):
    build, nsf, prefix, _ = CASES[family]
    el, _ = build()
    want = load(f"{prefix}_MassMatrix.txt", nsf, nsf)
    np.testing.assert_allclose(np.asarray(el.mass), want,
                               atol=1e-3 * max(1.0, np.abs(want).max() * 1e-3),
                               rtol=2e-5)


@pytest.mark.parametrize("family", list(CASES))
def test_gravity_force(family):
    build, nsf, prefix, _ = CASES[family]
    el, _ = build()
    want = load(f"{prefix}_Grav.txt", 3 * nsf, 1).reshape(nsf, 3)
    got = np.asarray(ancf.element_gravity_force(el, (0, 0, -9.80665)))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=2e-5)


@pytest.mark.parametrize("family", list(CASES))
def test_internal_force_no_disp_is_zero(family):
    build, nsf, prefix, _ = CASES[family]
    el, e0 = build()
    fi = np.asarray(ancf.element_internal_force(el, jnp.asarray(e0, jnp.float32)))
    # reference tolerance 1e-3 N in double; the fp32 delta form keeps the
    # residual at roundoff of the *delta* (zero) path
    assert np.abs(fi).max() < 1e-2


@pytest.mark.parametrize("family", list(CASES))
def test_internal_force_small_disp(family):
    build, nsf, prefix, node_row = CASES[family]
    el, e0 = build()
    e = e0.copy()
    e[node_row, 2] = 0.001                      # reference: z ← 0.001
    fi = np.asarray(ancf.element_internal_force(el, jnp.asarray(e, jnp.float32)))
    want = load(f"{prefix}_IntFrcSmallDispNoVel.txt", 3 * nsf, 1).reshape(nsf, 3)
    # reference acceptance: max abs error ≤ 1% of max |golden|
    assert np.abs(fi - want).max() <= 0.01 * np.abs(want).max()


@pytest.mark.parametrize("family", list(CASES))
def test_internal_force_small_vel_damping(family):
    build, nsf, prefix, node_row = CASES[family]
    el, e0 = build()
    el = el.replace(alpha=jnp.asarray(0.01, jnp.float32))
    edot = np.zeros_like(e0)
    edot[node_row, 2] = 0.001                   # reference: zdot ← 0.001
    fi = np.asarray(ancf.element_internal_force(
        el, jnp.asarray(e0, jnp.float32), jnp.asarray(edot, jnp.float32)))
    want = load(f"{prefix}_IntFrcNoDispSmallVel.txt", 3 * nsf, 1).reshape(nsf, 3)
    assert np.abs(fi - want).max() <= 0.01 * np.abs(want).max()


def _check_jacobian(got, want, rel_tol=0.0033):
    """The reference's mixed small-term/percent check
    (utest_FEA_ANCFbeam_3243_Formulation.cpp JacobianXXXCheck): entries below
    1e-4·max|want| only need absolute agreement; the rest relative."""
    small = 1e-4 * np.abs(want).max()
    mask = np.abs(want) >= small
    rel = np.abs(got - want)[mask] / np.abs(want)[mask]
    abs_err = np.abs(got - want)[~mask]
    assert rel.max() <= rel_tol, f"max rel err {rel.max():.2e}"
    assert abs_err.max() <= 10 * small


@pytest.mark.parametrize("family", list(CASES))
@pytest.mark.parametrize("state", ["NoDispNoVel", "SmallDispNoVel"])
def test_jacobian_no_damping(family, state):
    build, nsf, prefix, node_row = CASES[family]
    el, e0 = build()
    e = e0.copy()
    if state == "SmallDispNoVel":
        e[node_row, 2] = 0.001
    K, _ = ancf.element_jacobians(el, jnp.asarray(e, jnp.float32),
                                  jnp.zeros((nsf, 3), jnp.float32))
    want = load(f"{prefix}_Jac{state}NoDamping.txt", 3 * nsf, 3 * nsf)
    _check_jacobian(np.asarray(K), want)


@pytest.mark.parametrize("family", list(CASES))
@pytest.mark.parametrize("state", ["NoDispNoVel", "SmallDispNoVel",
                                   "NoDispSmallVel"])
def test_jacobian_with_damping(family, state):
    build, nsf, prefix, node_row = CASES[family]
    el, e0 = build()
    el = el.replace(alpha=jnp.asarray(0.01, jnp.float32))
    e = e0.copy()
    edot = np.zeros_like(e0)
    if state == "SmallDispNoVel":
        e[node_row, 2] = 0.001
    if state == "NoDispSmallVel":
        edot[node_row, 2] = 0.001
    K, R = ancf.element_jacobians(el, jnp.asarray(e, jnp.float32),
                                  jnp.asarray(edot, jnp.float32))
    both = load(f"{prefix}_Jac{state}WithDamping.txt", 6 * nsf, 3 * nsf)
    _check_jacobian(np.asarray(K), both[:3 * nsf])
    _check_jacobian(np.asarray(R), both[3 * nsf:])


def test_cantilever_tip_load_small_displacement():
    """Static tip-load check vs Euler–Bernoulli theory (reference
    CantileverTipLoadCheck: 20-element Princeton-beam cantilever, tip force
    in z, 2% tolerance — one element alone over-stiffens ~24% from Poisson
    locking, exactly as in the reference)."""
    import jax

    n_el = 20
    L = 20 * 0.0254
    w = 0.5 * 0.0254                     # square cross section
    rho, E_mod, nu = 2810.0, 71.7e9, 0.33
    k = 10 * (1 + nu) / (12 + 11 * nu)
    D0, Dv = ancf.beam_material_D0_Dv(E_mod, nu, k1=k, k2=k)

    dx = L / n_el
    # coordinate cloud: 4 rows per node (pos, d1, d2, d3)
    coords0 = []
    for i in range(n_el + 1):
        coords0 += [[dx * i, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    coords0 = np.asarray(coords0, float)
    conn = np.asarray([[4 * i, 4 * i + 1, 4 * i + 2, 4 * i + 3,
                        4 * i + 4, 4 * i + 5, 4 * i + 6, 4 * i + 7]
                       for i in range(n_el)], np.int32)
    fixed = np.zeros((coords0.shape[0],), bool)
    fixed[:4] = True                     # node 0 fully fixed
    mesh = ancf.build_ancf_mesh("beam_3243", coords0, conn, (dx, w, w),
                                rho, D0, Dv, fixed=fixed)

    P = -1.0                             # tip force in z [N]
    f_ext = np.zeros_like(coords0, dtype=np.float32)
    f_ext[4 * n_el, 2] = P
    f_ext = jnp.asarray(f_ext)

    free = ~np.asarray(fixed)[:, None] & np.ones((1, 3), bool)
    free_j = jnp.asarray(free)
    c0 = jnp.asarray(coords0, jnp.float32)

    def residual(c):
        full = jnp.where(free_j, c, c0)
        return (ancf.mesh_internal_forces(mesh, full) + f_ext) * free_j

    c = c0
    nd = coords0.shape[0] * 3
    mask = free_j.reshape(-1)
    eye = jnp.eye(nd, dtype=jnp.float32)
    for _ in range(6):
        r = residual(c)
        J = jax.jacfwd(lambda cf: residual(cf).reshape(-1))(c).reshape(nd, nd)
        J = jnp.where(jnp.outer(mask, mask), J,
                      eye * jnp.where(mask, 0, 1)[:, None])
        dc = jnp.linalg.solve(J, -r.reshape(-1))
        c = c + dc.reshape(-1, 3) * free_j

    tip_z = float(c[4 * n_el, 2])
    I = w ** 4 / 12
    analytic = P * L ** 3 / (3 * E_mod * I)
    assert abs(tip_z - analytic) <= 0.02 * abs(analytic), (tip_z, analytic)
