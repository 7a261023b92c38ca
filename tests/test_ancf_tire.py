"""Full layered ANCF shell tire (vehicle/fea_tire.py build_ancf_tire).

Counterpart checks for the reference's deformable tire
(/root/reference/src/chrono_vehicle/wheeled_vehicle/tire/ChDeformableTire.h,
ChANCFTire.cpp CreateMeshANCF4): spec parsing from the reference's own JSON
deck, layered-element consistency, inflation statics, and ground
load-deflection through the node-cloud contact surface.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chrono_tpu.fea import ancf
from chrono_tpu.fea.contact import NodeCloudContact
from chrono_tpu.vehicle import fea_tire as ft

SPEC_JSON = "/root/reference/data/vehicle/hmmwv/tire/HMMWV_ANCF4Tire.json"


def test_layered_shell_matches_single_layer():
    """A homogeneous 3-layer stack must reproduce the single-layer 3443
    element exactly (same GQ family, same total thickness)."""
    L, W, t = 1.0, 1.0, 0.01
    rho, E, nu = 7850.0, 210e9, 0.3
    D = ancf.shell_material_D(E, nu)
    e0 = []
    for px, py in [(0, 0), (L, 0), (L, W), (0, W)]:
        e0 += [[px, py, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    e0 = np.asarray(e0, float)
    el1 = ancf.build_ancf_element("shell_3443", e0, (L, W, t), rho, D)
    el3 = ancf.build_ancf_shell_layered("shell_3443", e0, (L, W, t),
                                        [(t / 3, rho, D)] * 3)
    e = jnp.asarray(e0, jnp.float32)
    de = e.at[4, 2].add(0.01).at[5, 0].add(0.005)
    f1 = ancf.element_internal_force(el1, de)
    f3 = ancf.element_internal_force(el3, de)
    assert float(jnp.max(jnp.abs(f1 - f3))) < 1e-5 * float(
        jnp.max(jnp.abs(f1)))
    m1 = np.asarray(el1.mass)
    np.testing.assert_allclose(m1, np.asarray(el3.mass), rtol=1e-6,
                               atol=1e-12 * np.abs(m1).max())


def test_layered_ply_angles_change_stiffness():
    """An orthotropic ply rotated 90 deg must swap the in-plane stiffness
    axes — the layered build has to honor per-layer fiber angles."""
    L, W, t = 1.0, 1.0, 0.01
    rho = 1000.0
    E = np.array([180e9, 47.4e6, 47.4e6])
    nu = np.array([0.45, 0.45, 0.45])
    e0 = []
    for px, py in [(0, 0), (L, 0), (L, W), (0, W)]:
        e0 += [[px, py, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    e0 = np.asarray(e0, float)
    D0 = ancf.shell_material_D(E, nu, theta=0.0)
    D90 = ancf.shell_material_D(E, nu, theta=np.pi / 2)
    el0 = ancf.build_ancf_shell_layered("shell_3443", e0, (L, W, t),
                                        [(t, rho, D0)])
    el90 = ancf.build_ancf_shell_layered("shell_3443", e0, (L, W, t),
                                         [(t, rho, D90)])
    e = jnp.asarray(e0, jnp.float32)
    de = e.at[4, 0].add(0.01)          # stretch along x
    f0 = ancf.element_internal_force(el0, de)
    f90 = ancf.element_internal_force(el90, de)
    # fibers along x resist the x-stretch far harder than fibers along y
    # (nu=0.45 Poisson coupling keeps the 90-deg response non-trivial)
    assert float(jnp.max(jnp.abs(f0))) > 2.5 * float(jnp.max(jnp.abs(f90)))
    assert D0[0, 0] > 100.0 * D90[0, 0]


def test_spec_parses_reference_deck():
    spec = ft.load_ancf_tire_spec(SPEC_JSON)
    assert spec.tire_radius == pytest.approx(0.4673)
    assert spec.rim_radius == pytest.approx(0.2683)
    assert len(spec.materials) == 3
    assert [len(s[0]) for s in spec.sections] == [3, 3, 4]   # plies/section
    assert spec.pressure == pytest.approx(2e5)
    assert spec.profile.shape[1] == 3


@pytest.fixture(scope="module")
def small_tire():
    spec = ft.load_ancf_tire_spec(SPEC_JSON)
    return spec, ft.build_ancf_tire(spec, div_circumference=8, reduction=4)


def _crown_radius(tire, coords):
    nc, nwp = tire.grid
    P = coords[tire.pos_rows].reshape(nc, nwp, 3)
    r = jnp.sqrt((P[..., 0] - tire.center[0]) ** 2
                 + (P[..., 2] - tire.center[2]) ** 2)
    return float(r[:, nwp // 2].mean())


def _run(step, c, v, n):
    run = jax.jit(lambda c, v: jax.lax.scan(
        lambda cv, _: (step(*cv), None), (c, v), None, length=n)[0])
    return run(c, v)


def test_tire_reference_state_is_equilibrium(small_tire):
    """The as-meshed surface of revolution must carry ~zero internal force
    (F0/E0 residuals absorb the curved reference exactly)."""
    _, tire = small_tire
    f = sum(ancf.mesh_internal_forces(m, tire.coords0)
            for m in tire.meshes)
    assert float(jnp.max(jnp.abs(f))) < 1e-4


def test_tire_mass_is_physical(small_tire):
    """Layered section densities integrate to a plausible tire mass
    (HMMWV 37x12.5 tire is a few tens of kg; exact value depends on the
    profile shell area x layer stacks)."""
    _, tire = small_tire
    m = float(jnp.sum(tire.mlump))
    assert 2.0 < m < 200.0


def test_tire_inflation_converges(small_tire):
    """200 kPa inflation grows the crown radius and dynamic relaxation
    settles to an equilibrium (velocities decay)."""
    spec, tire = small_tire
    step = ft.make_ancf_tire_step(tire, h=2e-6, pressure=spec.pressure,
                                  relax=5e-3)
    c, v = tire.coords0, jnp.zeros_like(tire.coords0)
    c, v = _run(step, c, v, 6000)
    r0 = spec.tire_radius
    r1 = _crown_radius(tire, c)
    assert r1 > r0 + 1e-3                     # inflated outward
    assert r1 < r0 * 1.25                     # not blown up
    c2, v2 = _run(step, c, v, 3000)
    assert float(jnp.max(jnp.abs(v2))) < 0.2  # settled
    assert abs(_crown_radius(tire, c2) - r1) < 2e-3


def test_tire_load_deflection(small_tire):
    """Pressing the rim down against the ground plane produces a positive,
    monotonically increasing vertical reaction — the load-deflection curve
    of the reference's tire test rig
    (src/chrono_vehicle/wheeled_vehicle/test_rig/ChTireTestRig.h)."""
    spec, tire = small_tire
    contact = NodeCloudContact(
        node_radius=jnp.asarray(0.005, jnp.float32),
        kn=jnp.asarray(spec.contact_kn, jnp.float32),
        gn=jnp.asarray(1e3, jnp.float32),
        mu=jnp.asarray(spec.contact_mu, jnp.float32),
        plane_n=jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        plane_d=jnp.asarray([0.0], jnp.float32))
    step = ft.make_ancf_tire_step(tire, h=2e-6, pressure=spec.pressure,
                                  relax=5e-3, contact=contact)
    # inflate first
    c, v = _run(step, tire.coords0, jnp.zeros_like(tire.coords0), 6000)
    forces = []
    for drop in (0.0, 0.04):
        ci = ft.clamp_rim(tire, c, tire.center
                          - jnp.asarray([0.0, 0.0, drop], jnp.float32))
        ci, vi = _run(step, ci, jnp.zeros_like(ci), 6000)
        fz = float(ft.tire_contact_force(tire, contact, ci, vi)[2])
        forces.append(fz)
    assert forces[0] > 0.0                    # inflated tire loads the ground
    assert forces[1] > 1.3 * forces[0]        # stiffening with deflection
