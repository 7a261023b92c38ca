"""J2 plasticity (ChContinuumPlasticVonMises role) — uniaxial bar:
elastic slope E, post-yield slope E·H/(E+H), elastic unloading with
residual strain."""

import numpy as np
import jax.numpy as jnp
import pytest

from chrono_tpu.fea.tetra import TetraBuilder
from chrono_tpu.fea.plasticity import (
    PlasticParams, init_state, return_map, plastic_step, vm_stress)

E_ = 1.0e9
NU = 0.0          # uniaxial: nu=0 decouples the lateral contraction
SY = 1.0e6
H_ = 1.0e8


def _bar():
    b = TetraBuilder()
    b.add_block((0, 0, 0), 1, 1, 1, 1.0, 0.1, 0.1, E_, NU, 1000.0,
                fix_face="x0")
    return b.finalize()


def _stretch(q, strain):
    pos = np.asarray(q[:, 0:3]).copy()
    pos[:, 0] *= (1.0 + strain)
    out = np.asarray(q).copy()
    out[:, 0:3] = pos
    return jnp.asarray(out)


def test_uniaxial_curve():
    mesh, q0 = _bar()
    par = PlasticParams(sigma_y=jnp.asarray(SY), H=jnp.asarray(H_))
    state = init_state(mesh)
    eps_y = SY / E_
    stresses = []
    strains = np.linspace(0.0, 4.0 * eps_y, 17)
    for s in strains:
        state, sig = return_map(mesh, par, state, _stretch(q0, s))
        stresses.append(float(jnp.mean(sig[:, 0, 0])))
    stresses = np.asarray(stresses)
    # elastic branch (nu=0, below yield: sigma_xx = E eps_xx exactly)
    k_el = (stresses[2] - stresses[1]) / (strains[2] - strains[1])
    assert k_el == pytest.approx(E_, rel=2e-2)
    # consistency: during plastic flow the stress sits ON the hardened
    # yield surface, sigma_vm = sigma_y + H*alpha (exact radial-return
    # invariant; prescribed-strain loading is NOT uniaxial stress, so the
    # textbook E*H/(E+H) tangent does not apply here)
    state_chk = init_state(mesh)
    for s_ in strains:
        state_chk, sig = return_map(mesh, par, state_chk,
                                    _stretch(q0, s_))
    vm = float(jnp.mean(vm_stress(sig)))
    a = float(jnp.mean(state_chk.alpha))
    assert a > 0.0
    assert vm == pytest.approx(SY + H_ * a, rel=1e-4)
    # plastic branch much softer than elastic
    k_pl = (stresses[-1] - stresses[-2]) / (strains[-1] - strains[-2])
    assert k_pl < 0.5 * E_

    # partial unloading WITHIN the elastic range is purely elastic (no
    # alpha growth); a full reversal would re-yield in compression
    # (isotropic hardening), so back off by ~0.8x the elastic recovery
    s_back = strains[-1] - 0.8 * stresses[-1] / E_
    state2, sig2 = return_map(mesh, par, state, _stretch(q0, s_back))
    assert float(jnp.mean(state2.alpha)) == pytest.approx(
        float(jnp.mean(state.alpha)), rel=1e-6)
    assert float(jnp.mean(state2.eps_p[:, 0, 0])) > 0.2 * eps_y


def test_forces_balance():
    """Internal forces of the return-mapped stress sum to zero (no fixed
    nodes counted) and pull the free end back along -x."""
    mesh, q0 = _bar()
    par = PlasticParams(sigma_y=jnp.asarray(SY), H=jnp.asarray(H_))
    state = init_state(mesh)
    q = _stretch(q0, 3.0 * SY / E_)
    state, f = plastic_step(mesh, par, state, q)
    f = np.asarray(f)
    np.testing.assert_allclose(f[:, 0:3].sum(axis=0), 0.0, atol=1e-2)
    x = np.asarray(q[:, 0])
    assert f[x > 0.9, 0].sum() < 0.0      # free end pulled back


def test_vm_stress_of_pure_shear():
    sig = jnp.zeros((1, 3, 3)).at[0, 0, 1].set(1.0).at[0, 1, 0].set(1.0)
    assert float(vm_stress(sig)[0]) == pytest.approx(np.sqrt(3.0), rel=1e-6)
