"""Drawbar-pull rig on SCM terrain (reference ChVehicleCosimDBPRig):
pull increases with slip; sinkage positive; rut left behind."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.vehicle.terrain import SCMParams, make_scm_state
from chrono_tpu.vehicle.dbp import run_dbp_rig


PARAMS = SCMParams(Kphi=jnp.asarray(6e5), Kc=jnp.asarray(0.0),
                   n_exp=jnp.asarray(1.0))
RIG = dict(wheel_radius=0.3, wheel_width=0.2, mass=60.0, load=1200.0,
           v=0.5, h=1e-3, n_steps=900, settle_steps=400,
           start_xy=(0.6, 0.75))


def _terrain():
    return make_scm_state((0, 0), (3.0, 1.5), 0.025)


def test_pull_increases_with_slip():
    pulls = {}
    sink = {}
    for s in (0.05, 0.4):
        out = run_dbp_rig(PARAMS, _terrain(), slip=s, **RIG)
        tail = out.pull.shape[0] // 3
        pulls[s] = float(jnp.mean(out.pull[-tail:]))
        sink[s] = float(jnp.mean(out.sinkage[-tail:]))
        assert np.isfinite(np.asarray(out.pull)).all()
    # Janosi shear: more slip → more thrust (up to saturation)
    assert pulls[0.4] > pulls[0.05] + 20.0, pulls
    # the wheel sank into the soil under load
    assert sink[0.05] > 0.005, sink
    # plastic rut left along the path
    out = run_dbp_rig(PARAMS, _terrain(), slip=0.2, **RIG)
    assert float(out.scm.sinkage.max()) > 0.005


def test_high_slip_torque_exceeds_low_slip():
    tq = {}
    for s in (0.05, 0.4):
        out = run_dbp_rig(PARAMS, _terrain(), slip=s, **RIG)
        tail = out.torque.shape[0] // 3
        tq[s] = abs(float(jnp.mean(out.torque[-tail:])))
    assert tq[0.4] > tq[0.05], tq
