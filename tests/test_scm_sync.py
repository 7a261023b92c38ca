"""SynChrono SCM terrain-patch merging (SynSCMTerrainAgent role): ruts
carved by different agents union together, order-independently."""

import numpy as np
import jax.numpy as jnp

from chrono_tpu.vehicle.terrain import (
    SCMParams, make_scm_state, scm_wheel_forces,
)
from chrono_tpu.synchro.agents import scm_patch_diff, scm_patch_merge
from chrono_tpu.core import quaternion as Q


def _rutted(x, y):
    params = SCMParams(Kphi=jnp.asarray(5e5), Kc=jnp.asarray(0.0),
                       n_exp=jnp.asarray(1.0))
    scm = make_scm_state((-1, -1), (1, 1), 0.02)
    wheel = jnp.asarray([[x, y, 0.32]])
    out = scm_wheel_forces(params, scm, wheel, Q.qidentity((1,)),
                           jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                           wheel_radius=0.35, wheel_width=0.2)
    return out.new_state


def test_diff_and_merge_union():
    base = np.asarray(make_scm_state((-1, -1), (1, 1), 0.02).sinkage)
    a = _rutted(-0.4, 0.0)       # agent A carves on the left
    b = _rutted(0.4, 0.0)        # agent B on the right
    idx_b, val_b = scm_patch_diff(b, base)
    assert len(idx_b) > 0
    merged = scm_patch_merge(a, [(idx_b, val_b)])
    sa = np.asarray(a.sinkage)
    sb = np.asarray(b.sinkage)
    sm = np.asarray(merged.sinkage)
    np.testing.assert_allclose(sm, np.maximum(sa, sb), atol=1e-7)
    # height consistent with the merged ruts
    np.testing.assert_allclose(np.asarray(merged.height),
                               np.asarray(merged.z0) - sm, atol=1e-7)


def test_merge_is_order_independent():
    base = np.asarray(make_scm_state((-1, -1), (1, 1), 0.02).sinkage)
    a = _rutted(-0.3, 0.1)
    b = _rutted(0.3, -0.1)
    da = scm_patch_diff(a, base)
    db = scm_patch_diff(b, base)
    fresh = make_scm_state((-1, -1), (1, 1), 0.02)
    m1 = scm_patch_merge(fresh, [da, db])
    m2 = scm_patch_merge(fresh, [db, da])
    np.testing.assert_allclose(np.asarray(m1.sinkage),
                               np.asarray(m2.sinkage), atol=0)
