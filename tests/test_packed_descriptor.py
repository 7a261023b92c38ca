"""Parity tests: packed-row / gather-plan Schur operators vs the channel-split
reference forms, and the slot-table broadphase vs the sort+searchsorted one.

These are the TPU hot-path rewrites (wide row gathers instead of per-channel
1-D gathers; see solver/descriptor.py packed-row notes) — the physics must be
bitwise-identical in structure and numerically identical to fp32 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chrono_tpu.physics.body import BodyProps
from chrono_tpu.physics.constraints import ConstraintRows
from chrono_tpu.solver import descriptor as desc
from chrono_tpu.collision import cell_list as cl


def _random_rows(key, m, n_bodies, three_body=True, inactive_frac=0.3):
    ks = jax.random.split(key, 12)
    body_a = jax.random.randint(ks[0], (m,), 0, n_bodies)
    body_b = jax.random.randint(ks[1], (m,), 0, n_bodies)
    body_c = (jax.random.randint(ks[2], (m,), 0, n_bodies)
              if three_body else jnp.zeros((m,), jnp.int32))
    rows = ConstraintRows(
        body_a=body_a.astype(jnp.int32), body_b=body_b.astype(jnp.int32),
        body_c=body_c.astype(jnp.int32),
        Ja_v=jax.random.normal(ks[3], (m, 3)),
        Ja_w=jax.random.normal(ks[4], (m, 3)),
        Jb_v=jax.random.normal(ks[5], (m, 3)),
        Jb_w=jax.random.normal(ks[6], (m, 3)),
        Jc_w=(jax.random.normal(ks[7], (m, 3)) if three_body
              else jnp.zeros((m, 3))),
        rhs=jax.random.normal(ks[8], (m,)),
        active=jax.random.uniform(ks[9], (m,)) > inactive_frac,
    )
    inv_inertia = jnp.abs(jax.random.normal(ks[11], (n_bodies, 3)))
    inv_inertia = inv_inertia.at[0].set(0.0)
    props = BodyProps(
        inv_mass=jnp.abs(jax.random.normal(ks[10], (n_bodies,)))
        .at[0].set(0.0),                       # body 0 fixed (ground)
        inertia=jnp.where(inv_inertia > 0, 1.0 / (inv_inertia + 1e-30), 0.0),
        inv_inertia=inv_inertia,
    )
    return rows, props


@pytest.mark.parametrize("three_body", [False, True])
def test_schur_product_packed_matches_reference(three_body):
    rows, props = _random_rows(jax.random.PRNGKey(0), 257, 40, three_body)
    gamma = jax.random.normal(jax.random.PRNGKey(1), (rows.m,))
    want = desc.schur_product(rows, props, gamma)
    p = desc.pack_rows(rows)
    minv8 = desc.pack_minv(props)
    got = desc.schur_product_packed(p, minv8, gamma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # inactive rows produce exactly zero output
    assert np.all(np.asarray(got)[~np.asarray(rows.active)] == 0.0)


def test_gather_plan_matches_scatter():
    rows, props = _random_rows(jax.random.PRNGKey(2), 300, 64)
    p = desc.pack_rows(rows)
    minv8 = desc.pack_minv(props)
    gamma = jax.random.normal(jax.random.PRNGKey(3), (rows.m,))
    plan = desc.build_gather_plan(p, minv8, max_rows_per_body=64)
    assert int(plan.overflow) == 0
    want = desc.apply_DT_packed(p, gamma, 64)
    got = desc.apply_DT_gather(plan, gamma)
    movable = np.asarray(jnp.any(minv8 > 0, axis=1))
    np.testing.assert_allclose(np.asarray(got)[movable],
                               np.asarray(want)[movable],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(desc.schur_product_plan(p, minv8, plan, gamma)),
        np.asarray(desc.schur_product_packed(p, minv8, gamma)),
        rtol=2e-5, atol=2e-5)


def test_gather_plan_overflow_flag():
    # all rows hit body 1 → valence 2M on one movable body
    m = 40
    rows, props = _random_rows(jax.random.PRNGKey(4), m, 8, three_body=False)
    rows = rows.replace(body_a=jnp.ones((m,), jnp.int32),
                        body_b=jnp.ones((m,), jnp.int32))
    p = desc.pack_rows(rows)
    plan = desc.build_gather_plan(p, desc.pack_minv(props),
                                  max_rows_per_body=16)
    assert int(plan.overflow) > 0


def test_fixed_world_body_excluded_from_plan():
    # body 0 is fixed and collects every row: must NOT overflow the plan
    m = 500
    rows, props = _random_rows(jax.random.PRNGKey(5), m, 16, three_body=False)
    rows = rows.replace(body_a=jnp.zeros((m,), jnp.int32))
    p = desc.pack_rows(rows)
    minv8 = desc.pack_minv(props)
    plan = desc.build_gather_plan(p, minv8, max_rows_per_body=96)
    assert int(plan.overflow) == 0
    gamma = jax.random.normal(jax.random.PRNGKey(6), (m,))
    np.testing.assert_allclose(
        np.asarray(desc.schur_product_plan(p, minv8, plan, gamma)),
        np.asarray(desc.schur_product_packed(p, minv8, gamma)),
        rtol=2e-5, atol=2e-5)


def test_diag_and_rhs_and_velocity_update_packed():
    rows, props = _random_rows(jax.random.PRNGKey(7), 129, 24)
    p = desc.pack_rows(rows)
    minv8 = desc.pack_minv(props)
    np.testing.assert_allclose(np.asarray(desc.diag_N_packed(p, minv8)),
                               np.asarray(desc.diag_N(rows, props)),
                               rtol=2e-5, atol=2e-5)
    v = jax.random.normal(jax.random.PRNGKey(8), (24, 3))
    w = jax.random.normal(jax.random.PRNGKey(9), (24, 3))
    np.testing.assert_allclose(
        np.asarray(desc.schur_rhs_packed(p, desc.pack_u(v, w))),
        np.asarray(jnp.where(rows.active,
                             desc.schur_rhs(rows, v, w), 0.0)),
        rtol=2e-5, atol=2e-5)
    gamma = jax.random.normal(jax.random.PRNGKey(10), (rows.m,))
    v2, w2 = desc.velocity_update_packed(p, minv8, gamma, desc.pack_u(v, w))
    v_ref, w_ref = desc.velocity_update(rows, props, gamma, v, w)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------- cell list


def _grid(periodic=(False, False, False)):
    return cl.GridSpec(origin=(0.0, 0.0, 0.0), cell_size=0.5, dims=(6, 5, 4),
                       periodic=periodic)


def _neighbor_sets_reference(grid, pos):
    """Brute-force: particles within the 3x3x3 cell neighborhood of each query."""
    ids = np.asarray(cl.cell_index(grid, pos))
    ijk = np.asarray(cl.cell_ijk(grid, pos))
    dims = np.asarray(grid.dims)
    out = []
    for qi in range(pos.shape[0]):
        s = set()
        for j in range(pos.shape[0]):
            d = ijk[j] - ijk[qi]
            ok = True
            for ax in range(3):
                da = d[ax] % dims[ax] if grid.periodic[ax] else d[ax]
                if grid.periodic[ax]:
                    da = min(da, dims[ax] - da)
                if abs(da) > 1:
                    ok = False
            if ok:
                s.add(j)
        out.append(s)
    return out


@pytest.mark.parametrize("periodic", [(False,) * 3, (True, False, True)])
def test_slot_table_matches_searchsorted_candidates(periodic):
    grid = _grid(periodic)
    pos = jax.random.uniform(jax.random.PRNGKey(11), (60, 3)) * jnp.asarray(
        [3.0, 2.5, 2.0])
    table, ovf = cl.build_slot_table(grid, pos, max_per_cell=16)
    assert int(ovf) == 0
    qijk = cl.cell_ijk(grid, pos)
    cand, valid = cl.neighbor_candidates_table(grid, table, qijk)
    got = [set(np.asarray(cand[i])[np.asarray(valid[i])].tolist())
           for i in range(60)]
    want = _neighbor_sets_reference(grid, pos)
    assert got == want


def test_feature_table_roundtrip():
    grid = _grid()
    n = 50
    pos = jax.random.uniform(jax.random.PRNGKey(12), (n, 3)) * 2.0
    feat = jnp.concatenate(
        [pos, jnp.arange(n, dtype=jnp.float32)[:, None],
         jnp.ones((n, 1))], axis=1)                       # ch=5, validity last
    table, ovf = cl.build_feature_table(grid, pos, feat, max_per_cell=16)
    assert int(ovf) == 0
    qijk = cl.cell_ijk(grid, pos)
    rows, in_range = cl.neighbor_feature_rows(grid, table, qijk, 16, 5)
    rows = np.asarray(rows)
    ok = (rows[..., 4] > 0) & np.asarray(in_range)[..., None]
    got = [set(rows[i][ok[i]][:, 3].astype(int).tolist()) for i in range(n)]
    want = _neighbor_sets_reference(grid, pos)
    assert got == want
    # positions survive the pack/unpack bitwise
    flat_idx = rows[..., 3].astype(int)
    np.testing.assert_array_equal(rows[ok][:, 0:3],
                                  np.asarray(pos)[flat_idx[ok]])


def test_feature_table_overflow():
    grid = _grid()
    pos = jnp.zeros((20, 3)) + 0.1                        # all in one cell
    feat = jnp.ones((20, 2))
    _, ovf = cl.build_feature_table(grid, pos, feat, max_per_cell=8)
    assert int(ovf) == 12


@pytest.mark.parametrize("capacity", [4, 10, 64])
def test_topk_select(capacity):
    ok = jnp.asarray([0, 1, 1, 0, 0, 1, 0, 1, 1, 0], bool)
    sel, active, count = cl.topk_select(ok, capacity)
    assert int(count) == 5
    want = [1, 2, 5, 7, 8][:capacity]
    got = np.asarray(sel)[np.asarray(active)].tolist()
    assert got == want
    assert int(np.sum(np.asarray(active))) == min(5, capacity)
    # inactive slots point at a legal index (no OOB gathers downstream)
    assert np.all(np.asarray(sel) < ok.shape[0])
