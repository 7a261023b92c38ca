"""Batched ray tests against analytic shapes and triangle soups.

Role of the reference's ray machinery — the multicore backend's
``ChRayTest`` (/root/reference/src/chrono/collision/multicore/ChRayTest.cpp:
sphere/box/cylinder/triangle dispatch used by SCM ray-casting and queries)
and the geometric half of ``chrono_sensor``'s OptiX ray tracing
(/root/reference/src/chrono_sensor/optix/ChOptixEngine.cpp) — re-expressed
TPU-native: every query is an (R,) batch of rays evaluated against all
primitives as dense (R, S) min-reductions (no BVH; at the scene sizes the
reference's sensor demos use — thousands of triangles — a dense sweep on
the VPU beats tree traversal, and it is jit/vmap/grad-safe).

All functions return ``t`` = hit distance (∞ where missed) so callers can
``jnp.minimum``-combine scenes, plus the surface normal at the hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

INF = jnp.inf


def _norm(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def ray_spheres(o, d, centers, radii):
    """Rays (R,3)+(R,3 unit) vs spheres (S,3),(S,) → (t (R,), n (R,3))."""
    oc = o[:, None, :] - centers[None, :, :]             # (R,S,3)
    b = jnp.sum(oc * d[:, None, :], axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radii[None, :] ** 2
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 1e-6, t0, jnp.where(t1 > 1e-6, t1, INF))
    t = jnp.where(disc >= 0.0, t, INF)                   # (R,S)
    ts = jnp.min(t, axis=1)
    j = jnp.argmin(t, axis=1)
    hit = o + ts[:, None] * d
    n = _norm(hit - centers[j])
    return ts, n


def ray_boxes(o, d, centers, rots, halfs):
    """Rays vs oriented boxes (S,3) centers, (S,3,3) rotation matrices
    (columns = box axes), (S,3) half extents — slab test."""
    ro = jnp.einsum("sij,rsj->rsi", rots.transpose(0, 2, 1),
                    o[:, None, :] - centers[None, :, :])
    rd = jnp.einsum("sij,rsj->rsi", rots.transpose(0, 2, 1),
                    jnp.broadcast_to(d[:, None, :], ro.shape))
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                          jnp.where(rd >= 0, 1e-12, -1e-12), rd)
    t1 = (-halfs[None] - ro) * inv
    t2 = (halfs[None] - ro) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)          # (R,S)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 1e-6))
    t = jnp.where(hit, jnp.where(tmin > 1e-6, tmin, tmax), INF)
    ts = jnp.min(t, axis=1)
    j = jnp.argmin(t, axis=1)
    # face normal: dominant axis of the local hit point
    p_loc = (jnp.take_along_axis(ro, j[:, None, None], 1)[:, 0]
             + ts[:, None] * jnp.take_along_axis(rd, j[:, None, None], 1)[:, 0])
    q = p_loc / jnp.maximum(halfs[j], 1e-12)
    ax = jnp.argmax(jnp.abs(q), axis=-1)
    n_loc = jax.nn.one_hot(ax, 3) * jnp.sign(
        jnp.take_along_axis(q, ax[:, None], 1))
    n = jnp.einsum("rij,rj->ri", rots[j], n_loc)
    return ts, n


def ray_planes(o, d, points, normals):
    """Rays vs infinite planes (S,3),(S,3)."""
    denom = jnp.sum(d[:, None, :] * normals[None], axis=-1)
    t = jnp.sum((points[None] - o[:, None, :]) * normals[None], axis=-1) \
        / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = jnp.where((jnp.abs(denom) > 1e-12) & (t > 1e-6), t, INF)
    ts = jnp.min(t, axis=1)
    j = jnp.argmin(t, axis=1)
    n = normals[j] * -jnp.sign(jnp.sum(d * normals[j], axis=-1,
                                       keepdims=True))
    return ts, n


def ray_triangles(o, d, v0, v1, v2, chunk=4096):
    """Rays (R,3) vs triangle soup (T,3)×3 — Möller–Trumbore, two-sided.

    Triangles are processed in chunks to bound the (R, chunk) intermediates
    (a T=100k soup at R=16k rays would otherwise build 6 GB tensors)."""
    T = v0.shape[0]
    pad = (-T) % chunk
    if pad:
        padv = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, padv])
        v1 = jnp.concatenate([v1, padv])
        v2 = jnp.concatenate([v2, padv])
    nchunk = v0.shape[0] // chunk
    v0 = v0.reshape(nchunk, chunk, 3)
    v1 = v1.reshape(nchunk, chunk, 3)
    v2 = v2.reshape(nchunk, chunk, 3)

    def one(carry, tri):
        tbest, nbest = carry
        a, b_, c = tri
        e1 = b_ - a                                       # (chunk,3)
        e2 = c - a
        pvec = jnp.cross(d[:, None, :], e2[None])         # (R,chunk,3)
        det = jnp.sum(e1[None] * pvec, axis=-1)
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvec = o[:, None, :] - a[None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv
        qvec = jnp.cross(tvec, e1[None])
        v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv
        t = jnp.sum(e2[None] * qvec, axis=-1) * inv
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
              & (u + v <= 1) & (t > 1e-6)
              & (jnp.sum(e1 * e1 + e2 * e2, axis=-1)[None] > 0))
        t = jnp.where(ok, t, INF)
        ts = jnp.min(t, axis=1)
        j = jnp.argmin(t, axis=1)
        nml = _norm(jnp.cross(e1, e2))[j]
        better = ts < tbest
        nbest = jnp.where(better[:, None],
                          nml * -jnp.sign(jnp.sum(d * nml, axis=-1,
                                                  keepdims=True)),
                          nbest)
        return (jnp.where(better, ts, tbest), nbest), None

    init = (jnp.full((o.shape[0],), INF, o.dtype), jnp.zeros_like(o))
    (ts, n), _ = jax.lax.scan(one, init, (v0, v1, v2))
    return ts, n


def combine(*hits):
    """min-combine (t, n) results from several primitive families."""
    ts = jnp.stack([h[0] for h in hits], axis=0)
    ns = jnp.stack([h[1] for h in hits], axis=0)
    j = jnp.argmin(ts, axis=0)
    t = jnp.take_along_axis(ts, j[None], 0)[0]
    n = jnp.take_along_axis(ns, j[None, :, None], 0)[0]
    return t, n
