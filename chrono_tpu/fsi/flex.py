"""Flexible-solid FSI: BCE markers on FEA shells/cables.

TPU-native counterpart of the reference's flexible BCE machinery
(/root/reference/src/chrono_fsi/sph/physics/SphBceManager.cu:388-1160 —
UpdateMesh1D/2DMarkerState, Flex1D/2D_Forces): markers ride the FEA mesh by
shape-function interpolation and the fluid reaction spreads back to the nodes
with the same weights — a consistent (virtual-work) load transfer.

Marker attachment (2D shells): element id + parametric (ξ, η) + through-
thickness offset ζ; position r = Σ Nᵢ(ξ,η)(rᵢ + ζ t/2 dᵢ), velocity likewise
from nodal rates.  Nodal force: fᵢ = Nᵢ f_marker (positions) and
mᵢ = ζ t/2 Nᵢ f_marker (directors).  Cables use the cubic Hermite S(ξ).

The coupled step (fluid substeps → reduction → FEA HHT step) mirrors
chrono_tpu.fsi.system.fsi_step with the FEA solid in place of rigid bodies.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax, Array

from chrono_tpu.utils.pytree import pytree_dataclass
from chrono_tpu.collision.cell_list import GridSpec
from chrono_tpu.fsi.sph.state import SPHParams, SPHState
from chrono_tpu.fsi.sph import wcsph
from chrono_tpu.fsi.sph.system import rebuild_sph_neighbors, sph_substep
from chrono_tpu.fea.shell import ShellMesh, _N
from chrono_tpu.fea import dynamics as fea_dyn


@pytree_dataclass
class FlexAttach2D:
    """Per-marker attachment to a shell mesh (M markers)."""

    elem: Array    # (M,) int32 element index
    xi: Array      # (M,) ξ ∈ [-1,1]
    eta: Array     # (M,)
    zeta: Array    # (M,) through-thickness offset ∈ [-1,1] (× t/2)


def shell_bce_markers(mesh: ShellMesh, q0: Array, spacing: float,
                      layers: int = 3):
    """Generate FLEX_BCE attachments covering each shell element with
    ``layers`` marker sheets through the thickness (reference default 3,
    ChFsiParamsSPH.h:65).  Returns (FlexAttach2D, world positions)."""
    elems = np.asarray(mesh.elems)
    a = np.asarray(mesh.props.a)
    b = np.asarray(mesh.props.b)
    ee, xx, hh, zz = [], [], [], []
    for e in range(len(elems)):
        nx = max(2, int(np.ceil(a[e] / spacing)) + 1)
        ny = max(2, int(np.ceil(b[e] / spacing)) + 1)
        xi = np.linspace(-1, 1, nx)
        eta = np.linspace(-1, 1, ny)
        if layers > 1:
            zet = np.linspace(-1, 1, layers)
        else:
            zet = np.array([0.0])
        for z in zet:
            g = np.stack(np.meshgrid(xi, eta, indexing="ij"), -1).reshape(-1, 2)
            ee.append(np.full(len(g), e))
            xx.append(g[:, 0])
            hh.append(g[:, 1])
            zz.append(np.full(len(g), z))
    att = FlexAttach2D(
        elem=jnp.asarray(np.concatenate(ee), jnp.int32),
        xi=jnp.asarray(np.concatenate(xx), jnp.float32),
        eta=jnp.asarray(np.concatenate(hh), jnp.float32),
        zeta=jnp.asarray(np.concatenate(zz), jnp.float32))
    pos = flex_marker_positions(mesh, q0, att)
    return att, np.asarray(pos)


def _marker_weights(mesh: ShellMesh, att: FlexAttach2D):
    """(M, 4) bilinear weights and (M,) thickness offsets z·t/2."""
    N = jax.vmap(_N)(att.xi, att.eta)             # (M, 4)
    t = mesh.props.t[att.elem]
    return N, 0.5 * t * att.zeta


def flex_marker_positions(mesh: ShellMesh, q: Array, att: FlexAttach2D):
    N, zoff = _marker_weights(mesh, att)
    nodes = mesh.elems[att.elem]                  # (M, 4)
    r = q[nodes, 0:3]                             # (M, 4, 3)
    d = q[nodes, 3:6]
    return jnp.einsum("mk,mkc->mc", N, r + zoff[:, None, None] * d)


def flex_marker_velocities(mesh: ShellMesh, qd: Array, att: FlexAttach2D):
    return flex_marker_positions(mesh, qd, att)   # same linear map


def flex_nodal_forces(mesh: ShellMesh, att: FlexAttach2D, f_markers: Array,
                      n_nodes: int) -> Array:
    """Spread marker forces to nodal generalized forces (Nn, 6) — the
    virtual-work transpose of the interpolation (reference Flex2D_Forces)."""
    N, zoff = _marker_weights(mesh, att)
    nodes = mesh.elems[att.elem]                  # (M, 4)
    out = jnp.zeros((n_nodes, 6), f_markers.dtype)
    fr = N[:, :, None] * f_markers[:, None, :]               # (M, 4, 3)
    fd = (N * zoff[:, None])[:, :, None] * f_markers[:, None, :]
    out = out.at[nodes.reshape(-1), 0:3].add(fr.reshape(-1, 3))
    out = out.at[nodes.reshape(-1), 3:6].add(fd.reshape(-1, 3))
    return out


@pytree_dataclass
class FlexFSIState:
    fluid: SPHState
    q: Array      # (Nn, 6) shell nodal coords
    qd: Array
    qdd: Array
    time: Array


def make_flex_fsi_advance_fn(mesh: ShellMesh, att: FlexAttach2D,
                             params: SPHParams, grid: GridSpec,
                             n_substeps: int, h_solid: float = None,
                             f_ext_solid=None, hht_alpha: float = -0.2):
    """Coupled fluid ↔ flexible-shell stepping (one jitted outer step).

    Marker kinematics from (q, qd) → fluid substeps → marker force reduction
    → FEA HHT step with the spread loads (+ optional external nodal loads).
    """
    n_nodes = mesh.q0.shape[0]
    m = wcsph.particle_mass(params)
    h_outer = float(params.dt) * n_substeps
    h_s = h_outer if h_solid is None else h_solid
    hht = fea_dyn.make_hht_step(mesh, n_nodes, h_s, alpha=hht_alpha,
                                newton_iters=8, tol=1e-4)

    def outer(state: FlexFSIState):
        fluid = state.fluid
        mpos = flex_marker_positions(mesh, state.q, att)
        mvel = flex_marker_velocities(mesh, state.qd, att)
        # FLEX markers occupy the TAIL of the marker arrays by construction
        # (make_sph_state appends them last)
        n_flex = att.elem.shape[0]
        fluid = fluid.replace(pos=fluid.pos.at[-n_flex:].set(mpos),
                              vel=fluid.vel.at[-n_flex:].set(mvel))

        fluid = rebuild_sph_neighbors(params, grid, fluid)

        def fstep(f, _):
            return sph_substep(params, grid, f), None

        fluid, _ = lax.scan(fstep, fluid, None, length=n_substeps)

        # fluid reaction on flex markers
        _, dv_dt = wcsph.wcsph_rhs(
            params, grid, fluid.pos, fluid.vel, fluid.rho, fluid.kind,
            fluid.nbr.idx, fluid.nbr.valid)
        f_markers = m * dv_dt[-n_flex:]
        f_nodes = flex_nodal_forces(mesh, att, f_markers, n_nodes)
        if f_ext_solid is not None:
            f_nodes = f_nodes + f_ext_solid
        out = hht(state.q, state.qd, state.qdd, f_nodes)
        return FlexFSIState(fluid=fluid, q=out.q, qd=out.qd, qdd=out.qdd,
                            time=state.time + h_outer)

    @functools.partial(jax.jit, static_argnums=1)
    def advance(state: FlexFSIState, n_outer: int):
        def body(s, _):
            return outer(s), None

        state, _ = lax.scan(body, state, None, length=n_outer)
        return state

    return advance
