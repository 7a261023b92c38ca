"""Drawbar-pull (DBP) rig: single tire at imposed slip on deformable terrain.

Counterpart of the reference's co-simulation DBP rig
(/root/reference/src/chrono_vehicle/cosim/ChVehicleCosimDBPRig.h,
ChVehicleCosimDBPRigImposedSlip): the carrier translates at an imposed
longitudinal speed v while the wheel spins at ω, fixing the slip
s = (ωR − v)/ωR; the terrain reaction measured on the carrier IS the drawbar
pull, and the vertical DOF stays dynamic so the tire finds its sinkage under
the applied load.  Where the reference splits rig/tire/terrain across MPI
ranks, here the whole rig is one jitted scan over the SCM grid update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from chrono_tpu.vehicle.terrain import SCMParams, SCMState, scm_wheel_forces


class DBPOut(NamedTuple):
    pull: jnp.ndarray       # (T,) drawbar pull [N] (+ = tractive)
    sinkage: jnp.ndarray    # (T,) wheel-bottom depth below the virgin surface [m]
    torque: jnp.ndarray     # (T,) spin torque reaction [N·m]
    z: jnp.ndarray          # () final wheel-center height
    scm: SCMState


def run_dbp_rig(scm_params: SCMParams, scm_state: SCMState, *,
                wheel_radius: float, wheel_width: float, mass: float,
                load: float, v: float, slip: float, start_xy=(0.5, 0.5),
                h: float = 1e-3, n_steps: int = 800,
                settle_steps: int = 300) -> DBPOut:
    """Run the rig: settle vertically, then translate at v with the wheel
    spun at ω = v / (R (1 − slip)).

    ``load``: total vertical force pressing the tire down (rig weight).
    Returns per-step pull/sinkage/torque series from the measured phase.
    """
    omega = v / (wheel_radius * (1.0 - slip))
    x0, y0 = start_xy
    q_id = jnp.asarray([1.0, 0.0, 0.0, 0.0])

    def step(carry, inputs):
        z, vz, x, scm, moving = carry
        pos = jnp.asarray([x, y0, z])
        vel = jnp.asarray([v, 0.0, 0.0]) * moving
        w_loc = jnp.asarray([0.0, omega, 0.0]) * moving
        out = scm_wheel_forces(
            scm_params, scm, pos[None], q_id[None], vel[None], w_loc[None],
            wheel_radius=wheel_radius, wheel_width=wheel_width)
        fz = out.force[0, 2]
        vz2 = vz + h * (fz - load) / mass
        z2 = z + h * vz2
        x2 = x + h * v * moving
        return ((z2, vz2, x2, out.new_state, moving),
                (out.force[0, 0], z2, out.torque_spin[0]))

    z_init = wheel_radius + float(jnp.max(scm_state.height))
    carry = (jnp.asarray(z_init), jnp.asarray(0.0), jnp.asarray(x0),
             scm_state, jnp.asarray(0.0))

    @jax.jit
    def drive(carry):
        # phase 1: vertical settling (no translation/spin)
        carry, _ = lax.scan(step, carry, None, length=settle_steps)
        z_ref = carry[0]
        # phase 2: traction at imposed slip
        z, vz, x, scm, _ = carry
        carry = (z, vz, x, scm, jnp.asarray(1.0))
        carry, (fx, zs, tq) = lax.scan(step, carry, None, length=n_steps)
        return carry, z_ref, fx, zs, tq

    carry, z_ref, fx, zs, tq = drive(carry)
    # sinkage = wheel-bottom depth below the VIRGIN surface (z_init puts the
    # bottom exactly on it); measuring against the post-settle height would
    # read ~0 once the soil is elastic-plastic (the wheel rides at constant
    # equilibrium depth over fresh soil)
    return DBPOut(pull=fx, sinkage=z_init - zs, torque=tq, z=carry[0],
                  scm=carry[3])


def dbp_curve(scm_params: SCMParams, scm_maker, slips, **kw):
    """Drawbar pull vs slip sweep (fresh terrain per point), the rig's
    standard output (reference demo_VEH_Cosim_WheelRig DBP curves)."""
    pulls = []
    for s in slips:
        out = run_dbp_rig(scm_params, scm_maker(), slip=float(s), **kw)
        n_avg = max(1, out.pull.shape[0] // 4)
        pulls.append(float(jnp.mean(out.pull[-n_avg:])))
    return pulls
