from chrono_tpu.physics.body import BodyState, BodyProps, make_body_state, kinetic_energy
from chrono_tpu.physics.builder import SystemBuilder
from chrono_tpu.physics.system import (
    Model, SolverSettings, StepInfo,
    step_euler_implicit_linearized, make_step_fn, simulate,
)
from chrono_tpu.physics.explicit import (
    step_euler_explicit, step_heun, step_rk4, EXPLICIT_STEPPERS,
)
from chrono_tpu.physics.smc import SMCParams, smc_step, smc_contact_forces
