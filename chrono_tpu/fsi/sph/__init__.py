from chrono_tpu.fsi.sph.state import (
    SPHParams, SPHState, FLUID, BOUNDARY, RIGID_BCE, FLEX_BCE,
    tait_pressure, tait_density,
)
from chrono_tpu.fsi.sph.system import (
    make_sph_state, make_sph_advance_fn, sph_substep, rebuild_sph_neighbors,
    suggest_sph_dt,
)
from chrono_tpu.fsi.sph import kernels, wcsph
from chrono_tpu.fsi.sph.crm import (
    CRMParams, CRMState, make_crm_state, crm_step, make_crm_advance_fn,
    drucker_prager_return, lithostatic_init,
)
from chrono_tpu.fsi.sph.pencil import make_sph_advance_pencil
