from chrono_tpu.dem.params import DEMParams, DEMMaterial, suggest_step_size
from chrono_tpu.dem.bc import DEMBoundaries, PlaneBCs, CylinderBCs, SphereBCs, ConeBCs, box_boundaries
from chrono_tpu.dem.system import DEMSystem, DEMState, make_dem_state, make_advance_fn
