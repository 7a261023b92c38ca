from chrono_tpu.vehicle.tire import (
    TMeasyParams, FialaParams, Pac89Params, Pac02Params,
    tmeasy_forces, fiala_forces, pac89_forces, pac02_forces,
)
from chrono_tpu.vehicle.terrain import (
    flat_terrain, Heightmap, SCMParams, SCMState, make_scm_state,
    scm_wheel_forces, scm_erosion_step,
)
from chrono_tpu.vehicle.powertrain import PowertrainParams, driveline_torques, brake_torques
from chrono_tpu.vehicle.driver import (
    DriverInputs, SpeedController, PathFollower, DataDriver,
    straight_path, double_lane_change_path,
)
from chrono_tpu.vehicle.wheeled import (
    WheeledVehicle, build_wheeled_vehicle, vehicle_step, ackermann_angles,
)
