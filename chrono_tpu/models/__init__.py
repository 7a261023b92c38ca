from chrono_tpu.models.hmmwv import create_hmmwv
from chrono_tpu.models.rover import create_rover, create_curiosity, set_wheel_speeds, rover_step_scm, Rover
from chrono_tpu.models.sedan import create_sedan
from chrono_tpu.models.polaris import create_polaris
from chrono_tpu.models.decks import (
    DECKS, create_vehicle, create_gator, create_feda, create_uaz,
    create_jeep, create_bmw, create_citybus, create_man, create_kraz,
    create_duro, create_gclass, create_mrole, create_mtv,
    create_unimog, build_marder,
)
from chrono_tpu.models.industrial import (
    Arm6R, fk_6r, ik_6r, ArmSCARA, fk_scara, ik_scara, ik_newton,
    make_trajectory, traj_eval, create_arm_6dof,
    joint_programs_from_trajectory,
)
from chrono_tpu.models.robosimian import (
    create_robosimian, gait_programs, limb_fk,
)
