from chrono_tpu.models.hmmwv import create_hmmwv
from chrono_tpu.models.rover import create_rover, create_curiosity, set_wheel_speeds, rover_step_scm, Rover
from chrono_tpu.models.sedan import create_sedan
from chrono_tpu.models.polaris import create_polaris
from chrono_tpu.models.decks import (
    DECKS, create_vehicle, create_gator, create_feda, create_uaz,
    create_jeep, create_bmw, create_citybus, create_man, create_kraz,
    build_marder,
)
