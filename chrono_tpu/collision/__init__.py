from chrono_tpu.collision.cell_list import GridSpec, build_cell_list, cell_index
from chrono_tpu.collision.pipeline import (
    SphereShapes, BoxShapes, ConvexShapes, MeshShapes, CollisionModel,
    Contacts, detect_contacts, contact_rows, nsc_step,
)
from chrono_tpu.collision import narrowphase
from chrono_tpu.collision import ray
