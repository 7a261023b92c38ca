from chrono_tpu.io.checkpoint import save_checkpoint, load_checkpoint, load_metadata
from chrono_tpu.io.dem_checkpoint import parse_dem_checkpoint, dem_system_from_checkpoint
from chrono_tpu.io.writers import CSVWriter, FrameWriter
from chrono_tpu.io.yaml_spec import load_spec, run_spec, build_mbs, build_dem
from chrono_tpu.io.urdf import parse_urdf, build_from_urdf
from chrono_tpu.io.archive import archive_out, archive_in
from chrono_tpu.io.export import (
    write_ply_points, write_obj_mesh, write_vtk_structured_grid,
    export_particle_sequence,
)
