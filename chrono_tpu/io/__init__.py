from chrono_tpu.io.checkpoint import save_checkpoint, load_checkpoint, load_metadata
from chrono_tpu.io.writers import CSVWriter, FrameWriter
from chrono_tpu.io.yaml_spec import load_spec, run_spec, build_mbs, build_dem
