from chrono_tpu.io.checkpoint import save_checkpoint, load_checkpoint, load_metadata
from chrono_tpu.io.writers import CSVWriter, FrameWriter
