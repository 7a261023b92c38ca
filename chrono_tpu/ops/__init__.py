from chrono_tpu.ops import pallas
