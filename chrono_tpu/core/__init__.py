from chrono_tpu.core import quaternion, frame, functions
from chrono_tpu.core.frame import Frame, skew
