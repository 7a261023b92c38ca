from chrono_tpu.utils.pytree import pytree_dataclass, static_field
from chrono_tpu.utils import samplers, validation, timers, filters
