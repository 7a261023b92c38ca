from chrono_tpu.utils.pytree import pytree_dataclass, static_field
