from chrono_tpu.parallel.mesh import make_mesh, shard_particles, replicate
from chrono_tpu.parallel.domains import (
    SlabSpec, distribute, make_exchange, make_sharded_dem_advance,
)
