"""Device-mesh helpers: the scale-out layer.

Replaces the reference's intra-node OpenMP + CUDA and inter-node MPI layers
(SURVEY §2 parallelism inventory) with ``jax.sharding`` over an ICI/DCN mesh:
particle-space data parallelism ("dp" axis) shards every (N, …) array; XLA
inserts the collectives (the sort-based broadphase becomes a distributed sort,
gathers become all-gathers of the halo region).  Spatially-aware halo-exchange
sharding lives in chrono_tpu.parallel.domains.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_particles(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every array leaf along its leading (particle) axis; replicate
    scalars and small leaves whose leading dim doesn't divide the mesh."""
    n_dev = mesh.devices.size

    def put(x):
        if (hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % n_dev == 0 and x.shape[0] >= n_dev):
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
