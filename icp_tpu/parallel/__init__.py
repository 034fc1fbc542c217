"""Distributed / mesh-parallel layer (net-new vs the single-threaded reference).

* :mod:`.mesh` — named ``(data, points)`` device mesh + multi-host bring-up.
* :mod:`.converge` — batched registration sharded via GSPMD annotations.
* :mod:`.sharded_nn` — target-sharded exact NN with argmin-combine collectives.
* :mod:`.ring_nn` — ppermute-ring NN: both clouds stay sharded, O(M/P) memory.
* :mod:`.big_cloud` — one giant pair sharded over points with psum-reduced
  Kabsch inside a single ``shard_map``.
"""

from .mesh import (
    DATA_AXIS,
    POINT_AXIS,
    batch_sharding,
    cloud_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
)
from .converge import make_sharded_converge_fn, shard_batch, sharded_converge_shardings
from .ring_nn import ring_nearest_neighbors
from .sharded_nn import sharded_nearest_neighbors
from .big_cloud import big_cloud_converge

__all__ = [
    "DATA_AXIS",
    "POINT_AXIS",
    "batch_sharding",
    "big_cloud_converge",
    "cloud_sharding",
    "initialize_multihost",
    "make_mesh",
    "make_sharded_converge_fn",
    "replicated",
    "ring_nearest_neighbors",
    "shard_batch",
    "sharded_converge_shardings",
    "sharded_nearest_neighbors",
]
