"""Device mesh construction and multi-host bring-up.

The reference is single-threaded, single-process (SURVEY §2.4: no
threads/MPI/NCCL anywhere).  This module is the net-new distributed
substrate: a named ``jax.sharding.Mesh`` with two logical axes —

* ``"data"``  — batched scan pairs (data parallelism over registrations),
* ``"points"`` — points-within-a-cloud (the sequence/context-parallel
  analogue: one big cloud's correspondence problem sharded across devices).

Within a TPU slice the axes map onto ICI; across hosts onto DCN.  All
cross-device movement is expressed through ``NamedSharding``/``shard_map``
so XLA inserts the collectives (psum / all-gather / reduce-scatter).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "points"


def make_mesh(
    data: int | None = None,
    points: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, points)`` mesh over the available devices.

    ``data`` defaults to ``n_devices // points``.  The data axis is placed
    outermost so that, on multi-host topologies, point-sharded collectives
    (the latency-sensitive argmin/psum combines of the correspondence
    kernel) ride ICI within a host group while the embarrassingly-parallel
    data axis spans DCN.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        if n % points != 0:
            raise ValueError(f"{n} devices not divisible by points={points}")
        data = n // points
    if data * points != n:
        raise ValueError(f"mesh {data}x{points} != {n} devices")
    return Mesh(devices.reshape(data, points), (DATA_AXIS, POINT_AXIS))


def initialize_multihost(**kwargs) -> None:
    """Bring up the JAX distributed runtime (multi-host slices / pods).

    Thin wrapper over ``jax.distributed.initialize`` kept here so the
    framework has one bring-up entry point; no-op if already initialized.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def batch_sharding(mesh: Mesh, trailing_dims: int) -> NamedSharding:
    """Sharding for an array whose axis 0 is the pair batch: ``P('data')``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * trailing_dims)))


def cloud_sharding(mesh: Mesh, shard_points: bool) -> NamedSharding:
    """Sharding for batched cloud points ``(B, N, D)``.

    ``shard_points=True`` additionally splits the point axis over the
    ``points`` mesh axis (sequence-parallel mode).
    """
    return NamedSharding(
        mesh, P(DATA_AXIS, POINT_AXIS if shard_points else None, None)
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
