"""Mesh-sharded batched registration (GSPMD path).

The idiomatic scaling recipe: keep the single-program :func:`icp_tpu.driver.
converge` unchanged, annotate the input shardings over a named mesh, and let
XLA's SPMD partitioner insert the collectives.

Two axes (see :mod:`icp_tpu.parallel.mesh`):

* ``data`` — the pair batch is embarrassingly parallel; XLA partitions every
  per-pair computation with zero communication.
* ``points`` — with ``shard_points=True`` the **source** point axis is also
  sharded: each device computes its rows of the (B, N, M) distance tile
  (row-argmin stays local), and the cross-covariance / centroid / cost
  contractions over N become ``psum`` collectives XLA inserts at the einsum
  reductions.  The target stays replicated within a data group (point clouds
  are KBs–MBs; replication is the right trade until the big-cloud regime,
  see ``parallel/big_cloud.py``).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cloud import PointCloud
from ..driver import DriverConfig, converge
from ..geometry import RigidTransform
from ..methods.base import Method
from .mesh import DATA_AXIS, POINT_AXIS


def sharded_converge_shardings(mesh: Mesh, shard_points: bool):
    """(source, target, guess) NamedSharding pytrees for batched inputs."""
    src_points = NamedSharding(
        mesh, P(DATA_AXIS, POINT_AXIS if shard_points else None, None)
    )
    tgt_points = NamedSharding(mesh, P(DATA_AXIS, None, None))
    count = NamedSharding(mesh, P(DATA_AXIS))
    rot = NamedSharding(mesh, P(DATA_AXIS, None, None))
    trans = NamedSharding(mesh, P(DATA_AXIS, None))
    source = PointCloud(points=src_points, count=count)
    target = PointCloud(points=tgt_points, count=count)
    guess = RigidTransform(rotation=rot, translation=trans)
    return source, target, guess


def make_sharded_converge_fn(
    method: Method,
    config: DriverConfig,
    mesh: Mesh,
    shard_points: bool = False,
):
    """Jitted batched ``(source, target, guess) -> (ConvergenceState, state)``
    partitioned over ``mesh``.

    Inputs must carry a leading batch dim divisible by the ``data`` axis
    (and, with ``shard_points``, a source point capacity divisible by the
    ``points`` axis).  Results are batched exactly as the unsharded
    :func:`icp_tpu.driver.converge`.
    """
    src_s, tgt_s, guess_s = sharded_converge_shardings(mesh, shard_points)

    def fn(source: PointCloud, target: PointCloud, guess: RigidTransform):
        return converge(method, source, target, guess, config)

    return jax.jit(
        fn,
        in_shardings=(src_s, tgt_s, guess_s),
        # Leave output shardings to the partitioner (per-pair scalars and
        # transforms are cheap either way).
        out_shardings=None,
    )


def shard_batch(tree, mesh: Mesh, shard_points: bool = False):
    """Device-put a batched (source, target, guess) tuple with the matching
    shardings — the host->mesh transfer analogue of ``ICP::begin``'s cloud
    copy (``icp.h:125-128``)."""
    source, target, guess = tree
    src_s, tgt_s, guess_s = sharded_converge_shardings(mesh, shard_points)
    return (
        jax.device_put(source, src_s),
        jax.device_put(target, tgt_s),
        jax.device_put(guess, guess_s),
    )
