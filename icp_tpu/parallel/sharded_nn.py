"""Mesh-sharded exact nearest-neighbor search (big-cloud mode).

The reference's largest "sequence" is a 10,720-point cloud walked serially
through one k-d tree (SURVEY §5).  Here a cloud too large for one chip is
sharded over the ``points`` mesh axis: every device owns a contiguous shard
of the **target** points, computes the row-minima of its local distance
tile, and an argmin-combine collective merges the per-shard partials —
a ring/all-reduce over correspondence partials rather than attention blocks.

Collective cost per query row is O(mesh_points) scalars (one (dist, idx)
pair per shard), negligible next to the O(M/P) local tile compute, so
scaling efficiency stays near-linear until shards get tiny.

Tie-breaking matches the single-device kernel (``icp_tpu/ops/nn.py``):
ties go to the lower *global* target index.  Shards hold ascending global
index ranges and the gather stacks them in axis order, so a first-occurrence
argmin over the stacked partials reproduces the single-device result bit
for bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.nn import masked_min_with_index, nearest_neighbors
from .mesh import POINT_AXIS

Array = jax.Array


def sharded_nearest_neighbors(
    query: Array,
    targets: Array,
    target_mask: Array | None,
    mesh: Mesh,
) -> tuple[Array, Array]:
    """Exact 1-NN with the target cloud sharded over the ``points`` axis.

    ``query (N, D)`` is replicated; ``targets (M, D)`` and ``target_mask
    (M,)`` are laid out sharded on ``points``.  Returns replicated
    ``(sq_dists (N,), indices (N,) int32)`` identical to
    :func:`icp_tpu.ops.nn.nearest_neighbors` on the unsharded arrays.
    """
    m = targets.shape[0]
    n_shards = mesh.shape[POINT_AXIS]
    if m % n_shards != 0:
        raise ValueError(f"target capacity {m} not divisible by {n_shards} shards")
    shard_m = m // n_shards

    if target_mask is None:
        target_mask = jnp.ones((m,), dtype=bool)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(POINT_AXIS, None), P(POINT_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _kernel(q, tgt_local, mask_local):
        # Local tile: (N, M/P) distances + first-occurrence argmin.
        sq_local, idx_local = nearest_neighbors(q, tgt_local, mask_local)
        offset = jax.lax.axis_index(POINT_AXIS).astype(jnp.int32) * shard_m
        gidx_local = idx_local + offset

        # Argmin-combine across the points axis: gather the per-shard
        # (dist, idx) partials — shard order == ascending global index — and
        # take the first-occurrence minimum.
        sq_all = jax.lax.all_gather(sq_local, POINT_AXIS)  # (P, N)
        idx_all = jax.lax.all_gather(gidx_local, POINT_AXIS)  # (P, N)
        # First-occurrence min over shards == lower shard == lower global
        # index on ties (shards hold ascending index ranges).
        return masked_min_with_index(sq_all, idx_all, axis=0)

    return _kernel(query, targets, target_mask)
