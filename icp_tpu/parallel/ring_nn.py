"""Ring-pipelined exact NN: target shards rotate, memory stays O(M/P).

``parallel.sharded_nn`` all-gathers nothing but still needs every device to
see (dist, idx) partials; ``parallel.big_cloud`` all-gathers the whole
target per iteration — fine while M·D fits per-device HBM.  This module is
the regime beyond that: the target stays sharded FOREVER.  Each of the P
ring steps, every device computes its local queries against the target
shard it currently holds, folds the (min, index) running best, and passes
the shard to its ring neighbor with ``lax.ppermute`` — the classic TPU ring
pipeline (compute overlaps the ICI transfer), with per-device memory
O(N/P + M/P) instead of O(M).

Exactness: ties break to the lower *global* target index independent of
ring visit order — the fold keeps a strictly-smaller distance OR an equal
distance with a smaller global index, and within-shard argmin already
yields the shard's lowest-index minimum.  Bit-equal to the single-device
kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.nn import nearest_neighbors
from .mesh import POINT_AXIS

Array = jax.Array


def ring_nearest_neighbors(
    query: Array,
    targets: Array,
    target_mask: Array | None,
    mesh: Mesh,
) -> tuple[Array, Array]:
    """Exact 1-NN with BOTH clouds sharded over ``points``.

    ``query (N, D)`` and ``targets (M, D)`` / ``target_mask (M,)`` are laid
    out sharded on the ``points`` axis (N and M divisible by the axis size).
    Returns ``(sq_dists (N,), indices (N,) int32)`` sharded like the query —
    identical values to the unsharded kernel.
    """
    n_shards = mesh.shape[POINT_AXIS]
    if query.shape[0] % n_shards or targets.shape[0] % n_shards:
        raise ValueError("point counts must divide the points axis size")
    shard_m = targets.shape[0] // n_shards
    if target_mask is None:
        target_mask = jnp.ones((targets.shape[0],), dtype=bool)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(POINT_AXIS, None), P(POINT_AXIS, None), P(POINT_AXIS)),
        out_specs=(P(POINT_AXIS), P(POINT_AXIS)),
        check_vma=False,
    )
    def _kernel(q_local, tgt_local, mask_local):
        me = jax.lax.axis_index(POINT_AXIS).astype(jnp.int32)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def body(step, carry):
            best_sq, best_idx, tgt_cur, mask_cur = carry
            # After `step` rotations along +1, the shard now held here
            # originated at (me - step) mod P.
            owner = jnp.mod(me - step, n_shards)
            sq, idx = nearest_neighbors(q_local, tgt_cur, mask_cur)
            gidx = idx + owner * shard_m
            better = (sq < best_sq) | ((sq == best_sq) & (gidx < best_idx))
            best_sq = jnp.where(better, sq, best_sq)
            best_idx = jnp.where(better, gidx, best_idx)
            # Rotate the shard to the next device (skipped after last fold).
            tgt_next = jax.lax.ppermute(tgt_cur, POINT_AXIS, perm)
            mask_next = jax.lax.ppermute(mask_cur, POINT_AXIS, perm)
            return best_sq, best_idx, tgt_next, mask_next

        n_local = q_local.shape[0]
        init = (
            jnp.full((n_local,), jnp.inf, dtype=q_local.dtype),
            jnp.full((n_local,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
            tgt_local,
            mask_local,
        )
        best_sq, best_idx, _, _ = jax.lax.fori_loop(0, n_shards, body, init)
        return best_sq, best_idx

    return _kernel(query, targets, target_mask)


def ring_nn_with_points(
    q_local: Array,
    tgt_local: Array,
    mask_local: Array,
    n_shards: int,
) -> tuple[Array, Array, Array]:
    """Ring-fold NN returning matched COORDINATES as well — for callers that
    need the correspondence values (e.g. the rigid solve) while the target
    stays sharded.  Must be called INSIDE a ``shard_map`` over ``points``.

    Returns ``(sq (N_local,), global_idx (N_local,) i32, matched (N_local, D))``.
    """
    shard_m = tgt_local.shape[0]
    me = jax.lax.axis_index(POINT_AXIS).astype(jnp.int32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def body(step, carry):
        best_sq, best_idx, best_pt, tgt_cur, mask_cur = carry
        owner = jnp.mod(me - step, n_shards)
        sq, idx = nearest_neighbors(q_local, tgt_cur, mask_cur)
        gidx = idx + owner * shard_m
        cand_pt = jnp.take_along_axis(tgt_cur, idx[:, None], axis=0)
        better = (sq < best_sq) | ((sq == best_sq) & (gidx < best_idx))
        best_sq = jnp.where(better, sq, best_sq)
        best_idx = jnp.where(better, gidx, best_idx)
        best_pt = jnp.where(better[:, None], cand_pt, best_pt)
        tgt_next = jax.lax.ppermute(tgt_cur, POINT_AXIS, perm)
        mask_next = jax.lax.ppermute(mask_cur, POINT_AXIS, perm)
        return best_sq, best_idx, best_pt, tgt_next, mask_next

    n_local = q_local.shape[0]
    init = (
        jnp.full((n_local,), jnp.inf, dtype=q_local.dtype),
        jnp.full((n_local,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
        jnp.zeros_like(q_local),
        tgt_local,
        mask_local,
    )
    best_sq, best_idx, best_pt, _, _ = jax.lax.fori_loop(0, n_shards, body, init)
    return best_sq, best_idx, best_pt
