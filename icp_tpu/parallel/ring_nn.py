"""Ring-pipelined exact NN: target shards rotate, memory stays O(M/P).

``parallel.sharded_nn`` all-gathers nothing but still needs every device to
see (dist, idx) partials; ``parallel.big_cloud`` all-gathers the whole
target per iteration — fine while M·D fits per-device HBM.  This module is
the regime beyond that: the target stays sharded FOREVER.  Each device
folds its local queries against the target shard it currently holds, then
passes the shard to its ring neighbor with ``lax.ppermute`` — the classic
TPU ring pipeline (compute overlaps the ICI transfer), with per-device
memory O(N/P + M/P) instead of O(M).

(P−1 rotations would suffice in principle — the last fold needs no trailing
transfer — but consuming loop-carried ppermute outputs AFTER a
``fori_loop`` miscompiles under shard_map in this JAX version (verified:
loop-exit values are individually correct, yet the fused program folds the
wrong winner on ties).  All folds therefore stay inside the loop; the final
rotation's output is discarded — one extra shard transfer per call, ~1/P of
ring traffic.

Workaround provenance, for deliberate retirement: observed under
**jax 0.9.0** (jaxlib 0.9.0, PJRT TPU plugin) during round-1 bring-up of
this module; ``scripts/repro_ppermute_fori_miscompile.py`` is the minimal
self-contained upstream repro (exit 1 when the miscompile is present), and
``tests/test_parallel.py::test_ring_nn_fori_workaround_canary`` pins both
variants' behavior on the CPU mesh so a JAX upgrade that changes either
side is flagged.  Retire the extra rotation only after the repro passes on
the REAL multi-device TPU backend for the new version.)

Exactness: for FINITE inputs, bit-equal to the single-device kernel — ties
break to the lower *global* target index independent of ring visit order
(the fold keeps a strictly-smaller distance OR an equal distance with a
smaller global index, and within-shard argmin already yields the shard's
lowest-index minimum).  NaN coordinates are a documented deviation: the
fold drops NaN distances (returns +inf / INT32_MAX) where ``jnp.argmin``
would propagate the NaN — keep inputs finite (the cloud layer masks
non-finite points on ingestion).
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


def _ring_fold(
    q_local: Array,
    tgt_local: Array,
    mask_local: Array,
    n_shards: int,
    with_points: bool,
):
    """Shared ring fold: returns ``(sq, global_idx[, matched_points])``.

    Must run INSIDE a ``shard_map`` over ``points``.  Performs ``n_shards``
    folds and ``n_shards`` rotations (see module doc for why the last,
    redundant rotation is kept).
    """
    shard_m = tgt_local.shape[0]
    me = jax.lax.axis_index(POINT_AXIS).astype(jnp.int32)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    n_local = q_local.shape[0]

    def fold(step, best, tgt_cur, mask_cur):
        best_sq, best_idx, best_pt = best
        owner = jnp.mod(me - step, n_shards)
        sq, idx = nearest_neighbors(q_local, tgt_cur, mask_cur)
        gidx = idx + owner * shard_m
        better = (sq < best_sq) | ((sq == best_sq) & (gidx < best_idx))
        best_sq = jnp.where(better, sq, best_sq)
        best_idx = jnp.where(better, gidx, best_idx)
        if with_points:
            cand_pt = jnp.take_along_axis(tgt_cur, idx[:, None], axis=0)
            best_pt = jnp.where(better[:, None], cand_pt, best_pt)
        return best_sq, best_idx, best_pt

    def body(step, carry):
        best, tgt_cur, mask_cur = carry
        best = fold(step, best, tgt_cur, mask_cur)
        tgt_next = jax.lax.ppermute(tgt_cur, POINT_AXIS, perm)
        mask_next = jax.lax.ppermute(mask_cur, POINT_AXIS, perm)
        return best, tgt_next, mask_next

    init_best = (
        jnp.full((n_local,), jnp.inf, dtype=q_local.dtype),
        jnp.full((n_local,), jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
        jnp.zeros_like(q_local) if with_points else jnp.zeros((0,), dtype=q_local.dtype),
    )
    (best_sq, best_idx, best_pt), _, _ = jax.lax.fori_loop(
        0, n_shards, body, (init_best, tgt_local, mask_local)
    )
    if with_points:
        return best_sq, best_idx, best_pt
    return best_sq, best_idx


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
    identical values to the unsharded kernel (finite inputs; see module doc).
    """
    n_shards = mesh.shape[POINT_AXIS]
    if query.shape[0] % n_shards or targets.shape[0] % n_shards:
        raise ValueError("point counts must divide the points axis size")
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
        return _ring_fold(q_local, tgt_local, mask_local, n_shards, with_points=False)

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
    return _ring_fold(q_local, tgt_local, mask_local, n_shards, with_points=True)
