"""2D ``trimmed`` ICP (Chetverikov et al., Trimmed ICP).

TPU-native re-design of ``lib/icp/impl/trimmed.cpp``.  The reference does a
brute-force O(n*m) correspondence scan storing **squared** distances
(``trimmed.cpp:95-109``), sorts matches by cost and keeps the best
``new_n = max(1, floor(overlap_rate * n))`` (``trimmed.cpp:55-58``), then
runs the same centered cross-covariance + det-fixed SVD as vanilla on the
kept subset (``trimmed.cpp:68-92``).

Sorting and physically gathering a dynamically-sized subset is hostile to
XLA's static shapes.  Instead we compute each match's **rank** among the
sorted costs (a stable argsort-of-argsort — ties break toward the lower
source index, matching a stable sort; ``std::sort``'s tie order is
unspecified, so any consistent rule is within-spec) and feed 0/1 weights
``rank < new_n`` into the weighted rigid solve.  The selected set is
identical to the reference's, and the weighted sums equal its subset sums up
to fp reassociation.

Unlike ``vanilla``, matches here are recomputed from the **transformed**
source every iteration (``trimmed.cpp:40-43``), so this is the method whose
correspondences actually track the registration.

``calculate_cost`` for this method sums the *untrimmed* squared distances of
all n matches (the sort permutes but does not drop entries before the base
class reads them), i.e. the RMS nearest-neighbor distance.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry
from ..cloud import PointCloud
from ..config import Config
from ..geometry import RigidTransform
from ..ops.nn import nearest_neighbors
from ..ops.rigid_fit import fit_rigid_indexed
from .base import Method

Array = jax.Array

DEFAULT_OVERLAP_RATE = 0.9  # ``trimmed.cpp:28``


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrimmedState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    match_idx: Array  # (..., N) int32
    match_cost: Array  # (..., N) squared NN distance (+inf on padding)


def stable_ranks(costs: Array) -> Array:
    """Stable ascending rank of each cost (ties -> lower index ranks first).

    Two equivalent implementations, selected by size (measured on TPU at
    (256, 1024): compare 1.03 ms vs argsort 1.94 ms — sorting networks are
    slow on the VPU, while the O(N^2) comparison matrix is two cheap
    broadcast passes of the same shape class as the distance matrix the
    method just computed):

    * compare-count: ``rank_i = #{j: c_j < c_i} + #{j < i: c_j == c_i}``
    * argsort-of-argsort (permutation inversion) for large N where O(N^2)
      memory would dominate.
    """
    n = costs.shape[-1]
    if n <= 4096:
        c_i = costs[..., :, None]
        c_j = costs[..., None, :]
        idx = jnp.arange(n, dtype=jnp.int32)
        less = (c_j < c_i).sum(-1)
        eq_lower = ((c_j == c_i) & (idx[None, :] < idx[:, None])).sum(-1)
        return (less + eq_lower).astype(jnp.int32)
    order = jnp.argsort(costs, axis=-1, stable=True)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=order.dtype), order.shape)
    ranks = jnp.put_along_axis(
        jnp.zeros_like(order), order, iota, axis=-1, inplace=False
    )
    return ranks.astype(jnp.int32)


def trim_weights(
    costs: Array,
    valid_count: Array,
    overlap_rate: float,
    dtype,
    selector: str = "auto",
) -> Array:
    """0/1 weights selecting the ``max(1, floor(overlap_rate * n))`` smallest costs.

    ``costs`` must be +inf at padded slots so they rank last.  ``valid_count``
    is the (traced) number of valid source points n.

    ``selector`` picks how the keep-smallest set is found — both produce the
    exact same weights (equality-tested in ``tests/test_select.py``):

    * ``"radix"`` — bitwise binary search for the threshold value then a
      cumsum over boundary ties (:mod:`icp_tpu.ops.select`), O(32 N) work
      instead of the rank matrix's O(N^2); the default everywhere.  Measured
      on the real chip at the bench shape (B, N) = (1024, 1024) f32: full
      trimmed iterate 48.1 -> 35.8 ms (1.34x) — the O(N^2) rank pass was the
      iterate's second-largest phase (BASELINE.md "Radix-select trim").
    * ``"rank"`` — O(N^2) compare-count stable ranks (round-1 path), kept as
      the oracle for equality tests.
    """
    keep = jnp.floor(
        jnp.asarray(overlap_rate, dtype=dtype) * valid_count.astype(dtype)
    ).astype(jnp.int32)
    keep = jnp.maximum(keep, 1)  # ``trimmed.cpp:58``
    if selector == "auto":
        selector = "radix"
    if selector == "radix":
        from ..ops.select import select_smallest_weights

        selected = select_smallest_weights(costs, keep, dtype)
    elif selector == "rank":
        ranks = stable_ranks(costs)
        selected = (ranks < keep[..., None]).astype(dtype)
    else:
        raise ValueError(f"unknown selector {selector!r}")
    # Padded slots (cost +inf) can only be selected when the cloud has no
    # valid points at all (keep's floor of 1); zero them so an empty cloud
    # yields an identity step (documented deviation, as in trimmed_3d)
    # instead of dragging a padding point onto the target.
    return selected * jnp.isfinite(costs).astype(dtype)


def _compute_matches(a_current: Array, target: PointCloud, source_mask: Array):
    sq, idx = nearest_neighbors(a_current, target.points, target.mask)
    inf = jnp.asarray(jnp.inf, dtype=sq.dtype)
    sq = jnp.where(source_mask, sq, inf)
    return idx, sq


def create(config: Config) -> Method:
    overlap_rate = config.get("overlap_rate", DEFAULT_OVERLAP_RATE)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> TrimmedState:
        a_current = geometry.apply(guess, source.points)
        idx, sq = _compute_matches(a_current, target, source.mask)
        return TrimmedState(guess, source, target, idx, sq)

    def iterate(state: TrimmedState) -> TrimmedState:
        src, tgt = state.source, state.target
        a_current = geometry.apply(state.transform, src.points)
        idx, sq = _compute_matches(a_current, tgt, src.mask)
        weights = trim_weights(sq, src.count, overlap_rate, src.dtype)
        step = fit_rigid_indexed(a_current, tgt.points, idx, weights)
        return dataclasses.replace(
            state,
            transform=geometry.compose(step, state.transform),
            match_idx=idx,
            match_cost=sq,
        )

    def cost(state: TrimmedState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    return Method(name="trimmed", dim=2, init=init, iterate=iterate, cost=cost)
