"""2D ``feature_aware`` ICP.

TPU-native re-design of ``lib/icp/impl/feature_aware.cpp``.  Builds on
trimmed ICP: correspondences minimize a blend of a max-normalized
point-to-point distance and a max-normalized **feature** distance
(``feature_aware.cpp:128-148``), followed by the same sort-and-trim and
rigid solve.

Feature vectors (``feature_aware.cpp:151-177``): scans are assumed ordered
by bearing angle; for point ``i`` with centroid-range ``r_i = |p_i - c|``,
the feature vector stacks ``r_j - r_i`` over a window of
``symmetric_neighbors`` points on each side.  Two edge quirks reproduced:

* Left-side entries are **front-compacted**: for ``i < symmetric_neighbors``
  the ``i`` available left differences occupy slots ``0..i-1`` (not
  right-aligned at the window end), and the rest stay zero.
* Right-side entries occupy slots ``sn..`` and are zero past the scan end.

Features are computed **once** in setup — from the source at its *initial
guess* pose and from the target (``feature_aware.cpp:50-53``) — and reused
every iteration, as is the normalized feature-distance matrix.

Both normalizations divide by the matrix max only when it exceeds ``1e-6``
(``feature_aware.cpp:24,54-57,130-133``).  The point-distance matrix holds
**Euclidean** (not squared) distances (``compute_norm_dists`` calls
``.norm()``, ``feature_aware.h:40-46``).

The feature-distance matrix is an (N, M) reduction over the 2*sn feature
axis — a genuine MXU matmul via the ``|a|^2 - 2ab + |b|^2`` expansion
(K = 2*sn), clamped at zero before the sqrt.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry
from ..cloud import PointCloud
from ..config import Config
from ..geometry import HIGHEST, RigidTransform, masked_centroid
from ..ops.rigid_fit import fit_rigid_indexed
from .base import Method
from .trimmed import trim_weights

Array = jax.Array

DEFAULT_OVERLAP_RATE = 0.9  # ``feature_aware.cpp:21``
DEFAULT_FEATURE_WEIGHT = 0.7  # ``feature_aware.cpp:22``
DEFAULT_SYMMETRIC_NEIGHBORS = 10  # ``feature_aware.cpp:23``
MIN_NORM_THRESHOLD = 1e-6  # ``feature_aware.cpp:24``


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeatureAwareState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    feature_dists: Array  # (..., N, M) normalized feature distances, fixed
    match_idx: Array  # (..., N) int32
    match_cost: Array  # (..., N) blended cost (+inf on padding)


def compute_features(points: Array, mask: Array, count: Array, sn: int) -> Array:
    """Per-point feature vectors ``(..., N, 2*sn)``.

    Vectorized equivalent of ``FeatureAware::compute_features``
    (``feature_aware.cpp:151-177``) with front-packed valid points: slot
    ``s < sn`` holds ``r_j - r_i`` for ``j = max(0, i-sn) + s`` when
    ``j < i``; slot ``s >= sn`` holds it for ``j = i + 1 + (s - sn)`` when
    ``j < n``; zeros elsewhere.
    """
    n_pad = points.shape[-2]
    dtype = points.dtype
    centroid = masked_centroid(points, mask)
    r = jnp.linalg.norm(points - centroid[..., None, :], axis=-1)  # (..., N)
    r = jnp.where(mask, r, 0.0)

    i_idx = jnp.arange(n_pad, dtype=jnp.int32)[:, None]  # (N, 1)
    s_idx = jnp.arange(2 * sn, dtype=jnp.int32)[None, :]  # (1, 2sn)
    lower = jnp.maximum(i_idx - sn, 0)
    left_j = lower + s_idx  # valid where s < sn and left_j < i
    right_j = i_idx + 1 + (s_idx - sn)  # valid where s >= sn and right_j < n
    is_left = s_idx < sn
    j_idx = jnp.where(is_left, left_j, right_j)  # (N, 2sn)
    n_valid = count[..., None, None]
    valid = jnp.where(
        is_left,
        left_j < i_idx,
        right_j < n_valid,
    )
    valid = valid & (i_idx < n_valid) & (j_idx >= 0) & (j_idx < n_pad)
    j_safe = jnp.clip(j_idx, 0, n_pad - 1)

    r_j = _batched_take(r, j_safe)  # (..., N, 2sn)
    feats = (r_j - r[..., :, None]) * valid.astype(dtype)
    return feats


def _batched_take(r: Array, j: Array) -> Array:
    """Gather ``r[..., j]`` for a shared (N, 2sn) index table."""
    flat = j.reshape(-1)
    out = jnp.take(r, flat, axis=-1)
    return out.reshape(r.shape[:-1] + j.shape)


def pairwise_euclid(a: Array, b: Array, clamp: bool = True) -> Array:
    """(..., N, K) x (..., M, K) -> (..., N, M) Euclidean distances via matmul."""
    aa = jnp.sum(a * a, axis=-1)
    bb = jnp.sum(b * b, axis=-1)
    ab = jnp.einsum("...nk,...mk->...nm", a, b, precision=HIGHEST)
    sq = aa[..., :, None] + bb[..., None, :] - 2.0 * ab
    if clamp:
        sq = jnp.maximum(sq, 0.0)
    return jnp.sqrt(sq)


def _normalize_by_max(dists: Array, valid: Array) -> Array:
    """Divide by the max over valid entries when it exceeds 1e-6
    (``feature_aware.cpp:53-57,130-133``)."""
    neg = jnp.where(valid, dists, -jnp.inf)
    mx = jnp.max(neg, axis=(-2, -1), keepdims=True)
    scale = jnp.where(mx > MIN_NORM_THRESHOLD, 1.0 / jnp.where(mx > 0, mx, 1.0), 1.0)
    return dists * scale


def create(config: Config) -> Method:
    overlap_rate = config.get("overlap_rate", DEFAULT_OVERLAP_RATE)
    feature_weight = config.get("feature_weight", DEFAULT_FEATURE_WEIGHT)
    symmetric_neighbors = config.get("symmetric_neighbors", DEFAULT_SYMMETRIC_NEIGHBORS)
    neighbor_weight = 1.0 - feature_weight  # ``feature_aware.cpp:29``

    def _valid_matrix(src: PointCloud, tgt: PointCloud) -> Array:
        return src.mask[..., :, None] & tgt.mask[..., None, :]

    def _compute_matches(a_current: Array, state_feats: Array, src: PointCloud, tgt: PointCloud):
        from ..ops.nn import pairwise_sq_dists

        valid = _valid_matrix(src, tgt)
        dists = jnp.sqrt(pairwise_sq_dists(a_current, tgt.points))
        dists = _normalize_by_max(dists, valid)
        blended = neighbor_weight * dists + feature_weight * state_feats
        inf = jnp.asarray(jnp.inf, dtype=blended.dtype)
        blended = jnp.where(valid, blended, inf)
        idx = jnp.argmin(blended, axis=-1).astype(jnp.int32)
        cost = jnp.min(blended, axis=-1)
        cost = jnp.where(src.mask, cost, inf)
        return idx, cost

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> FeatureAwareState:
        a_current = geometry.apply(guess, source.points)
        a_feats = compute_features(a_current, source.mask, source.count, symmetric_neighbors)
        b_feats = compute_features(target.points, target.mask, target.count, symmetric_neighbors)
        fdists = pairwise_euclid(a_feats, b_feats)
        fdists = _normalize_by_max(fdists, _valid_matrix(source, target))
        idx, cost = _compute_matches(a_current, fdists, source, target)
        return FeatureAwareState(guess, source, target, fdists, idx, cost)

    def iterate(state: FeatureAwareState) -> FeatureAwareState:
        src, tgt = state.source, state.target
        a_current = geometry.apply(state.transform, src.points)
        idx, cost = _compute_matches(a_current, state.feature_dists, src, tgt)
        weights = trim_weights(cost, src.count, overlap_rate, src.dtype)
        step = fit_rigid_indexed(a_current, tgt.points, idx, weights)
        return dataclasses.replace(
            state,
            transform=geometry.compose(step, state.transform),
            match_idx=idx,
            match_cost=cost,
        )

    def cost(state: FeatureAwareState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    return Method(name="feature_aware", dim=2, init=init, iterate=iterate, cost=cost)
