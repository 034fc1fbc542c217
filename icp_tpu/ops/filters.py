"""Point-cloud preprocessing filters (net-new vs the reference).

Production ingestion pipelines clean clouds before registration; these
filters follow the framework's static-shape discipline (fixed capacity,
front-compacted validity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cloud import PointCloud

Array = jax.Array


def remove_statistical_outliers(
    cloud: PointCloud, k: int = 8, std_ratio: float = 2.0
) -> PointCloud:
    """Statistical outlier removal: mask points whose mean k-NN distance
    exceeds ``mean + std_ratio * std`` of the cloud's distribution.

    The PCL-style preprocessing filter, static-shape: the result keeps the
    same capacity with a tightened validity... except PointCloud validity is
    count-based (front-packed), so surviving points are COMPACTED to the
    front via a stable permutation (outliers sorted to the back) and the
    count reduced.  Batched over leading dims.
    """
    from ..ops.nn import pairwise_sq_dists

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    points, mask = cloud.points, cloud.mask
    capacity = points.shape[-2]
    if capacity < 2:
        return cloud  # no neighbors to reason about
    k = min(k, capacity - 1)
    d2 = pairwise_sq_dists(points, points)
    big = jnp.asarray(jnp.finfo(points.dtype).max, dtype=points.dtype)
    d2 = jnp.where(mask[..., None, :], d2, big)
    # k+1 nearest including self (distance 0), drop self.
    neg_top, _ = jax.lax.top_k(-d2, k + 1)
    knn_d = jnp.sqrt(jnp.maximum(-neg_top[..., 1:], 0.0))  # (..., N, k)
    # Clouds with count <= k have fewer than k real neighbors: slots beyond
    # (count - 1) hold masked-sentinel distances and must not enter the
    # statistics (they would flatten them and silently disable the filter).
    n_neighbors = jnp.maximum(cloud.count - 1, 0)  # (...,)
    slot_valid = (
        jnp.arange(k) < n_neighbors[..., None, None]
    )  # (..., 1, k) broadcast over points
    denom = jnp.maximum(n_neighbors, 1).astype(points.dtype)
    mean_d = jnp.where(slot_valid, knn_d, 0.0).sum(axis=-1) / denom[..., None]

    w = mask.astype(points.dtype)
    n = jnp.maximum(w.sum(axis=-1), 1.0)
    mu = (mean_d * w).sum(axis=-1) / n
    var = (((mean_d - mu[..., None]) ** 2) * w).sum(axis=-1) / n
    thresh = mu + std_ratio * jnp.sqrt(var)

    keep = mask & (mean_d <= thresh[..., None])
    # Stable front-compaction: order by (outlier?, original index).
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    packed = jnp.take_along_axis(points, order[..., None], axis=-2)
    count = keep.sum(axis=-1).astype(jnp.int32)
    zeroed = jnp.where(
        (jnp.arange(points.shape[-2]) < count[..., None])[..., None], packed, 0.0
    )
    return PointCloud(zeroed, count)
