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

    points, mask = cloud.points, cloud.mask
    k = min(k, points.shape[-2] - 1) or 1
    d2 = pairwise_sq_dists(points, points)
    big = jnp.asarray(jnp.finfo(points.dtype).max, dtype=points.dtype)
    d2 = jnp.where(mask[..., None, :], d2, big)
    # k+1 nearest including self (distance 0), drop self.
    neg_top, _ = jax.lax.top_k(-d2, k + 1)
    knn_d = jnp.sqrt(jnp.maximum(-neg_top[..., 1:], 0.0))  # (..., N, k)
    mean_d = knn_d.mean(axis=-1)

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
