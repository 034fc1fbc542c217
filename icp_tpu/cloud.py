"""Masked, padded point-cloud container.

The reference stores clouds as dynamically sized ``Dim x N`` Eigen matrices
(``include/icp/geo.h:26-29``) and physically drops lidar no-return rows
(``common/parse_scan.cpp:37-42``).  XLA compiles one program per shape, so the
TPU-native representation is a fixed-capacity ``(..., N, D)`` array with valid
points packed at the front and a ``count`` of valid points; the boolean mask
is derived from the count.  Padding slots hold zeros.

Packing valid points contiguously (rather than leaving holes) matters for the
``feature_aware`` method, whose feature windows assume angular point ordering
with hard scan edges (``lib/icp/impl/feature_aware.cpp:151-177``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def bucket_capacity(n: int, min_capacity: int = 64) -> int:
    """Smallest power-of-two capacity >= ``n`` (floored at ``min_capacity``).

    Shape bucketing: padding every cloud to a power-of-two capacity maps
    arbitrary input sizes onto O(log N) distinct compiled programs instead
    of one per size — e.g. the reference's scan1/2/3 (953/766/562 valid
    points) all land in the 1024 bucket and share a single executable (and
    a single :mod:`icp_tpu.aot` cache entry).  Padded slots are masked out
    of every reduction (the static-shape contract), pinned by
    ``tests/test_geometry.py::test_capacity_invariance`` — but note that is
    a *tolerance-level* invariance on accelerators, not bit-exactness: a
    different padded capacity can change XLA's reduction tiling/order, so
    results across capacities agree to numerical tolerance, not bitwise
    (ADVICE round 2; the CLI default changed to bucketed capacities in
    round 2 — ``--exact-capacity`` restores the previous padding).
    The XLA compile over the remote TPU tunnel costs minutes; the extra
    padded rows cost microseconds.
    """
    cap = max(int(min_capacity), 1)
    n = int(n)
    while cap < n:
        cap *= 2
    return cap


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Fixed-capacity point cloud: ``points (..., N, D)``, ``count (...,)``.

    ``count`` is a traced int32 scalar (per batch element), so clouds of
    different true sizes share one compiled program as long as the padded
    capacity matches.
    """

    points: Array  # (..., N, D)
    count: Array  # (...,) int32 — number of valid (front-packed) points

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    @property
    def dim(self) -> int:
        return self.points.shape[-1]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.points.shape[:-2]

    @property
    def dtype(self):
        return self.points.dtype

    @property
    def mask(self) -> Array:
        """Boolean validity mask ``(..., N)`` derived from ``count``."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)
        return idx < self.count[..., None]


def from_points(
    points,
    capacity: int | str | None = None,
    dtype=None,
    pad_multiple: int = 8,
) -> PointCloud:
    """Build a cloud from an ``(N, D)`` (or batched) array, padding to capacity.

    ``capacity`` defaults to ``N`` rounded up to ``pad_multiple`` (TPU sublane
    alignment); the string ``"bucket"`` pads to the next power of two instead
    (:func:`bucket_capacity` — different-size inputs share compiled programs).
    Non-finite rows are dropped first for unbatched input, mirroring the
    reference's inf filter (``common/parse_scan.cpp:37-39``).
    """
    pts = np.asarray(points)
    if dtype is not None:
        pts = pts.astype(dtype)
    if pts.ndim == 2:
        finite = np.isfinite(pts).all(axis=-1)
        pts = pts[finite]
        n = pts.shape[0]
        if capacity == "bucket":
            cap = bucket_capacity(n)
        elif capacity is not None:
            cap = capacity
        else:
            cap = max(round_up(n, pad_multiple), pad_multiple)
        if n > cap:
            raise ValueError(f"{n} points exceed capacity {cap}")
        padded = np.zeros((cap, pts.shape[1]), dtype=pts.dtype)
        padded[:n] = pts
        return PointCloud(jnp.asarray(padded), jnp.asarray(n, dtype=jnp.int32))
    raise ValueError("from_points expects an (N, D) array; build batches with jax.tree.map/stack")


def stack(clouds: list[PointCloud]) -> PointCloud:
    """Stack same-capacity clouds into one batched cloud along a new axis 0."""
    caps = {c.capacity for c in clouds}
    if len(caps) != 1:
        cap = max(caps)
        clouds = [pad_to(c, cap) for c in clouds]
    return PointCloud(
        jnp.stack([c.points for c in clouds]),
        jnp.stack([c.count for c in clouds]),
    )


def pad_to(cloud: PointCloud, capacity: int) -> PointCloud:
    """Grow a cloud's padded capacity (no-op if already at capacity)."""
    if cloud.capacity == capacity:
        return cloud
    if cloud.capacity > capacity:
        raise ValueError(f"cannot shrink capacity {cloud.capacity} -> {capacity}")
    pad = [(0, 0)] * (cloud.points.ndim - 2) + [(0, capacity - cloud.capacity), (0, 0)]
    return PointCloud(jnp.pad(cloud.points, pad), cloud.count)


def to_numpy(cloud: PointCloud) -> np.ndarray:
    """Extract the valid points of an unbatched cloud as an ``(n, D)`` array."""
    if cloud.batch_shape:
        raise ValueError("to_numpy expects an unbatched cloud")
    n = int(cloud.count)
    return np.asarray(cloud.points[:n])
