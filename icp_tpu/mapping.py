"""Local-map maintenance and scan-to-map odometry.

Scan-to-scan chaining (``odometry.chain_scans``) accumulates drift linearly
in the number of steps; production LiDAR odometry registers each scan
against a **local map** aggregated from recent keyframes instead, anchoring
every pose to a wider, denser reference.

Division of labor, TPU-style:

* map maintenance (transform keyframe clouds to the world frame, merge,
  voxel-downsample, pad to a fixed capacity) is irregular, data-dependent
  host work — NumPy on the host, amortized once per keyframe;
* registration of each scan against the (fixed-capacity) map is the usual
  compiled converge — one jit per (scan capacity, map capacity) pair.

``voxel_downsample`` keeps one representative point (the centroid of the
voxel's members) per occupied cell — the standard grid filter.

Method recommendation: use the ``robust`` (Welsch) method for scan-to-map.
The aggregated map always contains regions the current scan does not
observe; hard-overlap methods (``trimmed``) drag poses toward that
non-overlap and the error feeds back into the map (measured on a noisy
25-scan loop: trimmed end drift 1.13 units vs robust 0.005).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import geometry
from .cloud import from_points
from .driver import DriverConfig, make_converge_fn
from .methods.base import Method


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Centroid-per-voxel grid filter ``(n, D) -> (n', D)`` (host-side)."""
    pts = np.asarray(points)
    if len(pts) == 0:
        return pts
    keys = np.floor(pts / voxel_size).astype(np.int64)
    # Lexicographic unique over voxel coordinates.
    order = np.lexsort(keys.T[::-1])
    keys_sorted = keys[order]
    pts_sorted = pts[order]
    new_cell = np.any(np.diff(keys_sorted, axis=0) != 0, axis=1)
    starts = np.concatenate([[0], np.nonzero(new_cell)[0] + 1])
    ends = np.concatenate([starts[1:], [len(pts_sorted)]])
    sums = np.add.reduceat(pts_sorted, starts, axis=0)
    counts = (ends - starts)[:, None].astype(pts.dtype)
    return (sums / counts).astype(pts.dtype)


@dataclasses.dataclass
class LocalMap:
    """World-frame aggregated map with bounded size."""

    voxel_size: float
    capacity: int
    points: np.ndarray  # (n, D) world-frame

    def merged_with(self, scan_world: np.ndarray) -> "LocalMap":
        merged = np.concatenate([self.points, scan_world]) if len(self.points) else scan_world
        merged = voxel_downsample(merged, self.voxel_size)
        if len(merged) > self.capacity:
            # Keep the points nearest the newest scan's centroid (local map).
            center = scan_world.mean(axis=0)
            d = np.linalg.norm(merged - center, axis=1)
            merged = merged[np.argsort(d, kind="stable")[: self.capacity]]
        return LocalMap(self.voxel_size, self.capacity, merged)


def scan_to_map_odometry(
    scans,
    method: Method,
    config: DriverConfig,
    voxel_size: float = 0.1,
    map_capacity: int = 8192,
    keyframe_translation: float = 0.5,
    keyframe_angle: float = 0.1,
    metrics=None,
):
    """Online scan-to-map odometry; yields ``(pose, is_keyframe, result)``.

    Each scan registers scan->map (the map is a world-frame cloud, so the
    converged transform IS the world pose); keyframes fold their world-frame
    points into the map.  One compiled converge per (scan, map) capacity
    pair — the map cloud is padded to ``map_capacity`` so the program is
    stable once the map fills.
    """
    import jax.numpy as jnp

    fn = make_converge_fn(method, config)  # jit specializes per shape itself
    local_map: LocalMap | None = None
    kf_pose = None
    prev_pose = None
    dim = None

    for t, scan in enumerate(scans):
        if local_map is None:
            dim = scan.dim
            pts = np.asarray(scan.points[: int(scan.count)])
            # Build through merged_with so the initial map also respects
            # map_capacity (a dense first scan can exceed it on its own).
            local_map = LocalMap(
                voxel_size, map_capacity, np.zeros((0, dim), dtype=pts.dtype)
            ).merged_with(pts)
            kf_pose = geometry.identity(dim, dtype=scan.dtype)
            prev_pose = kf_pose
            yield kf_pose, True, None
            continue

        map_cloud = from_points(
            local_map.points, capacity=map_capacity, dtype=np.asarray(scan.points).dtype
        )
        # Seed from the PREVIOUS scan's pose — strictly fresher than the
        # keyframe pose, so the initial-guess error is bounded by one scan's
        # motion rather than a whole keyframe interval (sustained turns
        # would otherwise push the seed outside ICP's basin).
        result, _ = fn(scan, map_cloud, prev_pose)
        pose = result.transform
        prev_pose = pose

        delta_t = float(jnp.linalg.norm(pose.translation - kf_pose.translation))
        delta_a = abs(
            float(
                geometry.rotation_angle(
                    jnp.matmul(
                        pose.rotation,
                        jnp.swapaxes(kf_pose.rotation, -1, -2),
                        precision=geometry.HIGHEST,
                    )
                )
            )
        )
        is_kf = delta_t > keyframe_translation or delta_a > keyframe_angle
        if metrics is not None:
            metrics.log(
                "scan_to_map_step",
                scan=t,
                iterations=int(result.iteration_count),
                cost=float(result.cost),
                keyframe=is_kf,
                map_points=len(local_map.points),
            )
        if is_kf:
            world_pts = np.asarray(
                geometry.apply(pose, scan.points)
            )[: int(scan.count)]
            local_map = local_map.merged_with(world_pts)
            kf_pose = pose
        yield pose, is_kf, result
