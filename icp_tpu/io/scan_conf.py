"""Polar lidar sweep (.conf) ingestion — the rosbag-extraction format.

The reference's ``script/rosbag_extract.py:111-119`` exports LaserScan
sweeps as ``key = value`` conf files: ``angle_min/angle_max/
angle_increment/length/range_min/range_max`` followed by ``i = range_i``
lines.  This module reads that format and converts to Cartesian clouds:
``(r_i cos(angle_min + i*increment), r_i sin(...))`` with out-of-range and
non-finite returns masked out (the polar analogue of the CSV inf filter,
``common/parse_scan.cpp:37-39``).
"""

from __future__ import annotations


import numpy as np

from ..cloud import PointCloud, from_points


def parse_sweep_conf(path: str) -> dict:
    """Parse a sweep conf file into its header fields + ranges array."""
    header: dict[str, float] = {}
    ranges: dict[int, float] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            key, _, value = line.partition("=")
            key = key.strip()
            value = value.strip()
            if key.isdigit():
                ranges[int(key)] = float(value)
            else:
                header[key] = float(value)
    length = int(header.get("length", len(ranges)))
    r = np.full(length, np.inf)
    for i, v in ranges.items():
        if 0 <= i < length:
            r[i] = v
    return {**header, "ranges": r}


def sweep_to_points(sweep: dict) -> np.ndarray:
    """Convert a parsed sweep to an ``(n, 2)`` array of valid returns."""
    r = sweep["ranges"]
    n = len(r)
    inc = sweep.get(
        "angle_increment",
        (sweep["angle_max"] - sweep["angle_min"]) / max(n - 1, 1),
    )
    angles = sweep["angle_min"] + inc * np.arange(n)
    valid = np.isfinite(r)
    if "range_min" in sweep:
        valid &= r >= sweep["range_min"]
    if "range_max" in sweep:
        valid &= r <= sweep["range_max"]
    r = r[valid]
    angles = angles[valid]
    return np.stack([r * np.cos(angles), r * np.sin(angles)], axis=-1)


def parse_sweep(path: str, capacity: int | str | None = None, dtype=np.float32) -> PointCloud:
    """Read a .conf sweep into a padded :class:`PointCloud` (angular order
    preserved — required by ``feature_aware``'s window features)."""
    return from_points(sweep_to_points(parse_sweep_conf(path)), capacity=capacity, dtype=dtype)
