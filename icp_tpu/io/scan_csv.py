"""Lidar scan CSV parsing.

Replaces ``common/parse_scan.cpp:18-50``: each line is ``x,y``; rows with
±inf coordinates (lidar no-returns) are dropped.  Under XLA's static-shape
model "dropped" means the cloud is front-packed and padded (see
:mod:`icp_tpu.cloud`).

If the native C++ loader (``native/``) is built it is used for speed on
large scan sets; the NumPy fallback is always available and byte-equivalent.
"""

from __future__ import annotations

import numpy as np

from ..cloud import PointCloud, from_points


def parse_lidar_scan_array(path: str) -> np.ndarray:
    """Parse a scan CSV into an ``(n, 2)`` float64 array of finite points."""
    from ..utils.native import native_lib

    lib = native_lib()
    if lib is not None:
        pts = lib.parse_scan_csv(path)
        if pts is not None:
            return pts
    rows = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            x_str, _, y_str = line.partition(",")
            try:
                x = float(x_str)
                y = float(y_str)
            except ValueError:
                continue
            if not (np.isfinite(x) and np.isfinite(y)):
                continue  # ``parse_scan.cpp:37-39`` (+ NaN, like from_points)
            rows.append((x, y))
    return np.asarray(rows, dtype=np.float64).reshape(-1, 2)


def parse_lidar_scan(
    path: str, capacity: int | str | None = None, dtype=np.float32
) -> PointCloud:
    """Parse a scan CSV into a padded :class:`PointCloud`."""
    pts = parse_lidar_scan_array(path)
    return from_points(pts, capacity=capacity, dtype=dtype)


def parse_lidar_scan_batch(
    paths, capacity: int | str | None = None, dtype=np.float32
) -> PointCloud:
    """Load many scan CSVs into one batched padded cloud ``(T, N, 2)``.

    With an explicit int ``capacity``, the native threaded loader
    (``native/icptpu_parse_scan_batch``) parses all files in parallel when
    available.  With ``capacity=None`` a Python sizing pass parses each file
    once (arrays reused — no second parse) and the capacity becomes the
    largest scan rounded up to the sublane multiple; ``"bucket"`` rounds it
    up to the power-of-two bucket instead (:func:`icp_tpu.cloud.bucket_capacity`).
    """
    import jax.numpy as jnp

    from ..cloud import bucket_capacity, round_up
    from ..utils.native import native_lib

    paths = list(paths)
    if not paths:
        raise ValueError("parse_lidar_scan_batch: empty path list")
    arrays = None
    if capacity is None or capacity == "bucket":
        # Sizing pass parses everything once; keep the arrays so the
        # fallback below never parses a file twice.
        arrays = [parse_lidar_scan_array(p) for p in paths]
        largest = max(len(a) for a in arrays)
        if capacity == "bucket":
            capacity = bucket_capacity(largest)
        else:
            capacity = max(round_up(largest, 8), 8)
    else:
        lib = native_lib()
        if lib is not None:
            got = lib.parse_scan_batch(paths, capacity)
            if got is not None:
                pts, counts = got
                return PointCloud(
                    jnp.asarray(pts.astype(dtype)),
                    jnp.asarray(counts, dtype=jnp.int32),
                )
    if arrays is None:
        arrays = [parse_lidar_scan_array(p) for p in paths]
    n = len(arrays)
    out = np.zeros((n, capacity, 2), dtype=dtype)
    counts = np.zeros(n, dtype=np.int32)
    for i, a in enumerate(arrays):
        if len(a) > capacity:
            raise ValueError(f"{paths[i]}: {len(a)} points exceed capacity {capacity}")
        out[i, : len(a)] = a
        counts[i] = len(a)
    return PointCloud(jnp.asarray(out), jnp.asarray(counts))
