"""Deterministic generator for the in-repo example datasets (``ex_data/``).

The reference carries its bench data in-tree (``/root/reference/ex_data``:
scan1-3 2D lidar pairs + the 10,720-vertex queen.ply pair).  This repo does
NOT copy that data; instead this script *simulates* workloads of the same
shape so the full bench/test protocol runs on a standalone checkout:

* ``scan2``/``scan3``: ray-cast 2D lidar sweeps of synthetic rooms from two
  nearby poses, with max-range no-returns written as ``inf,inf`` rows
  (dropped by the parser exactly like the reference's ±inf rows,
  ``common/parse_scan.cpp:37-39``).  Row counts mirror the reference
  workloads (1146 and 720 rays).
* ``ply/queen_scale{,_transformed}.ply``: a 10,720-vertex chess-queen-like
  surface of revolution and a rigidly transformed copy (binary
  little-endian), matching the reference 3D workload scale
  (``ex_data/ply/queen.ply``: ``element vertex 10720``).

Usage: ``python scripts/make_ex_data.py`` (idempotent; fixed seeds).
``ex_data/scan1`` is left untouched (generated in round 1).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ray_segments_hits(origin, dirs, segments):
    """Ray-vs-segment distances: ``(R, 2) dirs`` x ``(S, 4) segments`` ->
    ``(R,)`` smallest positive hit distance (inf when none)."""
    p = np.asarray(origin, dtype=np.float64)
    a = segments[:, 0:2][None, :, :]  # (1, S, 2)
    b = segments[:, 2:4][None, :, :]
    d = dirs[:, None, :]  # (R, 1, 2)
    e = b - a  # segment direction
    # Solve p + t d = a + u e  ->  [d, -e] [t, u]^T = a - p
    denom = d[..., 0] * (-e[..., 1]) - d[..., 1] * (-e[..., 0])  # (R, S)
    rhs = a - p[None, None, :]
    t = (rhs[..., 0] * (-e[..., 1]) - rhs[..., 1] * (-e[..., 0])) / np.where(
        denom == 0, np.inf, denom
    )
    u = (d[..., 0] * rhs[..., 1] - d[..., 1] * rhs[..., 0]) / np.where(
        denom == 0, np.inf, denom
    )
    valid = (t > 1e-9) & (u >= 0.0) & (u <= 1.0)
    t = np.where(valid, t, np.inf)
    return t.min(axis=1)


def ray_circles_hits(origin, dirs, circles):
    """Ray-vs-circle: ``circles (C, 3)`` as (cx, cy, r) -> ``(R,)`` distance."""
    if len(circles) == 0:
        return np.full(dirs.shape[0], np.inf)
    p = np.asarray(origin, dtype=np.float64)
    c = circles[:, :2][None, :, :]  # (1, C, 2)
    r = circles[:, 2][None, :]  # (1, C)
    d = dirs[:, None, :]  # (R, 1, 2)
    oc = p[None, None, :] - c
    b = np.sum(d * oc, axis=-1)  # (R, C)
    cc = np.sum(oc * oc, axis=-1) - r * r
    disc = b * b - cc
    sqrt_disc = np.sqrt(np.maximum(disc, 0.0))
    t1 = -b - sqrt_disc
    t2 = -b + sqrt_disc
    t = np.where(t1 > 1e-9, t1, np.where(t2 > 1e-9, t2, np.inf))
    t = np.where(disc >= 0, t, np.inf)
    return t.min(axis=1)


def simulate_scan(pose, segments, circles, n_rays, max_range, noise, rng):
    """One lidar sweep from ``pose=(x, y, theta)`` in the SENSOR frame."""
    x, y, th = pose
    angles = th + np.linspace(-np.pi, np.pi, n_rays, endpoint=False)
    dirs = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    dist = np.minimum(
        ray_segments_hits((x, y), dirs, segments),
        ray_circles_hits((x, y), dirs, circles),
    )
    dist = dist + rng.normal(0.0, noise, dist.shape)
    hit = dist <= max_range
    # Sensor-frame coordinates (the reference scans are sensor-frame too).
    local_angles = angles - th
    safe = np.where(hit, dist, 0.0)  # avoid inf*0 NaNs on misses
    pts = safe[:, None] * np.stack(
        [np.cos(local_angles), np.sin(local_angles)], axis=-1
    )
    pts = np.where(hit[:, None], pts, np.inf)
    return pts


def write_scan_csv(path, pts):
    with open(path, "w") as f:
        for x, y in pts:
            if np.isfinite(x) and np.isfinite(y):
                f.write(f"{x:.18e},{y:.18e}\n")
            else:
                f.write("inf,inf\n")


def rect(x0, y0, x1, y1):
    return [
        (x0, y0, x1, y0),
        (x1, y0, x1, y1),
        (x1, y1, x0, y1),
        (x0, y1, x0, y0),
    ]


def make_scan2():
    """Office-like room with alcoves + pillars; 1146 rays (reference scan2
    row count), open doorway producing no-returns."""
    rng = np.random.default_rng(20)
    segs = []
    # Outer walls with a doorway gap on the right wall.
    segs += [
        (-8.0, -6.0, 8.0, -6.0),
        (8.0, -6.0, 8.0, -1.0),
        (8.0, 1.5, 8.0, 6.0),  # gap (-1.0, 1.5) = doorway -> max-range misses
        (8.0, 6.0, -8.0, 6.0),
        (-8.0, 6.0, -8.0, -6.0),
    ]
    # Alcove.
    segs += rect(-8.0, 2.0, -6.0, 4.0)[1:3]
    # Interior desk blocks.
    segs += rect(2.0, -4.0, 5.0, -2.0)
    circles = np.asarray([[-3.0, -2.0, 0.6], [0.5, 3.0, 0.8], [4.5, 3.5, 0.5]])
    segments = np.asarray(segs, dtype=np.float64)
    a = simulate_scan((0.0, 0.0, 0.0), segments, circles, 1146, 11.0, 0.01, rng)
    b = simulate_scan((0.35, 0.12, np.deg2rad(4.0)), segments, circles, 1146, 11.0, 0.01, rng)
    return a, b


def make_scan3():
    """L-shaped corridor; 720 rays (reference scan3 row count), long legs
    beyond max range produce the larger no-return fraction."""
    rng = np.random.default_rng(30)
    segs = [
        (-2.0, -2.0, 12.0, -2.0),
        (12.0, -2.0, 12.0, 2.0),
        (12.0, 2.0, 2.0, 2.0),
        (2.0, 2.0, 2.0, 14.0),
        (2.0, 14.0, -2.0, 14.0),
        (-2.0, 14.0, -2.0, -2.0),
    ]
    segs += rect(6.0, -1.2, 7.0, -0.2)
    circles = np.asarray([[0.0, 5.0, 0.5]])
    segments = np.asarray(segs, dtype=np.float64)
    a = simulate_scan((0.0, 0.0, 0.0), segments, circles, 720, 9.0, 0.01, rng)
    b = simulate_scan((0.25, 0.3, np.deg2rad(-5.0)), segments, circles, 720, 9.0, 0.01, rng)
    return a, b


def make_queen_scale(n_theta=80, n_z=134):
    """Chess-queen-like surface of revolution, ``n_theta * n_z`` = 10,720
    vertices (the reference queen.ply scale), with angular ripple so the
    surface has registration-relevant azimuthal structure."""
    z = np.linspace(0.0, 5.0, n_z)
    # Piecewise profile: base, stem, body, collar, crown.
    r = np.interp(
        z,
        [0.0, 0.25, 0.5, 1.0, 1.8, 2.6, 3.2, 3.6, 4.0, 4.4, 4.7, 5.0],
        [1.6, 1.7, 1.2, 0.8, 0.55, 0.5, 0.7, 0.5, 0.9, 0.6, 0.35, 0.05],
    )
    theta = np.linspace(0.0, 2 * np.pi, n_theta, endpoint=False)
    tt, zz = np.meshgrid(theta, z)  # (n_z, n_theta)
    rr = np.broadcast_to(r[:, None], tt.shape).copy()
    # Crown spikes + gentle flutes.
    rr *= 1.0 + 0.04 * np.cos(8 * tt) * (zz > 4.2) + 0.015 * np.cos(6 * tt)
    pts = np.stack(
        [rr * np.cos(tt), rr * np.sin(tt), zz], axis=-1
    ).reshape(-1, 3)
    assert pts.shape[0] == n_theta * n_z == 10720
    return pts


def main():
    from icp_tpu.io import write_ply

    for name, maker in [("scan2", make_scan2), ("scan3", make_scan3)]:
        d = os.path.join(REPO, "ex_data", name)
        os.makedirs(d, exist_ok=True)
        a, b = maker()
        write_scan_csv(os.path.join(d, "first.csv"), a)
        write_scan_csv(os.path.join(d, "second.csv"), b)
        va = int(np.isfinite(a[:, 0]).sum())
        vb = int(np.isfinite(b[:, 0]).sum())
        print(f"{name}: {len(a)} rows, valid {va}/{vb}")

    ply_dir = os.path.join(REPO, "ex_data", "ply")
    os.makedirs(ply_dir, exist_ok=True)
    pts = make_queen_scale()
    # Rigid offset comparable to the reference pair: a few degrees + a
    # fraction of the object size, well inside Trimmed3d's basin.
    ang = np.deg2rad(6.0)
    axis = np.asarray([0.3, 1.0, 0.2])
    axis = axis / np.linalg.norm(axis)
    k = np.asarray(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    rot = np.eye(3) + np.sin(ang) * k + (1 - np.cos(ang)) * (k @ k)
    trans = np.asarray([0.25, -0.15, 0.1])
    moved = pts @ rot.T + trans
    write_ply(os.path.join(ply_dir, "queen_scale.ply"), pts, binary=True)
    write_ply(os.path.join(ply_dir, "queen_scale_transformed.ply"), moved, binary=True)
    print(f"queen_scale: {len(pts)} vertices, rotation {np.rad2deg(ang):.1f} deg")


if __name__ == "__main__":
    main()
