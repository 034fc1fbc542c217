#!/usr/bin/env python3
"""Generate ``ex_data/seq3d``: a raycast 3D LiDAR odometry sequence.

The 3D sibling of ``make_lidar_seq.py`` (which synthesizes the reference's
2D rosbag-extract artifact): a multi-ring spinning LiDAR (Velodyne-like,
12 rings x 128 azimuth steps) raycast against a 3D indoor world built from
axis-aligned boxes (walls, an inner block, pillars, furniture at varying
heights, floor and ceiling), driven around a closed loop with altitude
undulation — so the poses are genuinely SE(3), not planar — plus Gaussian
range noise and random dropouts.  The reference has no 3D sequence at all
(its 3D story ends at one PLY pair, ``tests/test_ply.cpp:89-131``); this
dataset exercises the net-new 3D odometry + SE(3) pose-graph pipeline end
to end.

Outputs (committed in-tree so the 3D example and tests are self-contained):

- ``ex_data/seq3d/sweep_NNN.ply``  — one sweep per trajectory step, sensor-
  frame xyz, binary little-endian PLY (readable by ``icp_tpu.read_ply`` and
  the CLI's ``odometry --ply`` path).
- ``ex_data/seq3d/groundtruth.json`` — world-frame pose per sweep as a
  row-major 3x3 rotation + translation.

Deterministic (seeded); re-running with the defaults reproduces the
committed files byte-for-byte (pinned by
``tests/test_seq3d_odometry.py::test_generator_reproduces_committed_data``).
Run: python scripts/make_lidar_seq3d.py [--steps 72]
"""

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def box(x0, y0, z0, x1, y1, z1):
    return [[x0, y0, z0], [x1, y1, z1]]


def build_world():
    """Indoor loop world as axis-aligned boxes ``(S, 2, 3)``.

    Same floor plan family as the 2D world (outer shell, inner block to
    drive around, pillars, furniture) but with vertical structure: boxes of
    different heights, a floor and a ceiling, wall-mounted cabinets — so
    the elevation rings see distinct geometry and pitch/z are observable.
    """
    h = 3.0  # ceiling height
    t = 0.3  # wall thickness
    boxes = []
    # Floor and ceiling slabs.
    boxes.append(box(-12.5, -9.5, -0.3, 12.5, 9.5, 0.0))
    boxes.append(box(-12.5, -9.5, h, 12.5, 9.5, h + 0.3))
    # Outer walls (full height).
    boxes.append(box(-12.0 - t, -9.0 - t, 0.0, 12.0 + t, -9.0, h))  # south
    boxes.append(box(-12.0 - t, 9.0, 0.0, 12.0 + t, 9.0 + t, h))  # north
    boxes.append(box(-12.0 - t, -9.0, 0.0, -12.0, 9.0, h))  # west
    boxes.append(box(12.0, -9.0, 0.0, 12.0 + t, 9.0, h))  # east
    # Inner block (full height) — the loop drives around it.
    boxes.append(box(-5.0, -3.0, 0.0, 5.0, 3.0, h))
    # Free-standing pillars (0.4 m square, full height).
    for cx, cy in [
        (-8.5, -6.0), (8.0, 6.5), (7.5, -5.5), (-7.6, 6.4), (0.0, -6.5),
        (10.5, 0.5), (10.0, -7.5), (-10.5, -5.0), (-10.0, 7.0),
        (3.5, 7.2), (-3.5, -7.2), (9.0, 4.2),
    ]:
        boxes.append(box(cx - 0.2, cy - 0.2, 0.0, cx + 0.2, cy + 0.2, h))
    # Furniture / clutter at varying heights: crates, desks, cabinets.
    for x0, y0, x1, y1, z1 in [
        (10.8, -4.5, 12.0, -3.3, 1.1),   # crate at east wall
        (-12.0, 2.0, -10.9, 3.4, 0.9),   # crate at west wall
        (-6.5, 8.0, -5.2, 9.0, 1.4),     # cabinet at north wall
        (-9.0, -9.0, -7.8, -7.9, 0.7),   # bench at south wall
        (5.0, -1.0, 6.1, 0.2, 1.2),      # desk at inner block east
        (-6.2, 0.8, -5.0, 2.0, 0.8),     # crate at inner block west
        (1.5, 3.0, 2.8, 4.1, 1.0),       # desk at inner block north
        (-2.5, -4.2, -1.3, -3.0, 0.6),   # low crate south of block
        (9.6, 2.0, 10.4, 2.8, 1.6),      # tall cabinet in corridor
        (-8.8, 3.0, -8.0, 3.8, 0.5),     # low box in corridor
    ]:
        boxes.append(box(x0, y0, 0.0, x1, y1, z1))
    # Wall-mounted cabinets (floating: distinct ceiling-ward structure).
    for x0, y0, z0, x1, y1, z1 in [
        (11.6, 5.0, 1.8, 12.0, 6.5, 2.6),
        (-12.0, -6.5, 1.9, -11.6, -5.0, 2.7),
        (-1.0, 8.6, 2.0, 1.0, 9.0, 2.8),
    ]:
        boxes.append(box(x0, y0, z0, x1, y1, z1))
    return np.array(boxes, dtype=np.float64)  # (S, 2, 3)


def trajectory(steps):
    """Closed rounded-rectangle loop (same plan as seq1) with altitude
    undulation; heading tangent to the 3D path so pitch is nonzero on the
    climbs.  Returns rotations ``(T, 3, 3)`` and translations ``(T, 3)``.
    """
    rx, ry, r = 7.6, 5.4, 3.0  # gentler corners than seq1: ~12 deg/step yaw
    pieces = []
    n_dense = 512
    t = np.linspace(0, 1, n_dense, endpoint=False)
    pieces.append(np.stack([np.full_like(t, rx), -(ry - r) + 2 * (ry - r) * t], -1))
    a = np.linspace(0, math.pi / 2, n_dense, endpoint=False)
    pieces.append(np.stack([rx - r + r * np.cos(a), ry - r + r * np.sin(a)], -1))
    pieces.append(np.stack([rx - r - 2 * (rx - r) * t, np.full_like(t, ry)], -1))
    a = np.linspace(math.pi / 2, math.pi, n_dense, endpoint=False)
    pieces.append(np.stack([-(rx - r) + r * np.cos(a), ry - r + r * np.sin(a)], -1))
    pieces.append(np.stack([np.full_like(t, -rx), ry - r - 2 * (ry - r) * t], -1))
    a = np.linspace(math.pi, 3 * math.pi / 2, n_dense, endpoint=False)
    pieces.append(np.stack([-(rx - r) + r * np.cos(a), -(ry - r) + r * np.sin(a)], -1))
    pieces.append(np.stack([-(rx - r) + 2 * (rx - r) * t, np.full_like(t, -ry)], -1))
    a = np.linspace(3 * math.pi / 2, 2 * math.pi, n_dense, endpoint=False)
    pieces.append(np.stack([rx - r + r * np.cos(a), -(ry - r) + r * np.sin(a)], -1))
    path = np.concatenate(pieces)
    xs, ys = path[:, 0], path[:, 1]
    seg = np.hypot(np.roll(xs, -1) - xs, np.roll(ys, -1) - ys)
    arc = np.concatenate([[0.0], np.cumsum(seg)])
    stations = np.linspace(0.0, arc[-1], steps, endpoint=False)
    xs = np.interp(stations, arc[:-1], path[:, 0])
    ys = np.interp(stations, arc[:-1], path[:, 1])
    # Two gentle altitude bumps around the loop (drone-like survey height).
    s = stations / arc[-1]
    zs = 1.3 + 0.25 * np.sin(2 * math.pi * 2 * s)

    # Heading = tangent of the closed 3D path; up stays world-z.
    dx = np.roll(xs, -1) - xs
    dy = np.roll(ys, -1) - ys
    dz = np.roll(zs, -1) - zs
    fwd = np.stack([dx, dy, dz], -1)
    fwd /= np.linalg.norm(fwd, axis=-1, keepdims=True)
    up = np.array([0.0, 0.0, 1.0])
    left = np.cross(np.broadcast_to(up, fwd.shape), fwd)
    left /= np.linalg.norm(left, axis=-1, keepdims=True)
    zax = np.cross(fwd, left)
    rots = np.stack([fwd, left, zax], axis=-1)  # columns = sensor axes
    trans = np.stack([xs, ys, zs], -1)
    return rots, trans


def raycast(origin, dirs, boxes, range_max):
    """Min ray-AABB intersection distance per beam (inf = no hit).

    Standard slab method, vectorized over (beams B, boxes S); the sensor
    origin is asserted outside every box, so the entry distance tmin is the
    hit.
    """
    p = np.asarray(origin)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / dirs  # (B, 3); infs where a direction component is 0
        t0 = (boxes[None, :, 0, :] - p) * inv[:, None, :]
        t1 = (boxes[None, :, 1, :] - p) * inv[:, None, :]
    lo = np.minimum(t0, t1)
    hi = np.maximum(t0, t1)
    # 0 * inf -> nan when the origin lies exactly on a slab plane; treat the
    # degenerate axis as non-constraining.
    lo = np.where(np.isnan(lo), -np.inf, lo)
    hi = np.where(np.isnan(hi), np.inf, hi)
    tmin = lo.max(-1)
    tmax = hi.min(-1)
    hit = (tmax >= tmin) & (tmin > 1e-9)
    t = np.where(hit, tmin, np.inf)
    r = t.min(axis=1)
    return np.where(r <= range_max, r, np.inf)


def check_clearance(trans, boxes, min_clearance=0.3):
    """Every pose must keep clearance from every box (else garbage sweeps)."""
    p = trans[:, None, :]
    lo, hi = boxes[None, :, 0], boxes[None, :, 1]
    nearest = np.clip(p, lo, hi)
    d = np.linalg.norm(p - nearest, axis=-1)
    worst = d.min()
    if worst < min_clearance:
        t_bad, s_bad = np.unravel_index(np.argmin(d), d.shape)
        raise AssertionError(
            f"pose {t_bad} is {worst:.2f} m from box {s_bad} (< {min_clearance})"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=72)
    ap.add_argument("--rings", type=int, default=12)
    ap.add_argument("--azimuths", type=int, default=128)
    ap.add_argument("--vfov-deg", type=float, default=40.0)
    ap.add_argument("--noise", type=float, default=0.01, help="range noise sigma (m)")
    ap.add_argument("--dropout", type=float, default=0.02, help="no-return probability")
    ap.add_argument("--out", default=os.path.join(REPO, "ex_data", "seq3d"))
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from icp_tpu.io import write_ply

    rng = np.random.default_rng(args.seed)
    boxes = build_world()
    rots, trans = trajectory(args.steps)
    check_clearance(trans, boxes)

    el = np.deg2rad(np.linspace(-args.vfov_deg / 2, args.vfov_deg / 2, args.rings))
    az = np.linspace(-math.pi, math.pi, args.azimuths, endpoint=False)
    ee, aa = np.meshgrid(el, az, indexing="ij")
    dirs_sensor = np.stack(
        [np.cos(ee) * np.cos(aa), np.cos(ee) * np.sin(aa), np.sin(ee)], -1
    ).reshape(-1, 3)  # (B, 3)
    range_min, range_max = 0.3, 30.0

    os.makedirs(args.out, exist_ok=True)
    for k in range(args.steps):
        rot, tr = rots[k], trans[k]
        dirs = dirs_sensor @ rot.T  # world-frame beam directions
        r = raycast(tr, dirs, boxes, range_max)
        r = r + rng.normal(0.0, args.noise, r.shape)
        r[rng.random(r.shape) < args.dropout] = np.inf
        r[r < range_min] = np.inf
        valid = np.isfinite(r)
        pts = dirs_sensor[valid] * r[valid, None]  # sensor frame
        write_ply(os.path.join(args.out, f"sweep_{k:03d}.ply"), pts, binary=True)

    with open(os.path.join(args.out, "groundtruth.json"), "w") as f:
        json.dump(
            {
                "format": "world-frame pose per sweep: row-major 3x3 rotation "
                "(columns = sensor x-forward/y-left/z-up axes) + translation",
                "rotations": [np.round(r, 9).tolist() for r in rots],
                "translations": [np.round(t, 6).tolist() for t in trans],
            },
            f,
            indent=1,
        )
    print(f"wrote {args.steps} sweeps + groundtruth to {args.out}")


if __name__ == "__main__":
    main()
