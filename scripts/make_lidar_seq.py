#!/usr/bin/env python3
"""Generate ``ex_data/seq1``: a realistic raycast LiDAR odometry sequence.

The reference ingests real robot data through ``script/rosbag_extract.py``,
which exports LaserScan sweeps as ``key = value`` .conf files
(``rosbag_extract.py:111-119``; format keys at :62-69).  This environment
has no network access and no ROS bags, so this script *synthesizes* the
same artifact with real-sensor physics: a 270-degree, 540-beam scanner
(Hokuyo UTM-30LX-like) raycast against a 2D indoor world (loop corridor
with pillars and alcoves), driven around a closed loop, with Gaussian
range noise and random dropouts (no-return -> inf, masked by the polar
analogue of ``common/parse_scan.cpp:37-39``).

Outputs (committed in-tree so the odometry example and tests are
self-contained):

- ``ex_data/seq1/sweep_NNN.conf``  — one sweep per trajectory step, in the
  exact rosbag_extract format (readable by ``icp_tpu.io.parse_sweep``).
- ``ex_data/seq1/groundtruth.json`` — world-frame poses [x, y, theta] per
  sweep, used by ``examples/odometry_sequence.py`` to report drift/ATE.

Deterministic (seeded); re-running with the defaults reproduces the
committed files byte-for-byte (pinned by
``tests/test_seq1_odometry.py::test_generator_reproduces_committed_data``).
Run: python scripts/make_lidar_seq.py [--steps 120] [--beams 540]
"""

import argparse
import json
import math
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rect(x0, y0, x1, y1):
    """Four wall segments of an axis-aligned rectangle."""
    return [
        ((x0, y0), (x1, y0)),
        ((x1, y0), (x1, y1)),
        ((x1, y1), (x0, y1)),
        ((x0, y1), (x0, y0)),
    ]


def build_world():
    """Loop corridor: outer shell, inner block, and enough clutter that no
    straight segment is a bare two-wall corridor.

    Bare parallel walls make consecutive scans translation-degenerate
    (the aperture problem: wall points slide, so zero motion is a perfect
    local minimum for point-to-point ICP).  Real corridors have doorways,
    furniture, and pillars; the clutter below provides the along-corridor
    constraints a real sensor would see.
    """
    segs = []
    segs += rect(-12.0, -9.0, 12.0, 9.0)  # outer walls
    segs += rect(-5.0, -3.0, 5.0, 3.0)  # inner block (drive around it)
    # Alcoves (doorway-like recesses) on each outer wall.
    segs += [((12.0, 2.0), (14.0, 2.0)), ((14.0, 2.0), (14.0, 5.0)),
             ((14.0, 5.0), (12.0, 5.0))]
    segs += [((-2.0, 9.0), (-2.0, 10.5)), ((-2.0, 10.5), (0.5, 10.5)),
             ((0.5, 10.5), (0.5, 9.0))]
    segs += [((-12.0, -2.5), (-13.5, -2.5)), ((-13.5, -2.5), (-13.5, 0.5)),
             ((-13.5, 0.5), (-12.0, 0.5))]
    segs += [((3.0, -9.0), (3.0, -10.5)), ((3.0, -10.5), (5.5, -10.5)),
             ((5.5, -10.5), (5.5, -9.0))]
    # Diagonal brace in the north-west corner.
    segs += [((-12.0, 5.0), (-8.0, 9.0))]
    # Wall notches (cabinets / radiators) flush against walls.
    for x0, y0, x1, y1 in [
        (10.8, -4.5, 12.0, -3.3),   # east outer wall
        (-12.0, 2.0, -10.9, 3.4),   # west outer wall
        (-6.5, 8.0, -5.2, 9.0),     # north outer wall
        (-9.0, -9.0, -7.8, -7.9),   # south outer wall
        (5.0, -1.0, 6.1, 0.2),      # east face of inner block
        (-6.2, 0.8, -5.0, 2.0),     # west face of inner block
        (1.5, 3.0, 2.8, 4.1),       # north face of inner block
        (-2.5, -4.2, -1.3, -3.0),   # south face of inner block
    ]:
        segs += rect(x0, y0, x1, y1)
    # Free-standing pillars (0.4 m squares) scattered through the corridor,
    # >= 0.7 m clear of the robot path.
    for cx, cy in [
        (-8.5, -6.0), (8.0, 6.5), (7.5, -5.5), (-7.6, 6.4), (0.0, -6.5),
        (10.5, 0.5), (10.0, -7.5), (-10.5, -5.0), (-10.0, 7.0),
        (3.5, 7.2), (-3.5, -7.2), (9.0, 4.2),
    ]:
        segs += rect(cx - 0.2, cy - 0.2, cx + 0.2, cy + 0.2)
    return np.array(segs, dtype=np.float64)  # (S, 2, 2)


def trajectory(steps, laps=1):
    """Closed rounded-rectangle loop through the corridor, heading tangent
    to the path; ends where it starts (exercises loop closure).

    The path is resampled uniformly by arc length so per-step motion (and
    per-step rotation at corners) is bounded — the realistic regime for a
    scanning robot; non-uniform steps make corner sweeps unregistrable.

    ``laps > 1`` drives the same loop repeatedly (``steps`` stations over
    ``laps`` circuits): every lap-2+ pose REVISITS a lap-1 pose mid-stream,
    so an online SLAM back-end accepts closures (and re-solves) while the
    stream is still running — the workload seq1 cannot provide (its only
    revisit is the final keyframe; see BASELINE.md round-4 honest note 2).
    """
    rx, ry, r = 7.6, 5.4, 2.2  # straight half-extents and corner radius
    # Exact rounded rectangle: 4 straights + 4 quarter arcs, built as a
    # dense polyline then resampled uniformly.  Start mid-east-straight
    # heading +y (counter-clockwise).
    pieces = []
    n_dense = 512
    # East straight: (rx, -(ry - r)) -> (rx, ry - r)
    t = np.linspace(0, 1, n_dense, endpoint=False)
    pieces.append(np.stack([np.full_like(t, rx), -(ry - r) + 2 * (ry - r) * t], -1))
    # NE arc: center (rx - r, ry - r), 0 -> 90 deg
    a = np.linspace(0, math.pi / 2, n_dense, endpoint=False)
    pieces.append(np.stack([rx - r + r * np.cos(a), ry - r + r * np.sin(a)], -1))
    # North straight: (rx - r, ry) -> (-(rx - r), ry)
    pieces.append(np.stack([rx - r - 2 * (rx - r) * t, np.full_like(t, ry)], -1))
    # NW arc: center (-(rx - r), ry - r), 90 -> 180 deg
    a = np.linspace(math.pi / 2, math.pi, n_dense, endpoint=False)
    pieces.append(np.stack([-(rx - r) + r * np.cos(a), ry - r + r * np.sin(a)], -1))
    # West straight down, SW arc, south straight, SE arc (by symmetry).
    pieces.append(np.stack([np.full_like(t, -rx), ry - r - 2 * (ry - r) * t], -1))
    a = np.linspace(math.pi, 3 * math.pi / 2, n_dense, endpoint=False)
    pieces.append(np.stack([-(rx - r) + r * np.cos(a), -(ry - r) + r * np.sin(a)], -1))
    pieces.append(np.stack([-(rx - r) + 2 * (rx - r) * t, np.full_like(t, -ry)], -1))
    a = np.linspace(3 * math.pi / 2, 2 * math.pi, n_dense, endpoint=False)
    pieces.append(np.stack([rx - r + r * np.cos(a), -(ry - r) + r * np.sin(a)], -1))
    path = np.concatenate(pieces)  # closed CCW polyline starting at (rx, -(ry-r))
    xs, ys = path[:, 0], path[:, 1]
    # Arc-length resample to `steps` uniform stations.
    seg = np.hypot(np.roll(xs, -1) - xs, np.roll(ys, -1) - ys)
    arc = np.concatenate([[0.0], np.cumsum(seg)])
    stations = np.linspace(0.0, laps * arc[-1], steps, endpoint=False)
    if laps > 1:
        stations = stations % arc[-1]  # wrap back onto the closed polyline
    xs = np.interp(stations, arc[:-1], path[:, 0])
    ys = np.interp(stations, arc[:-1], path[:, 1])
    # Heading = tangent direction of the (closed) path.
    dx = np.roll(xs, -1) - xs
    dy = np.roll(ys, -1) - ys
    th = np.arctan2(dy, dx)
    return np.stack([xs, ys, th], axis=-1)  # (T, 3)


def check_clearance(poses, segs, min_clearance=0.3):
    """Assert every pose keeps ``min_clearance`` from every wall segment —
    a pose inside (or scraping) geometry produces garbage sweeps."""
    p = poses[:, None, :2]  # (T, 1, 2)
    a, b = segs[None, :, 0], segs[None, :, 1]  # (1, S, 2)
    e = b - a
    tt = np.clip(
        np.sum((p - a) * e, -1) / np.maximum(np.sum(e * e, -1), 1e-12), 0.0, 1.0
    )
    d = np.linalg.norm(p - (a + tt[..., None] * e), axis=-1)  # (T, S)
    worst = d.min()
    if worst < min_clearance:
        t_bad, s_bad = np.unravel_index(np.argmin(d), d.shape)
        raise AssertionError(
            f"pose {t_bad} is {worst:.2f} m from segment {s_bad} "
            f"{segs[s_bad].tolist()} (< {min_clearance})"
        )


def raycast(origin, angles, segs, range_max):
    """Min ray-segment intersection distance per beam (inf = no hit).

    Rays: p + t*d, t >= 0.  Segments: a + u*(b-a), 0 <= u <= 1.
    """
    p = np.asarray(origin)
    d = np.stack([np.cos(angles), np.sin(angles)], axis=-1)  # (B, 2)
    a, b = segs[:, 0], segs[:, 1]  # (S, 2)
    e = b - a  # (S, 2)
    ap = a[None, :, :] - p[None, None, :].reshape(1, 1, 2)  # (1, S, 2)
    denom = d[:, None, 0] * e[None, :, 1] - d[:, None, 1] * e[None, :, 0]
    cross_ap_e = ap[..., 0] * e[None, :, 1] - ap[..., 1] * e[None, :, 0]
    cross_ap_d = ap[..., 0] * d[:, None, 1] - ap[..., 1] * d[:, None, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = cross_ap_e / denom  # (B, S)
        u = cross_ap_d / denom
    valid = (np.abs(denom) > 1e-12) & (t > 1e-9) & (u >= 0.0) & (u <= 1.0)
    t = np.where(valid, t, np.inf)
    r = t.min(axis=1)
    return np.where(r <= range_max, r, np.inf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--laps", type=int, default=1,
                    help="circuits of the loop (>1: mid-stream revisits)")
    ap.add_argument("--beams", type=int, default=540)
    ap.add_argument("--fov-deg", type=float, default=270.0)
    ap.add_argument("--noise", type=float, default=0.01, help="range noise sigma (m)")
    ap.add_argument("--dropout", type=float, default=0.01, help="no-return probability")
    ap.add_argument("--out", default=os.path.join(REPO, "ex_data", "seq1"))
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    segs = build_world()
    poses = trajectory(args.steps, laps=args.laps)
    check_clearance(poses, segs)

    fov = math.radians(args.fov_deg)
    angle_min, angle_max = -fov / 2, fov / 2
    inc = fov / (args.beams - 1)
    beam_angles = angle_min + inc * np.arange(args.beams)
    range_min, range_max = 0.05, 30.0

    os.makedirs(args.out, exist_ok=True)
    for k, (x, y, th) in enumerate(poses):
        r = raycast((x, y), th + beam_angles, segs, range_max)
        r = r + rng.normal(0.0, args.noise, r.shape)
        r[rng.random(r.shape) < args.dropout] = np.inf
        r[r < range_min] = np.inf
        path = os.path.join(args.out, f"sweep_{k:03d}.conf")
        with open(path, "w") as f:
            # Key order matches script/rosbag_extract.py:62-69.
            f.write(f"angle_max = {angle_max!r}\n")
            f.write(f"angle_min = {angle_min!r}\n")
            f.write(f"angle_increment = {inc!r}\n")
            f.write(f"length = {len(r)}\n")
            f.write(f"range_max = {range_max!r}\n")
            f.write(f"range_min = {range_min!r}\n")
            for i, ri in enumerate(r):
                if np.isfinite(ri):
                    f.write(f"{i} = {ri:.4f}\n")
                else:
                    f.write(f"{i} = inf\n")

    with open(os.path.join(args.out, "groundtruth.json"), "w") as f:
        json.dump(
            {
                "format": "world-frame pose [x, y, theta] per sweep",
                "poses": [[round(v, 6) for v in p] for p in poses.tolist()],
            },
            f,
            indent=1,
        )
    print(f"wrote {args.steps} sweeps + groundtruth to {args.out}")


if __name__ == "__main__":
    main()
