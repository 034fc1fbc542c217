#!/usr/bin/env python3
"""Generate ``ex_data/manhattan/m600.g2o``: a Manhattan-world pose graph.

The classic SLAM back-end benchmark shape (g2o's M3500, Olson's Manhattan
datasets): a grid-walk trajectory with 90-degree turns, noisy odometry
edges, and proximity loop closures — written in standard g2o SE2 text so
it doubles as interop test data for ``icp_tpu.io.read_g2o`` and a bundled
workload for ``icp-tpu graph``.

Deterministic (seeded); re-running reproduces the committed file
byte-for-byte (pinned by ``tests/test_manhattan_g2o.py``).

The bundled M3500-scale variant (the size of Olson's classic benchmark,
the workload of the round-4 outlier-injection protocol) was generated
with::

    python scripts/make_manhattan_g2o.py --poses 3500 --bound 30 \
        --closure-prob 0.15

Defaults reproduce ``m600.g2o`` exactly (do not change them).
"""

import argparse
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=600)
    ap.add_argument("--step", type=float, default=1.0)
    ap.add_argument("--trans-noise", type=float, default=0.03)
    ap.add_argument("--rot-noise", type=float, default=0.01)
    ap.add_argument("--closure-radius", type=float, default=1.5)
    ap.add_argument("--closure-prob", type=float, default=0.3)
    ap.add_argument(
        "--bound", type=float, default=12.0,
        help="half-width of the Manhattan block the walk is steered back "
        "into (scale ~ sqrt(poses) for a constant revisit density)",
    )
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default=os.path.join(REPO, "ex_data", "manhattan"))
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)

    # Ground-truth grid walk: straight steps with occasional +-90 turns,
    # biased to stay inside a bounded block (classic Manhattan shape).
    poses = [(0.0, 0.0, 0.0)]
    x, y, th = 0.0, 0.0, 0.0
    for _ in range(args.poses - 1):
        if rng.random() < 0.25 or abs(x) > args.bound or abs(y) > args.bound:
            # Turn toward the origin when out of bounds, else randomly.
            if abs(x) > args.bound or abs(y) > args.bound:
                desired = math.atan2(-y, -x)
                turn = np.sign(((desired - th + math.pi) % (2 * math.pi)) - math.pi)
            else:
                turn = rng.choice([-1.0, 1.0])
            th = (th + turn * math.pi / 2 + math.pi) % (2 * math.pi) - math.pi
        x += args.step * math.cos(th)
        y += args.step * math.sin(th)
        poses.append((x, y, th))
    gt = np.asarray(poses)

    # Odometry measurements (relative, noisy) and integrated vertices.
    def rel(a, b):
        dx, dy = b[0] - a[0], b[1] - a[1]
        c, s = math.cos(a[2]), math.sin(a[2])
        return (c * dx + s * dy, -s * dx + c * dy,
                ((b[2] - a[2] + math.pi) % (2 * math.pi)) - math.pi)

    odo = []
    for k in range(args.poses - 1):
        dx, dy, dth = rel(gt[k], gt[k + 1])
        odo.append((
            dx + rng.normal(0, args.trans_noise),
            dy + rng.normal(0, args.trans_noise),
            dth + rng.normal(0, args.rot_noise),
        ))
    verts = [(0.0, 0.0, 0.0)]
    for dx, dy, dth in odo:
        px, py, pth = verts[-1]
        c, s = math.cos(pth), math.sin(pth)
        verts.append((px + c * dx - s * dy, py + s * dx + c * dy,
                      ((pth + dth + math.pi) % (2 * math.pi)) - math.pi))

    # Loop closures: ground-truth-near pairs, measured with small noise.
    closures = []
    for i in range(args.poses):
        for j in range(i + 20, args.poses):
            d = math.hypot(gt[j, 0] - gt[i, 0], gt[j, 1] - gt[i, 1])
            if d < args.closure_radius and rng.random() < args.closure_prob:
                dx, dy, dth = rel(gt[i], gt[j])
                closures.append((
                    i, j,
                    dx + rng.normal(0, 0.01),
                    dy + rng.normal(0, 0.01),
                    dth + rng.normal(0, 0.005),
                ))

    ti = 1.0 / (args.trans_noise**2)
    ri = 1.0 / (args.rot_noise**2)
    tc, rc = 1.0 / (0.01**2), 1.0 / (0.005**2)
    lines = [
        f"VERTEX_SE2 {k} {v[0]:.9g} {v[1]:.9g} {v[2]:.9g}"
        for k, v in enumerate(verts)
    ]
    for k, (dx, dy, dth) in enumerate(odo):
        lines.append(
            f"EDGE_SE2 {k} {k + 1} {dx:.9g} {dy:.9g} {dth:.9g} "
            f"{ti:.9g} 0 0 {ti:.9g} 0 {ri:.9g}"
        )
    for i, j, dx, dy, dth in closures:
        lines.append(
            f"EDGE_SE2 {i} {j} {dx:.9g} {dy:.9g} {dth:.9g} "
            f"{tc:.9g} 0 0 {tc:.9g} 0 {rc:.9g}"
        )
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"m{args.poses}.g2o")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {path}: {args.poses} vertices, {len(odo)} odometry edges, "
        f"{len(closures)} closures"
    )


if __name__ == "__main__":
    main()
