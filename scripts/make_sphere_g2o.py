#!/usr/bin/env python3
"""Generate ``ex_data/manhattan/sphere2500.g2o``: a sphere-world SE(3)
pose graph — the 3D companion of the bundled Manhattan graphs.

The shape of g2o's classic ``sphere2500`` benchmark: a spiral trajectory
winding down a sphere surface, noisy SE(3) odometry edges, and loop
closures between vertically adjacent rings — written in standard
``VERTEX_SE3:QUAT`` / ``EDGE_SE3:QUAT`` text, so it doubles as interop
test data for :func:`icp_tpu.io.read_g2o` at scale (2500 nodes, 6-DoF)
and as the SE(3) workload for the round-4 outlier-injection protocol
(``icp-tpu graph ... --outlier-protocol``).

Deterministic (seeded); re-running reproduces the committed file
byte-for-byte (pinned by ``tests/test_manhattan_g2o.py``).
"""

import argparse
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_TRI = [(i, j) for i in range(6) for j in range(i, 6)]


def _rot_to_quat(m):
    t = np.trace(m)
    if t > 0:
        s = math.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
        v = np.zeros(3)
        v[i] = 0.25 * s
        v[j] = (m[j, i] + m[i, j]) / s
        v[k] = (m[k, i] + m[i, k]) / s
        w = (m[k, j] - m[j, k]) / s
        x, y, z = v
    q = np.array([x, y, z, w])
    if q[3] < 0:
        q = -q
    return q / np.linalg.norm(q)


def _so3_exp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + math.sin(th) * kx + (1 - math.cos(th)) * (kx @ kx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=2500)
    ap.add_argument("--radius", type=float, default=25.0)
    ap.add_argument("--ring", type=int, default=50, help="steps per revolution")
    ap.add_argument("--trans-noise", type=float, default=0.05)
    ap.add_argument("--rot-noise", type=float, default=0.01)
    ap.add_argument("--closure-radius", type=float, default=4.0)
    ap.add_argument("--closure-prob", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--out", default=os.path.join(REPO, "ex_data", "manhattan"))
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t_total, ring, radius = args.poses, args.ring, args.radius

    # Ground truth: spiral from near the north pole to near the south pole,
    # one ring per `ring` steps.  Orientation = the spiral's local frame
    # (x: direction of travel, z: outward surface normal).
    rots, trans = [], []
    for k in range(t_total):
        u = (k + 0.5) / t_total  # (0, 1): pole to pole
        theta = math.pi * u
        phi = 2 * math.pi * k / ring
        p = radius * np.array(
            [math.sin(theta) * math.cos(phi), math.sin(theta) * math.sin(phi),
             math.cos(theta)]
        )
        # Tangent along the spiral (numeric, next step direction).
        u2 = (k + 1.5) / t_total
        theta2 = math.pi * u2
        phi2 = 2 * math.pi * (k + 1) / ring
        p2 = radius * np.array(
            [math.sin(theta2) * math.cos(phi2), math.sin(theta2) * math.sin(phi2),
             math.cos(theta2)]
        )
        x = p2 - p
        x = x / np.linalg.norm(x)
        z = p / np.linalg.norm(p)  # outward normal
        z = z - x * (x @ z)
        z = z / np.linalg.norm(z)
        y = np.cross(z, x)
        rots.append(np.stack([x, y, z], axis=1))
        trans.append(p)
    rots = np.stack(rots)
    trans = np.stack(trans)

    def rel(i, j):
        r = rots[i].T @ rots[j]
        t = rots[i].T @ (trans[j] - trans[i])
        return r, t

    # Noisy odometry measurements + integrated vertex estimates.
    odo = []
    est_r, est_t = [rots[0]], [trans[0]]
    for k in range(t_total - 1):
        r, t = rel(k, k + 1)
        r = r @ _so3_exp(rng.normal(0, args.rot_noise, 3))
        t = t + rng.normal(0, args.trans_noise, 3)
        odo.append((r, t))
        est_r.append(est_r[-1] @ r)
        est_t.append(est_t[-1] + est_r[-2] @ t)

    # Closures: ground-truth-near pairs one or more rings apart.
    closures = []
    for i in range(t_total):
        for j in range(i + ring - 3, min(i + 3 * ring, t_total)):
            if np.linalg.norm(trans[j] - trans[i]) < args.closure_radius:
                if rng.random() < args.closure_prob:
                    r, t = rel(i, j)
                    r = r @ _so3_exp(rng.normal(0, 0.005, 3))
                    t = t + rng.normal(0, 0.02, 3)
                    closures.append((i, j, r, t))

    ti, ri = 1.0 / args.trans_noise**2, 1.0 / args.rot_noise**2
    tc, rc = 1.0 / 0.02**2, 1.0 / 0.005**2

    def info_tri(tv, rv):
        diag = [tv, tv, tv, rv, rv, rv]
        vals = []
        for a, b in _TRI:
            vals.append(diag[a] if a == b else 0.0)
        return " ".join(f"{v:.9g}" for v in vals)

    lines = []
    for k in range(t_total):
        q = _rot_to_quat(est_r[k])
        lines.append(
            "VERTEX_SE3:QUAT "
            + f"{k} " + " ".join(f"{v:.9g}" for v in est_t[k])
            + " " + " ".join(f"{v:.9g}" for v in q)
        )
    odo_tri = info_tri(ti, ri)
    for k, (r, t) in enumerate(odo):
        q = _rot_to_quat(r)
        lines.append(
            f"EDGE_SE3:QUAT {k} {k + 1} "
            + " ".join(f"{v:.9g}" for v in t)
            + " " + " ".join(f"{v:.9g}" for v in q)
            + " " + odo_tri
        )
    clo_tri = info_tri(tc, rc)
    for i, j, r, t in closures:
        q = _rot_to_quat(r)
        lines.append(
            f"EDGE_SE3:QUAT {i} {j} "
            + " ".join(f"{v:.9g}" for v in t)
            + " " + " ".join(f"{v:.9g}" for v in q)
            + " " + clo_tri
        )
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"sphere{t_total}.g2o")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {path}: {t_total} vertices, {len(odo)} odometry edges, "
        f"{len(closures)} closures"
    )


if __name__ == "__main__":
    main()
