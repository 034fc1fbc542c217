#!/usr/bin/env python3
"""Example: multi-session mapping — merge two SLAM runs into one map.

A robot maps the loop corridor (session A), is taken off duty, and is
redeployed later from the same dock (session B, its own world frame).
``slam.merge_sessions`` unions the two sessions into ONE continuing
:class:`~icp_tpu.slam.OnlineSlam`: B's trajectory is carried into A's
frame through an anchor transform, a bridge odometry edge makes the
union a single chain, and one ordinary (bucketed) refinement finds the
cross-session revisits and jointly re-solves both trajectories with the
robust kernel.  The anchor here comes from registering B's first sweep
onto A's dock keyframe (the known-rendezvous form; descriptor-mode
sessions can recover it by global relocalization instead —
``merge_sessions(a, b)`` with no anchor).

Data: ``ex_data/seq2loop`` (two laps of the seq1 world) split into
lap 1 = session A and lap 2 = session B — so every session-B pose
genuinely revisits a session-A pose.

Run: python examples/multi_session_merge.py   (CPU-friendly, ~3 min)
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu" or os.environ.get("ICP_EXAMPLES_CPU") == "1":
    # (ICP_EXAMPLES_CPU survives sitecustomize env pinning - smoke tests use it.)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import icp_tpu as icp
from icp_tpu import slam
from icp_tpu.io import parse_sweep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, "ex_data", "seq2loop")


def main():
    paths = sorted(glob.glob(os.path.join(SEQ, "sweep_*.conf")))
    lap1, lap2 = paths[:120], paths[120:]
    if os.environ.get("ICP_EXAMPLES_QUICK") == "1":
        lap1, lap2 = lap1[:40], lap2[:40]  # the same arc, both laps
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = np.asarray(json.load(f)["poses"])

    def load(ps):
        clouds = [parse_sweep(p, dtype=np.float64) for p in ps]
        return [icp.pad_to(c, 1024) for c in clouds]

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    cfg = icp.DriverConfig(max_iterations=50)

    def session():
        return slam.OnlineSlam(
            method, cfg,
            translation_threshold=0.5, angle_threshold=0.15,
            loop_every=8, loop_radius=2.0, loop_min_separation=10,
            robust="gnc_gm", robust_scale="auto",
            odometry_weight=100.0, loop_weight=100.0,
        )

    a = session()
    for s in load(lap1):
        a.add_scan(s)
    b = session()
    b_clouds = load(lap2)
    for s in b_clouds:
        b.add_scan(s)

    # Rendezvous anchor: lap 2 starts at the dock (= A's scan-0 pose), so
    # registering B's first sweep onto A's dock keyframe gives
    # world_a-from-world_b directly.
    dock = a._kf_clouds[0]
    res, _ = icp.converge(
        method, b_clouds[0], dock, icp.identity(2, dtype=dock.dtype), cfg
    )
    anchor = res.transform

    merged, report = slam.merge_sessions(a, b, anchor=anchor)
    print(
        f"merged sessions: {report.keyframes[0]} + {report.keyframes[1]} "
        f"keyframes, {report.new_closures} closures added by the joint "
        f"refinement ({len(merged._loop_edges)} total)"
    )

    # Merged end error: the last processed sweep's ground truth, expressed
    # in A's scan-0 frame.
    last_idx = 120 + len(lap2) - 1
    p0, th0 = gt[0, :2], gt[0, 2]
    c, s = np.cos(th0), np.sin(th0)
    r0 = np.array([[c, -s], [s, c]])
    want = (gt[last_idx, :2] - p0) @ r0
    got = np.asarray(merged._pose.translation)
    print(f"merged live-pose error vs ground truth: {np.linalg.norm(got - want):.3f} m")


if __name__ == "__main__":
    main()
