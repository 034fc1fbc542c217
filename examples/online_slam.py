#!/usr/bin/env python3
"""Example: incremental (online) SLAM on the bundled ``ex_data/seq1`` sweeps.

Scans arrive one at a time, exactly as on a robot: each registers against
the current keyframe; every few keyframes the back-end searches for
revisits, registers them, and re-optimizes the keyframe graph with the
robust GNC kernel — re-anchoring the LIVE pose, so drift corrections land
mid-stream instead of at shutdown.  The same loop is crash-resumable
(``icp_tpu.resilient.resumable_online_slam``) and available from the CLI::

  PYTHONPATH=. python -m icp_tpu.cli odometry --scans ex_data/seq1/sweep_*.conf \\
      -m trimmed --online --loop-radius 2.0 --odometry-weight 100 \\
      --loop-weight 100 --closure-information

Run: python examples/online_slam.py   (CPU-friendly, ~2 min)
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
SEQ = os.path.join(REPO, "ex_data", "seq1")


def main():
    paths = sorted(glob.glob(os.path.join(SEQ, "sweep_*.conf")))
    if os.environ.get("ICP_EXAMPLES_QUICK") == "1":
        paths = paths[:30]
    clouds = [parse_sweep(p, dtype=np.float64) for p in paths]
    cap = max(c.capacity for c in clouds)
    clouds = [icp.pad_to(c, cap) for c in clouds]
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = np.asarray(json.load(f)["poses"])  # (T, 3) world [x, y, theta]
    # Ground truth in the scan-0 frame (the stream's gauge).
    c0, s0 = np.cos(gt[0, 2]), np.sin(gt[0, 2])
    gt_xy = (gt[:, :2] - gt[0, :2]) @ np.array([[c0, s0], [-s0, c0]]).T

    method = icp.from_method("trimmed", 2)
    cfg = icp.DriverConfig(
        max_iterations=150, angle_tolerance=1e-6, translation_tolerance=1e-6
    )
    online = slam.OnlineSlam(
        method, cfg,
        translation_threshold=0.5, angle_threshold=0.15,
        loop_every=8, loop_radius=2.0, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
        closure_information=True,  # anisotropic corridor-aware closures
    )
    worst_live = 0.0
    for t, scan in enumerate(clouds):
        u = online.add_scan(scan)
        err = float(np.linalg.norm(np.asarray(u.pose.translation) - gt_xy[t]))
        worst_live = max(worst_live, err)
        if u.refined:
            print(f"scan {t:3d}: refinement ran — {u.num_closures} closures, "
                  f"live error {err:.3f} m")
    online.finalize()
    kf = np.asarray(online.keyframe_poses.translation)
    final_err = float(np.linalg.norm(np.asarray(online._pose.translation) - gt_xy[-1]))
    print(f"stream done: {len(kf)} keyframes, {len(online._loop_edges)} closures, "
          f"final live error {final_err:.3f} m (worst during stream {worst_live:.3f} m)")
    return final_err


if __name__ == "__main__":
    main()
