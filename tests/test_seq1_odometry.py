"""End-to-end odometry on the bundled ``ex_data/seq1`` LiDAR sequence.

The reference's real-data ingestion path is ``script/rosbag_extract.py``
(LaserScan sweeps -> .conf files); ``ex_data/seq1`` is a committed 120-sweep
raycast sequence in that exact format with ground-truth poses
(``scripts/make_lidar_seq.py``).  These tests pin the full pipeline the
documented example (``examples/odometry_sequence.py``) runs: sweep parsing,
scan-to-scan chaining accuracy against ground truth, and generator
determinism (committed data must match the script that claims to produce
it).
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np

import icp_tpu as icp
from icp_tpu import odometry
from icp_tpu.io import parse_sweep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, "ex_data", "seq1")


def _load(n=None, dtype=np.float64):
    paths = sorted(glob.glob(os.path.join(SEQ, "sweep_*.conf")))[:n]
    clouds = [parse_sweep(p, dtype=dtype) for p in paths]
    cap = max(c.capacity for c in clouds)
    scans = icp.stack([icp.pad_to(c, cap) for c in clouds])
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = np.asarray(json.load(f)["poses"])[: len(paths)]
    return scans, gt


def _gt_step_motions(gt):
    """Ground-truth pose of sweep t+1 in the frame of sweep t."""
    th = gt[:, 2]
    c, s = np.cos(th[:-1]), np.sin(th[:-1])
    dx, dy = np.diff(gt[:, 0]), np.diff(gt[:, 1])
    return np.stack([c * dx + s * dy, -s * dx + c * dy], -1), np.diff(th)


def test_sweep_files_parse_with_dropouts():
    sweep = parse_sweep(os.path.join(SEQ, "sweep_000.conf"))
    n_valid = int(sweep.count)
    assert 400 <= n_valid <= 540  # 540 beams minus dropouts/out-of-range
    pts = np.asarray(sweep.points[:n_valid])
    assert np.all(np.isfinite(pts))
    r = np.linalg.norm(pts, axis=-1)
    assert r.min() >= 0.05 and r.max() <= 30.0  # range_min/range_max honored


def test_chain_recovers_ground_truth_motion():
    """Scan-to-scan trimmed odometry on the first 14 sweeps: every step
    within 3 cm of ground truth (measured: median ~4 mm over the full
    sequence; see examples/odometry_sequence.py)."""
    scans, gt = _load(14)
    method = icp.from_method("trimmed", 2)
    cfg = icp.DriverConfig(
        max_iterations=150, angle_tolerance=1e-6, translation_tolerance=1e-6
    )
    traj = odometry.chain_scans(scans, method, cfg)
    mot = np.asarray(icp.geometry.inverse(traj.relative).translation)
    rel_gt, dth_gt = _gt_step_motions(gt)
    err = np.linalg.norm(mot - rel_gt, axis=-1)
    assert err.max() < 0.03, err
    est_rot = np.asarray(icp.geometry.inverse(traj.relative).rotation)
    est_dth = np.arctan2(est_rot[:, 1, 0], est_rot[:, 0, 0])
    np.testing.assert_allclose(est_dth, dth_gt, atol=5e-3)


def test_groundtruth_matches_sweep_count():
    paths = glob.glob(os.path.join(SEQ, "sweep_*.conf"))
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = json.load(f)["poses"]
    assert len(gt) == len(paths) == 120


def test_generator_reproduces_committed_data(tmp_path):
    """The committed dataset is exactly what scripts/make_lidar_seq.py
    produces — guards against script/data drift."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_lidar_seq.py"),
            "--steps",
            "120",
            "--out",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    for name in ("sweep_000.conf", "sweep_057.conf", "groundtruth.json"):
        with open(os.path.join(SEQ, name)) as f_ref, open(tmp_path / name) as f_new:
            assert f_ref.read() == f_new.read(), f"{name} drifted from generator"
