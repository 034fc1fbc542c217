"""Mid-stream loop closure on the bundled two-lap ``ex_data/seq2loop``.

seq1's only revisit lands in its final keyframes, so its online runs never
accept a closure (and never re-solve) while scans are still arriving — the
round-4 bench recorded ``refine_stall_ms: null`` with exactly that
explanation.  ``seq2loop`` (``scripts/make_lidar_seq.py --laps 2``) drives
the same world twice: every lap-2 pose revisits a lap-1 pose, so
:class:`icp_tpu.slam.OnlineSlam` detects, registers, and re-solves loop
closures MID-STREAM.  These tests pin that behavior — the workload behind
the ``online_slam_*_seq2loop`` bench rows.

Reference frame: net-new (the reference's only loop-scale artifact is a
single scan pair; ``/root/reference/bench/bench.cpp:41-61`` registers one
pair per run).  The online evidence style follows the repo's own
round-3/4 latency rows (BASELINE.md).
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import slam
from icp_tpu.driver import DriverConfig
from icp_tpu.io import parse_sweep

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, "ex_data", "seq2loop")


def test_generator_reproduces_committed_data(tmp_path):
    """The committed two-lap dataset is exactly what the generator with
    ``--laps 2 --steps 240`` produces (guards script/data drift, the same
    pin seq1 carries)."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_lidar_seq.py"),
            "--steps", "240", "--laps", "2",
            "--out", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    for name in ("sweep_000.conf", "sweep_131.conf", "sweep_239.conf",
                 "groundtruth.json"):
        with open(os.path.join(SEQ, name)) as f_ref, \
                open(tmp_path / name) as f_new:
            assert f_ref.read() == f_new.read(), f"{name} drifted from generator"


def test_lap2_revisits_lap1_poses():
    """Ground truth of the two-lap run: every lap-2 pose coincides with a
    lap-1 pose (same station on the closed polyline) — the geometric
    property that makes mid-stream closures possible at all."""
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = np.asarray(json.load(f)["poses"])
    assert gt.shape[0] == 240
    lap1, lap2 = gt[:120], gt[120:]
    assert np.allclose(lap1[:, :2], lap2[:, :2], atol=1e-9)
    dth = np.abs((lap1[:, 2] - lap2[:, 2] + np.pi) % (2 * np.pi) - np.pi)
    assert dth.max() < 1e-9


@pytest.fixture(scope="module")
def online_run():
    """One full OnlineSlam pass over the 240-scan stream (the bench
    configuration), shared by the assertions below — the stream is the
    expensive part, the checks are free."""
    paths = sorted(glob.glob(os.path.join(SEQ, "sweep_*.conf")))
    clouds = [icp.pad_to(parse_sweep(p, dtype=np.float32), 1024) for p in paths]
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    online = slam.OnlineSlam(
        method, DriverConfig(max_iterations=50),
        translation_threshold=0.5, angle_threshold=0.15,
        loop_every=8, loop_radius=2.0, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    refine_scans, closure_counts, kf_scan_idx = [], [], []
    for i, s in enumerate(clouds):
        u = online.add_scan(s)
        if u.refined:
            refine_scans.append(i)
            closure_counts.append(u.num_closures)
        if u.is_keyframe:
            kf_scan_idx.append(i)
    online.finalize()
    return online, refine_scans, closure_counts, kf_scan_idx, len(clouds)


def test_closures_accepted_mid_stream(online_run):
    """Refinements that ACCEPT closures fire while the stream is still
    running (not only at finalize) — the seq1 impossibility."""
    online, refine_scans, closure_counts, _, n_scans = online_run
    mid = [i for i in refine_scans if i < n_scans - 1]
    assert mid, "no mid-stream refinement fired"
    # The first accepting refinement lands early in lap 2 (drift is still
    # inside the 2 m candidate radius), not at the stream's end.
    assert mid[0] < 160, mid
    assert closure_counts[0] > 0
    # Closures keep accumulating across subsequent mid-stream refinements.
    assert len(online._loop_edges) >= 10, len(online._loop_edges)


def test_keyframe_ate_after_midstream_closures(online_run):
    """Keyframe ATE vs ground truth (first-pose alignment: the SLAM world
    frame is scan 0's).  Measured 0.111 m mean over the ~96 m two-lap
    path; bound at 0.3 m.  Dead-reckoning drift over two laps is several
    times that (seq1's one-lap pre-closure drift alone is 0.85 m,
    BASELINE.md), so the bound fails if the back-end stops correcting."""
    from icp_tpu import eval as tev
    from icp_tpu.geometry import RigidTransform
    import jax.numpy as jnp

    online, _, _, kf_scan_idx, _ = online_run
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = np.asarray(json.load(f)["poses"])
    ths = gt[kf_scan_idx, 2]
    c, s = np.cos(ths), np.sin(ths)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    gt_rt = RigidTransform(jnp.asarray(rot), jnp.asarray(gt[kf_scan_idx, :2]))
    r = tev.ate(online.keyframe_poses, gt_rt, align="first")
    assert float(r.mean) <= 0.3, r.as_dict()
