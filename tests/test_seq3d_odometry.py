"""End-to-end 3D odometry + SE(3) loop closure on the bundled ``ex_data/seq3d``
multi-ring LiDAR sequence (VERDICT round-2 item 2).

The reference's 3D story ends at a single PLY pair
(``/root/reference/tests/test_ply.cpp:89-131``); ``ex_data/seq3d`` is a
committed 72-sweep raycast Velodyne-like sequence with full SE(3) ground
truth (``scripts/make_lidar_seq3d.py``: altitude undulation + pitch, so the
poses are not planar).  These tests pin the net-new 3D pipeline end to end:
sweep parsing, scan-to-scan GICP chaining accuracy against ground truth,
SE(3) loop closure through ``run_slam`` (with the robust kernel), and
generator determinism.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np

import icp_tpu as icp
from icp_tpu import geometry, odometry, slam

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQ = os.path.join(REPO, "ex_data", "seq3d")


def _load(n=None):
    paths = sorted(glob.glob(os.path.join(SEQ, "sweep_*.ply")))[:n]
    clouds = [
        icp.from_points(icp.read_ply(p), capacity="bucket", dtype=np.float32)
        for p in paths
    ]
    cap = max(c.capacity for c in clouds)
    scans = icp.stack([icp.pad_to(c, cap) for c in clouds])
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = json.load(f)
    rot = np.asarray(gt["rotations"])[: len(paths)]
    tr = np.asarray(gt["translations"])[: len(paths)]
    return scans, rot, tr


def _gicp():
    return icp.from_method(
        "gicp", 3, icp.Config(dim=3, neighbors=10, normal_neighbors=10)
    )


_CFG = icp.DriverConfig(
    max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5
)


def test_sweeps_parse():
    pts = icp.read_ply(os.path.join(SEQ, "sweep_000.ply"))
    assert 1300 <= pts.shape[0] <= 1536  # 12x128 beams minus dropouts/no-hit
    assert pts.shape[1] == 3
    assert np.all(np.isfinite(pts))
    r = np.linalg.norm(pts, axis=-1)
    assert r.min() >= 0.3 and r.max() <= 30.0  # range_min/range_max honored
    # Vertical structure is present (floor/ceiling hits span the rings).
    assert pts[:, 2].min() < -1.0 and pts[:, 2].max() > 1.0


def test_groundtruth_matches_sweep_count():
    paths = glob.glob(os.path.join(SEQ, "sweep_*.ply"))
    with open(os.path.join(SEQ, "groundtruth.json")) as f:
        gt = json.load(f)
    assert len(gt["rotations"]) == len(gt["translations"]) == len(paths) == 72
    rots = np.asarray(gt["rotations"])
    # Rotations are orthonormal SE(3) ground truth, with genuine pitch
    # (altitude undulation): the sensor x-axis leaves the horizontal plane.
    eye = np.einsum("tij,tkj->tik", rots, rots)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-6)
    assert np.abs(rots[:, 2, 0]).max() > 0.02  # forward axis has a z component


def test_chain_recovers_ground_truth_motion():
    """Scan-to-scan GICP odometry on the first 10 sweeps: every SE(3) step
    within 2 cm / 0.02 rotation-Frobenius of ground truth (measured:
    median ~4 mm over the full sequence)."""
    scans, rot, tr = _load(10)
    traj = odometry.chain_scans(scans, _gicp(), _CFG)
    rel = geometry.inverse(traj.relative)  # frame-t pose of frame t+1
    for k in range(9):
        rel_gt_t = rot[k].T @ (tr[k + 1] - tr[k])
        rel_gt_rot = rot[k].T @ rot[k + 1]
        t_err = np.linalg.norm(np.asarray(rel.translation[k]) - rel_gt_t)
        rot_err = np.linalg.norm(np.asarray(rel.rotation[k]) - rel_gt_rot)
        assert t_err < 0.02, (k, t_err)
        assert rot_err < 0.02, (k, rot_err)


def test_slam_closes_loop_se3():
    """Full 72-sweep loop: GICP odometry accumulates real drift; SE(3) loop
    closure + robust GNC pose graph pulls the end pose back to ground truth
    (measured: end error 0.16 m -> 0.004 m).  All in float32 — the
    production dtype — which pins the dtype-aware small-angle guards in
    icp_tpu.lie (fixed cutoffs NaN'd the float32 SE(3) Jacobians)."""
    scans, rot, tr = _load()
    gt_t0 = np.einsum("ij,tj->ti", rot[0].T, tr - tr[0])  # gt in scan-0 frame

    res = slam.run_slam(
        scans, _gicp(), _CFG, loop_radius=2.0, loop_min_separation=50,
        loop_weight=10.0, robust="gnc_gm",
    )
    assert res.loop_edges.shape[0] >= 1
    assert res.edge_weights is not None
    assert np.all(np.isfinite(np.asarray(res.edge_weights)))
    # At least one revisit closure survives the (conservative) robust gate.
    assert np.asarray(res.edge_weights)[71:].max() > 0.5

    end_raw = float(
        np.linalg.norm(np.asarray(res.trajectory.poses.translation[-1]) - gt_t0[-1])
    )
    end_opt = float(np.linalg.norm(np.asarray(res.poses.translation[-1]) - gt_t0[-1]))
    assert end_raw > 0.05, end_raw  # odometry accumulated real drift
    assert end_opt < 0.02, (end_raw, end_opt)  # the SE(3) closure removes it

    import jax.numpy as jnp

    from icp_tpu import eval as tev
    from icp_tpu.geometry import RigidTransform

    gt_rt = RigidTransform(jnp.asarray(rot), jnp.asarray(tr))

    def ate(poses):
        # Library metric, first-frame gauge (scan-0 frame), RMSE statistic.
        return tev.ate(poses, gt_rt, align="first").rmse

    assert ate(res.poses) <= ate(res.trajectory.poses) + 1e-6


def test_generator_reproduces_committed_data(tmp_path):
    """The committed dataset is exactly what scripts/make_lidar_seq3d.py
    produces — guards against script/data drift."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_lidar_seq3d.py"),
            "--out",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    for name in ("sweep_000.ply", "sweep_037.ply", "groundtruth.json"):
        with open(os.path.join(SEQ, name), "rb") as f_ref, open(
            tmp_path / name, "rb"
        ) as f_new:
            assert f_ref.read() == f_new.read(), f"{name} drifted from generator"
