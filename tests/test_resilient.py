"""Elastic-restart tests: kill a streaming odometry run mid-sequence and
resume; the recovered trajectory must be bit-identical to an uninterrupted
run (the reference has no recovery story — SURVEY §5; this is the
preemptible-worker subsystem of the TPU deployment model)."""

import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu.resilient import (
    CheckpointManager,
    job_status,
    resumable_stream_odometry,
    run_with_retries,
)


def _scan_sequence(rng, t_total=12, n=64):
    world = rng.uniform(-12, 12, (n, 2))
    scans = []
    for t in range(t_total):
        ang = 0.04 * t
        c, s = np.cos(ang), np.sin(ang)
        pts = (world - [0.12 * t, 0.0]) @ np.array([[c, -s], [s, c]])
        scans.append(icp.from_points(pts, capacity=n, dtype=np.float64))
    return scans


def _run_all(scans, ckpt_dir):
    method = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-6, translation_tolerance=1e-6
    )
    return list(
        resumable_stream_odometry(
            scans, method, cfg, str(ckpt_dir), checkpoint_every=4
        )
    )


def test_checkpoint_manager_rotation_and_atomicity(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for step in (0, 5, 9):
        mgr.save(step, {"x": np.full((3,), step)})
    # keep=2: step 0 rotated out
    import os

    names = sorted(os.listdir(tmp_path))
    assert names == ["ckpt_000000005.npz", "ckpt_000000009.npz"]
    step, arrays = mgr.latest()
    assert step == 9 and arrays["x"][0] == 9


def test_corrupt_latest_falls_back(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3)
    mgr.save(1, {"x": np.asarray([1.0])})
    mgr.save(2, {"x": np.asarray([2.0])})
    with open(tmp_path / "ckpt_000000002.npz", "wb") as f:
        f.write(b"garbage")
    with pytest.warns(UserWarning, match="unreadable"):
        step, arrays = mgr.latest()
    assert step == 1 and arrays["x"][0] == 1.0


def test_resume_is_bit_identical_to_uninterrupted(tmp_path, rng):
    scans = _scan_sequence(rng)
    full = _run_all(scans, tmp_path / "full")

    # Interrupted run: process scans, crash after scan 6 (checkpoint at 3).
    method = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-6, translation_tolerance=1e-6
    )
    part_dir = tmp_path / "part"
    gen = resumable_stream_odometry(scans, method, cfg, str(part_dir), checkpoint_every=4)
    seen = []
    for item in gen:
        seen.append(item)
        if item[0] == 6:
            gen.close()  # simulated kill
            break

    status = job_status(str(part_dir))
    assert status["checkpointed"] and status["last_scan"] == 3

    resumed = list(
        resumable_stream_odometry(scans, method, cfg, str(part_dir), checkpoint_every=4)
    )
    # Resume starts at the scan after the last checkpoint...
    assert resumed[0][0] == 4
    assert resumed[-1][0] == len(scans) - 1
    # ...and every re-processed pose matches the uninterrupted run exactly.
    by_t = {t: (pose, kf) for t, pose, kf, _ in full}
    for t, pose, is_kf, _ in resumed:
        exp_pose, exp_kf = by_t[t]
        np.testing.assert_array_equal(
            np.asarray(pose.rotation), np.asarray(exp_pose.rotation)
        )
        np.testing.assert_array_equal(
            np.asarray(pose.translation), np.asarray(exp_pose.translation)
        )
        assert is_kf == exp_kf


def test_supervisor_restarts_through_failures(tmp_path, rng):
    scans = _scan_sequence(rng)
    method = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-6, translation_tolerance=1e-6
    )
    crashes = {"left": 2}
    restarts = []

    def job():
        out = []
        for item in resumable_stream_odometry(
            scans, method, cfg, str(tmp_path / "sup"), checkpoint_every=3
        ):
            out.append(item)
            # Two injected preemptions at different points of the stream.
            if crashes["left"] and item[0] in (4, 8):
                crashes["left"] -= 1
                raise RuntimeError("preempted")
        return out

    final = run_with_retries(
        job, max_restarts=5, on_restart=lambda a, e: restarts.append(str(e))
    )
    assert len(restarts) == 2
    assert final[-1][0] == len(scans) - 1

    # The supervised, twice-preempted run ends at the same trajectory as a
    # clean one.
    full = _run_all(scans, tmp_path / "clean")
    np.testing.assert_array_equal(
        np.asarray(final[-1][1].translation), np.asarray(full[-1][1].translation)
    )


def test_supervisor_exhausts_budget(tmp_path):
    calls = []

    def job():
        calls.append(1)
        raise ValueError("always fails")

    with pytest.raises(ValueError):
        run_with_retries(job, max_restarts=2)
    assert len(calls) == 3  # initial + 2 retries


def test_resumable_online_slam_bit_identical(rng, tmp_path):
    """Kill-anywhere restart of the online SLAM loop: resuming from the
    latest checkpoint reproduces the uninterrupted run's keyframe
    trajectory bit for bit (state_dict round-trips everything that affects
    future steps, including closure bookkeeping and the cost history that
    gates coarse retries)."""
    import math

    from icp_tpu import resilient, slam

    world = rng.uniform(-25, 25, (140, 2))
    scans = []
    t_steps = 33
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = 4 * math.cos(phi), 4 * math.sin(phi), phi + math.pi / 2
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        scans.append(
            icp.from_points(pts + rng.normal(0, 0.02, pts.shape),
                            capacity=144, dtype=np.float64)
        )
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(
        max_iterations=40, angle_tolerance=1e-5, translation_tolerance=1e-5
    )
    kwargs = dict(
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )

    # Uninterrupted reference.
    ref = slam.OnlineSlam(method, cfg, **kwargs)
    for s in scans:
        ref.add_scan(s)
    ref.finalize()

    # Interrupted run: process 17 scans, "crash", restart from checkpoints.
    mgr = resilient.CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    it = resilient.resumable_online_slam(
        scans, method, cfg, mgr, checkpoint_every=5, **kwargs
    )
    for t, online, _ in it:
        if t == 16:
            break  # crash mid-stream (after the t=14 checkpoint)
    resumed = None
    for t, online, _ in resilient.resumable_online_slam(
        scans, method, cfg, mgr, checkpoint_every=5, **kwargs
    ):
        resumed = online
    assert resumed is not None
    resumed.finalize()

    np.testing.assert_array_equal(
        np.asarray(resumed.keyframe_poses.translation),
        np.asarray(ref.keyframe_poses.translation),
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.keyframe_poses.rotation),
        np.asarray(ref.keyframe_poses.rotation),
    )
    assert resumed._loop_edges == ref._loop_edges
