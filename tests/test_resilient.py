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
