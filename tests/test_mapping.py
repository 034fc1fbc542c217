"""Scan-to-map odometry and voxel filter tests."""

import numpy as np

import icp_tpu as icp
from icp_tpu import mapping


def test_voxel_downsample_grid():
    pts = np.array([[0.01, 0.02], [0.03, 0.01], [1.5, 1.5], [1.52, 1.51]])
    out = mapping.voxel_downsample(pts, 0.5)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(sorted(out[:, 0]), [0.02, 1.51])


def test_voxel_downsample_empty():
    out = mapping.voxel_downsample(np.zeros((0, 3)), 0.5)
    assert out.shape == (0, 3)


def test_scan_to_map_beats_scan_to_scan_drift(rng):
    """Scan-to-map anchors poses to the aggregated map: end-pose error after
    a noisy loop must be no worse than scan-to-scan chaining."""
    import math

    world = rng.uniform(-25, 25, (160, 2))
    t_steps, radius = 25, 4.0
    poses_true, scans = [], []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        poses_true.append((px, py))
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.02, pts.shape)
        scans.append(icp.from_points(pts, capacity=160, dtype=np.float64))

    # Scan-to-scan front-end uses trimmed; scan-to-map uses the recommended
    # robust method (the map's non-overlap regions otherwise drag poses —
    # see the mapping module doc).
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    robust = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5)

    s2s = list(icp.odometry.stream_odometry(scans, method, cfg, 0.5, 0.2))
    s2m = list(
        mapping.scan_to_map_odometry(
            scans, robust, cfg, voxel_size=0.05, map_capacity=2048,
            keyframe_translation=0.5, keyframe_angle=0.2,
        )
    )
    assert len(s2m) == t_steps

    # True end pose in scan-0 frame is the identity (loop closes).
    err_s2s = float(np.linalg.norm(np.asarray(s2s[-1][0].translation)))
    err_s2m = float(np.linalg.norm(np.asarray(s2m[-1][0].translation)))
    assert err_s2m <= err_s2s * 1.2 + 1e-6, (err_s2m, err_s2s)
    # Robust scan-to-map closes the loop tightly.
    assert err_s2m < 0.05, err_s2m


def test_scan_to_map_first_scan_exceeding_capacity(rng):
    """Regression: a dense first scan occupying more voxels than
    map_capacity must be trimmed, not crash on the second scan."""
    pts = rng.uniform(-50, 50, (800, 2))  # ~800 occupied voxels at 0.5
    scans = [
        icp.from_points(pts, capacity=800, dtype=np.float64),
        icp.from_points(pts + [0.1, 0.0], capacity=800, dtype=np.float64),
    ]
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=10, angle_tolerance=1e-4, translation_tolerance=1e-4)
    out = list(
        mapping.scan_to_map_odometry(
            scans, method, cfg, voxel_size=0.5, map_capacity=256
        )
    )
    # The regression contract is "no ValueError crash on scan 2" — the
    # centroid-trimmed 256-point map of an 800-voxel uniform scene is not a
    # meaningful registration target, so only require a finite result.
    assert len(out) == 2
    assert np.isfinite(np.asarray(out[1][0].translation)).all()
