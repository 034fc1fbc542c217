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


# ------------------------------------------------------------------
# Device-side map maintenance (VERDICT round-2 item 8)


def _masked(rng, n, d, valid, scale=5.0):
    pts = rng.uniform(-scale, scale, (n, d))
    pts[valid:] = 99.0  # garbage in padded slots; must not leak
    mask = np.arange(n) < valid
    return pts, mask


@np.errstate(all="ignore")
def test_voxel_downsample_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    for d in (2, 3):
        pts, mask = _masked(rng, 256, d, 201)
        host = mapping.voxel_downsample(pts[:201], 0.5)
        dev_pts, count = mapping.voxel_downsample_device(
            jnp.asarray(pts), jnp.asarray(mask), 0.5, capacity=256
        )
        k = int(count)
        assert k == len(host)
        # Same centroids in the same (x-major cell) order.
        np.testing.assert_allclose(np.asarray(dev_pts)[:k], host, atol=1e-12)
        # Padded output rows are zeroed.
        np.testing.assert_array_equal(np.asarray(dev_pts)[k:], 0.0)


def test_voxel_downsample_device_capacity_truncates():
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    pts, mask = _masked(rng, 128, 2, 128)
    full, count_full = mapping.voxel_downsample_device(
        jnp.asarray(pts), jnp.asarray(mask), 0.25, capacity=128
    )
    k = int(count_full)
    assert k > 16
    trunc, count_t = mapping.voxel_downsample_device(
        jnp.asarray(pts), jnp.asarray(mask), 0.25, capacity=16
    )
    assert int(count_t) == 16
    np.testing.assert_allclose(
        np.asarray(trunc), np.asarray(full)[:16], atol=1e-12
    )


def test_merge_map_device_matches_host_as_set(rng):
    """Device merge == LocalMap.merged_with up to ordering/tie policy,
    including the overflow trim toward the scan centroid.  The host base
    must itself fit the capacity (LocalMap only enforces capacity in
    merged_with), so the base is built the way scan_to_map builds it."""
    import jax.numpy as jnp

    def canon(a):
        return a[np.lexsort(a.T[::-1])]

    for capacity, n_map, n_scan in ((512, 300, 200), (64, 300, 200)):
        map_pts = rng.uniform(-5, 5, (n_map, 2))
        scan_pts = rng.uniform(-2, 2, (n_scan, 2))
        # Host base: empty -> merged_with(map_pts) (capacity-respecting).
        empty = mapping.LocalMap(0.3, capacity, np.zeros((0, 2)))
        host_base = empty.merged_with(map_pts)
        host = host_base.merged_with(scan_pts)

        # Device base: same construction (empty map + map_pts merge, center
        # = map_pts centroid, matching merged_with's trim center).
        zero = jnp.zeros((capacity, 2))
        base_pts, base_count = mapping.merge_map_device(
            zero, jnp.int32(0), jnp.asarray(map_pts), jnp.ones(n_map, bool),
            0.3, capacity, jnp.asarray(map_pts.mean(axis=0)),
        )
        np.testing.assert_allclose(
            canon(np.asarray(base_pts)[: int(base_count)]),
            canon(host_base.points),
            atol=1e-9,
        )
        out, count = mapping.merge_map_device(
            base_pts, base_count, jnp.asarray(scan_pts),
            jnp.ones(n_scan, bool), 0.3, capacity,
            jnp.asarray(scan_pts.mean(axis=0)),
        )
        got = np.asarray(out)[: int(count)]
        assert len(got) == len(host.points)
        np.testing.assert_allclose(canon(got), canon(host.points), atol=1e-9)


def test_scan_to_map_device_matches_host_trajectory(rng):
    """device_map=True reproduces the host-map trajectory (same scans, same
    keyframe schedule, poses equal to fp tolerance)."""
    import math

    world = rng.uniform(-25, 25, (160, 2))
    t_steps, radius = 12, 4.0
    scans = []
    for k in range(t_steps):
        phi = math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.01, pts.shape)
        scans.append(icp.from_points(pts, capacity=160, dtype=np.float64))

    method = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5
    )
    host = list(
        mapping.scan_to_map_odometry(scans, method, cfg, voxel_size=0.2, map_capacity=1024)
    )
    dev = list(
        mapping.scan_to_map_odometry(
            scans, method, cfg, voxel_size=0.2, map_capacity=1024, device_map=True
        )
    )
    assert len(host) == len(dev) == t_steps
    for t in range(t_steps):
        assert bool(host[t][1]) == bool(dev[t][1]), t  # same keyframe schedule
        np.testing.assert_allclose(
            np.asarray(dev[t][0].translation),
            np.asarray(host[t][0].translation),
            atol=1e-6,
        )


def _half_loop_scans(rng, t_steps=10, n_world=160):
    import math

    world = rng.uniform(-25, 25, (n_world, 2))
    radius = 4.0
    scans = []
    for k in range(t_steps):
        phi = math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.01, pts.shape)
        scans.append(icp.from_points(pts, capacity=n_world, dtype=np.float64))
    return scans


def test_scan_to_map_aux_cache_matches_plain(rng):
    """Methods with precompute (gicp here) take the map-aux-cached converge
    path; the trajectory must match a control with precompute stripped
    (same math, aux derived inside init) to fp tolerance."""
    import dataclasses

    scans = _half_loop_scans(rng)
    method = icp.from_method("gicp", 2, icp.Config(dim=2))
    assert method.precompute is not None  # the cached path actually engages
    plain = dataclasses.replace(method, precompute=None, with_precomputed=None)
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5
    )
    cached = list(
        mapping.scan_to_map_odometry(scans, method, cfg, voxel_size=0.2, map_capacity=1024)
    )
    control = list(
        mapping.scan_to_map_odometry(scans, plain, cfg, voxel_size=0.2, map_capacity=1024)
    )
    assert len(cached) == len(control) == len(scans)
    for t in range(len(scans)):
        assert bool(cached[t][1]) == bool(control[t][1]), t
        np.testing.assert_allclose(
            np.asarray(cached[t][0].translation),
            np.asarray(control[t][0].translation),
            atol=1e-9,
        )


def test_scan_to_map_ndt_tracks_loop(rng):
    """NDT scan-to-map (its classic production pairing: persistent Gaussian
    map): the half-loop trajectory stays tight.  Needs DENSE scans — at the
    drift test's 160 points over 50x50 m no cell reaches min_points and the
    objective has no gradient (that failure mode is by construction), and
    FINE steps — NDT's basin is the Gaussian support, so the 20-deg/step
    rotation that NN correspondence absorbs throws distant points off the
    map's cells entirely (25 m x 0.35 rad ~ 9 m)."""
    scans = _half_loop_scans(rng, t_steps=40, n_world=1200)
    method = icp.from_method("ndt", 2, icp.Config(dim=2, cell_size=4.0, cells=2048))
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5
    )
    out = list(
        mapping.scan_to_map_odometry(
            scans, method, cfg, voxel_size=0.05, map_capacity=4096,
            keyframe_translation=0.5, keyframe_angle=0.2,
        )
    )
    assert len(out) == len(scans)
    # Poses live in scan 0's frame.  From the generation math
    # (pts = (world - p) @ Rm with Rm = [[c,-s],[s,c]]): the scan-k ->
    # scan-0 translation is Rm0^T (p_k - p_0).  Here th0 = pi/2 and
    # p_end - p_0 = (-8, 0), so the true end translation is (0, 8).
    true_end = np.array([0.0, 8.0])
    got = np.asarray(out[-1][0].translation)
    assert np.linalg.norm(got - true_end) < 0.1, (got, true_end)
