"""Coarse global 2D alignment tests — the large-rotation initializer."""

import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import geometry
from icp_tpu.ops.coarse import bearing_histogram, coarse_align_2d


def room_points(rng, n=400):
    """Asymmetric structured scene (histogram needs angular structure)."""
    walls = []
    walls.append(np.column_stack([np.linspace(-8, 8, n // 3), np.full(n // 3, -5.0)]))
    walls.append(np.column_stack([np.full(n // 3, 8.0), np.linspace(-5, 2, n // 3)]))
    walls.append(
        np.column_stack([np.linspace(-8, 2, n - 2 * (n // 3)), np.full(n - 2 * (n // 3), 6.0)])
    )
    pts = np.concatenate(walls)
    return pts + rng.normal(0, 0.02, pts.shape)


@pytest.mark.parametrize("deg", [30, 90, 150, -120])
def test_coarse_recovers_large_rotation(rng, deg):
    a_pts = room_points(rng)
    angle = np.deg2rad(deg)
    tf = geometry.from_angle_2d(np.float64(angle), np.array([2.0, -1.0]))
    b_pts = np.asarray(geometry.apply(tf, jnp.asarray(a_pts)))

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    guess = coarse_align_2d(a, b)
    got = float(geometry.rotation_angle_2d(guess.rotation))
    # Coarse estimate within a few degrees — inside ICP's basin.
    err = np.arctan2(np.sin(got - angle), np.cos(got - angle))
    assert abs(err) < np.deg2rad(6), (np.rad2deg(got), deg)


@pytest.mark.parametrize("deg", [45, 120])
def test_coarse_plus_icp_recovers_what_icp_alone_cannot(rng, deg):
    a_pts = room_points(rng)
    angle = np.deg2rad(deg)
    tf = geometry.from_angle_2d(np.float64(angle), np.array([1.0, 2.0]))
    b_pts = np.asarray(geometry.apply(tf, jnp.asarray(a_pts)))

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5)

    # Identity guess: fails (stuck in a wrong basin).
    r_id, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)
    err_id = abs(float(geometry.rotation_angle_2d(r_id.transform.rotation)) - angle)

    # Coarse guess: succeeds.
    guess = coarse_align_2d(a, b)
    r_c, _ = icp.converge(method, a, b, guess, cfg)
    got = float(geometry.rotation_angle_2d(r_c.transform.rotation))
    err_c = abs(np.arctan2(np.sin(got - angle), np.cos(got - angle)))
    assert err_c < 1e-3, np.rad2deg(err_c)
    np.testing.assert_allclose(
        np.asarray(r_c.transform.translation), [1.0, 2.0], atol=0.05
    )
    # Never worse than the identity-guess run; at large angles (120 deg) the
    # identity run lands in a wrong basin and coarse is strictly better.
    assert err_c <= err_id + 1e-12
    if deg >= 90:
        assert err_id > np.deg2rad(5)  # identity guess demonstrably fails here


def test_bearing_histogram_normalized(rng):
    pts = jnp.asarray(rng.uniform(-5, 5, (3, 64, 2)))
    mask = jnp.ones((3, 64), dtype=bool)
    h = bearing_histogram(pts, mask, 90)
    np.testing.assert_allclose(np.asarray(h.sum(-1)), 1.0, atol=1e-12)
    assert h.shape == (3, 90)


def test_coarse_seeded_chain_survives_sharp_turns(rng):
    """30-degree-per-step loop: identity seeding breaks (documented ICP basin
    limit), coarse seeding closes the loop."""
    import math

    from icp_tpu import odometry

    world = rng.uniform(-30, 30, (150, 2))
    t_steps, radius = 13, 3.0  # 12 steps of 30 degrees
    scans = []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        scans.append(pts + rng.normal(0, 0.02, pts.shape))
    stack = icp.stack([icp.from_points(p, capacity=152, dtype=np.float64) for p in scans])

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5)

    t_id = odometry.chain_scans(stack, method, cfg)
    t_coarse = odometry.chain_scans(stack, method, cfg, coarse=True)

    end_id = float(np.linalg.norm(np.asarray(t_id.poses.translation[-1])))
    end_coarse = float(np.linalg.norm(np.asarray(t_coarse.poses.translation[-1])))
    assert end_coarse < 0.05, end_coarse  # loop closes
    assert end_id > 1.0, end_id  # identity seeding demonstrably fails here


@pytest.mark.parametrize("deg", [60, 140])
def test_coarse_3d_plus_icp_recovers_large_rotation(rng, deg):
    from scipy_free_rotations import rot_zyx

    from icp_tpu.ops.coarse import coarse_align_3d

    # Anisotropic structured cloud (a bent sheet).
    xy = rng.uniform(-6, 6, (400, 2)) * np.array([1.0, 0.5])
    z = 0.3 * np.sin(xy[:, 0])
    a_pts = np.column_stack([xy, z])
    rot = rot_zyx(np.deg2rad(deg), np.deg2rad(15), np.deg2rad(25))
    t_true = np.array([2.0, -1.0, 0.5])
    b_pts = a_pts @ rot.T + t_true

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    guess = coarse_align_3d(a, b)

    method = icp.from_method("gicp", 3, icp.Config(neighbors=10))
    cfg = icp.DriverConfig(max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5)
    result, _ = icp.converge(method, a, b, guess, cfg)
    err = float(
        geometry.rotation_angle_3d(jnp.asarray(rot.T) @ result.transform.rotation)
    )
    assert err < 5e-3, np.rad2deg(err)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), t_true, atol=0.05
    )


def test_remove_statistical_outliers(rng):
    from icp_tpu.ops.filters import remove_statistical_outliers

    dense = rng.uniform(-5, 5, (200, 2))
    outliers = rng.uniform(80, 100, (10, 2))
    cloud = icp.from_points(np.concatenate([dense, outliers]), dtype=np.float64)
    filtered = remove_statistical_outliers(cloud, k=8, std_ratio=2.0)
    n = int(filtered.count)
    assert 185 <= n <= 200, n  # all far outliers dropped, most inliers kept
    pts = np.asarray(filtered.points[:n])
    assert np.abs(pts).max() < 10.0  # no outlier survives
    # Padding beyond count is zeroed; mask reflects the new count.
    assert np.allclose(np.asarray(filtered.points[n:]), 0.0)


def test_sor_small_count_does_not_flatten_stats(rng):
    """Regression: clouds with count <= k must still filter (sentinel
    distances previously flattened the statistics and kept everything)."""
    from icp_tpu.ops.filters import remove_statistical_outliers

    inliers = rng.uniform(-5, 5, (20, 2))
    pts = np.concatenate([inliers, [[90.0, 90.0]]])
    cloud = icp.from_points(pts, capacity=32, dtype=np.float64)
    filtered = remove_statistical_outliers(cloud, k=25, std_ratio=2.0)
    kept = np.asarray(filtered.points[: int(filtered.count)])
    assert np.abs(kept).max() < 10.0  # outlier dropped despite k > count

    # capacity-1 cloud: no neighbors -> unchanged, no crash
    one = icp.from_points(np.zeros((1, 2)), capacity=1, dtype=np.float64)
    out = remove_statistical_outliers(one, k=8)
    assert int(out.count) == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be positive"):
        remove_statistical_outliers(cloud, k=0)
