"""Driver termination semantics and batched-lane freezing.

Covers the tolerance cascade of ``ICPDriver::should_terminate``
(``/root/reference/include/icp/driver.h:154-222``) including its
pre-first-iteration evaluation (``driver.h:55-63``), plus the net-new
batched behavior: every lane terminates independently and frozen lanes
report the same (cost, iterations, transform) a sequential run would.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp


def simple_pair(dtype=np.float64):
    a = icp.from_points(np.array([[0, 0], [100, 0], [50, 50]]), dtype=dtype)
    b_pts = np.array([[0, 0], [100, 0], [50, 50]]) + np.array([3.0, -2.0])
    b = icp.from_points(b_pts, dtype=dtype)
    return a, b


def test_max_iterations_zero_runs_no_iterations():
    # The check runs before the first iterate (``driver.h:55-63``).
    a, b = simple_pair()
    method = icp.from_method("vanilla", 2)
    result, _ = icp.converge(
        method, a, b, icp.identity(2, dtype=np.float64), icp.DriverConfig(max_iterations=0)
    )
    assert int(result.iteration_count) == 0
    np.testing.assert_allclose(np.asarray(result.transform.rotation), np.eye(2))


def test_max_iterations_caps_count():
    a, b = simple_pair()
    method = icp.from_method("vanilla", 2)
    result, _ = icp.converge(
        method, a, b, icp.identity(2, dtype=np.float64), icp.DriverConfig(max_iterations=3)
    )
    assert int(result.iteration_count) <= 3


def test_min_iterations_overrides_stop_cost():
    # min_iterations not yet reached -> keep going even below stop_cost.
    a, b = simple_pair()
    method = icp.from_method("vanilla", 2)
    result, _ = icp.converge(
        method,
        a,
        b,
        icp.identity(2, dtype=np.float64),
        icp.DriverConfig(min_iterations=5, max_iterations=50, stop_cost=1e30),
    )
    assert int(result.iteration_count) >= 5


def test_stop_cost_terminates_immediately_for_3d_zero_cost_quirk():
    # 3D methods report driver-visible cost exactly 0.0 (``vanilla_3d.cpp``
    # shadowed-cost quirk), so any positive stop_cost terminates at iter 0.
    a = icp.from_points(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]]), dtype=np.float64)
    b = icp.from_points(np.array([[5, 0, 0], [6, 0, 0], [5, 1, 0]]), dtype=np.float64)
    method = icp.from_method("vanilla", 3)
    result, _ = icp.converge(
        method, a, b, icp.identity(3, dtype=np.float64),
        icp.DriverConfig(max_iterations=50, stop_cost=1e-3),
    )
    assert int(result.iteration_count) == 0


def test_relative_tolerance_nan_safe_on_zero_cost():
    # 0/0 -> NaN -> comparison false: a zero-cost method must NOT terminate
    # via relative tolerance (IEEE semantics shared with the C++).
    a = icp.from_points(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]]), dtype=np.float64)
    b = icp.from_points(np.array([[5, 0, 0], [6, 0, 0], [5, 1, 0]]), dtype=np.float64)
    method = icp.from_method("vanilla", 3)
    result, _ = icp.converge(
        method, a, b, icp.identity(3, dtype=np.float64),
        icp.DriverConfig(max_iterations=7, relative_cost_tolerance=1e-6),
    )
    # |delta| = 0 < abs tol would fire, but relative is NaN; only
    # max_iterations stops it.
    assert int(result.iteration_count) == 7


def test_transform_tolerance_requires_both():
    with pytest.raises(ValueError):
        icp.DriverConfig(angle_tolerance=0.1)


def test_no_criterion_raises():
    a, b = simple_pair()
    method = icp.from_method("vanilla", 2)
    with pytest.raises(ValueError):
        icp.converge(method, a, b, icp.identity(2, dtype=np.float64), icp.DriverConfig())


def test_stepped_matches_compiled():
    a, b = simple_pair()
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(
        max_iterations=25, angle_tolerance=1e-3, translation_tolerance=1e-2
    )
    guess = icp.identity(2, dtype=np.float64)
    r1, _ = icp.converge(method, a, b, guess, cfg)
    r2, _ = icp.converge_stepped(method, a, b, guess, cfg)
    assert int(r1.iteration_count) == int(r2.iteration_count)
    np.testing.assert_allclose(
        np.asarray(r1.transform.rotation), np.asarray(r2.transform.rotation), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r1.transform.translation), np.asarray(r2.transform.translation), atol=1e-12
    )


def test_batched_lanes_match_sequential_runs(rng):
    """Registering a batch of pairs must reproduce per-pair sequential runs
    exactly: per-lane iteration counts, costs and transforms."""
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    cfg = icp.DriverConfig(
        max_iterations=30, angle_tolerance=1e-3, translation_tolerance=1e-2
    )

    pairs = []
    for k in range(4):
        n = 30 + 5 * k
        a_pts = rng.uniform(-50, 50, (n, 2))
        angle = rng.uniform(-0.3, 0.3)
        c, s = np.cos(angle), np.sin(angle)
        b_pts = a_pts @ np.array([[c, s], [-s, c]]) + rng.uniform(-5, 5, 2)
        pairs.append((a_pts, b_pts))

    cap = 48
    a_batch = icp.stack([icp.from_points(p[0], capacity=cap, dtype=np.float64) for p in pairs])
    b_batch = icp.stack([icp.from_points(p[1], capacity=cap, dtype=np.float64) for p in pairs])
    guess_b = icp.identity(2, batch_shape=(4,), dtype=np.float64)

    batched, _ = icp.converge(method, a_batch, b_batch, guess_b, cfg)

    for k, (a_pts, b_pts) in enumerate(pairs):
        a = icp.from_points(a_pts, capacity=cap, dtype=np.float64)
        b = icp.from_points(b_pts, capacity=cap, dtype=np.float64)
        single, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)
        assert int(batched.iteration_count[k]) == int(single.iteration_count)
        np.testing.assert_allclose(
            np.asarray(batched.transform.translation[k]),
            np.asarray(single.transform.translation),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            float(batched.cost[k]), float(single.cost), atol=1e-9
        )


def test_time_limit_stepped_only():
    a, b = simple_pair()
    method = icp.from_method("vanilla", 2)
    cfg = icp.DriverConfig(max_iterations=10_000, time_limit=0.0)
    with pytest.raises(ValueError):
        icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)
    result, _ = icp.converge_stepped(method, a, b, icp.identity(2, dtype=np.float64), cfg)
    # zero budget -> stops at the first host check
    assert int(result.iteration_count) == 0


def test_converge_is_jittable():
    a, b = simple_pair()
    method = icp.from_method("vanilla", 2)
    cfg = icp.DriverConfig(max_iterations=5)
    fn = icp.make_converge_fn(method, cfg)
    result, _ = fn(a, b, icp.identity(2, dtype=np.float64))
    assert jnp.isfinite(result.cost)


def test_dimension_mismatch_raises():
    a2 = icp.from_points(np.zeros((4, 2)), dtype=np.float64)
    b3 = icp.from_points(np.zeros((4, 3)), dtype=np.float64)
    method = icp.from_method("vanilla", 2)
    with pytest.raises(ValueError, match="dimension mismatch"):
        icp.converge(method, a2, b3, icp.identity(2, dtype=np.float64),
                     icp.DriverConfig(max_iterations=1))
    with pytest.raises(ValueError, match="dimension mismatch"):
        icp.converge(
            icp.from_method("vanilla", 3), a2,
            icp.from_points(np.zeros((4, 2)), dtype=np.float64),
            icp.identity(2, dtype=np.float64), icp.DriverConfig(max_iterations=1),
        )


def test_converge_stepped_batched_matches_compiled(rng):
    """Host-stepped driver with a batch: per-lane freezing must equal the
    compiled while_loop exactly."""
    batch, cap = 3, 40
    a_clouds, b_clouds = [], []
    for k in range(batch):
        a_pts = rng.uniform(-30, 30, (30 + k, 2))
        b_pts = a_pts + rng.uniform(-2, 2, 2)
        a_clouds.append(icp.from_points(a_pts, capacity=cap, dtype=np.float64))
        b_clouds.append(icp.from_points(b_pts, capacity=cap, dtype=np.float64))
    a, b = icp.stack(a_clouds), icp.stack(b_clouds)
    guess = icp.identity(2, (batch,), dtype=np.float64)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=20, angle_tolerance=1e-4, translation_tolerance=1e-4)

    r1, _ = icp.converge(method, a, b, guess, cfg)
    r2, _ = icp.converge_stepped(method, a, b, guess, cfg)
    np.testing.assert_array_equal(
        np.asarray(r1.iteration_count), np.asarray(r2.iteration_count)
    )
    np.testing.assert_allclose(
        np.asarray(r1.transform.translation), np.asarray(r2.transform.translation), atol=1e-12
    )
