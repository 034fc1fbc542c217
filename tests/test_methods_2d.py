"""2D ICP integration tests.

Ports the reference's 2D suite (``/root/reference/tests/test.cpp:83-233``):
per method — vanilla; trimmed and feature_aware at ``overlap_rate=1.0``
(trimming breaks tiny examples, per the reference's own comment at
``test.cpp:224-225``) — the same seven scenarios with the same driver
configuration (100 iterations, 0.1 deg angle / 0.1 translation tolerance)
and the same tolerances (``TRANS_EPS=0.5`` units, ``RAD_EPS=0.01`` rad,
``test.cpp:21-22``).
"""

import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import geometry

TRANS_EPS = 0.5
RAD_EPS = 0.01

DRIVER = icp.DriverConfig(
    max_iterations=100,
    angle_tolerance=0.1 * np.pi / 180,
    translation_tolerance=0.1,
)


def cloud2(points):
    return icp.from_points(np.asarray(points, dtype=np.float64), dtype=np.float64)


def methods():
    return [
        icp.from_method("vanilla", 2),
        icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0)),
        icp.from_method(
            "feature_aware",
            2,
            icp.Config(overlap_rate=1.0, feature_weight=0.7, symmetric_neighbors=1),
        ),
    ]


def converge(method, a, b):
    result, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), DRIVER)
    return result


def assert_pose(result, expected_angle, expected_t, trans_eps=TRANS_EPS, rad_eps=RAD_EPS):
    angle = float(geometry.rotation_angle_2d(result.transform.rotation))
    t = np.asarray(result.transform.translation)
    assert abs(angle - expected_angle) < rad_eps, (angle, expected_angle)
    np.testing.assert_allclose(t, expected_t, atol=trans_eps)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_single_point_translation(method):
    # ``test.cpp:91-102``
    a = cloud2([[0, 0]])
    b = cloud2([[100, 0]])
    result = converge(method, a, b)
    assert int(result.iteration_count) <= 10
    assert_pose(result, 0.0, [100, 0])


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_identity(method):
    # ``test.cpp:104-115``
    a = cloud2([[0, 0], [100, 100]])
    result = converge(method, a, a)
    assert_pose(result, 0.0, [0, 0])


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
@pytest.mark.parametrize("deg", range(10))
def test_rotation_symmetric_geometry(method, deg):
    # ``test.cpp:117-131`` — points (-100,-100), (100,100)
    angle = deg * np.pi / 180.0
    a_pts = np.array([[-100, -100], [100, 100]], dtype=np.float64)
    rot = geometry.from_angle_2d(np.float64(angle))
    b_pts = np.asarray(geometry.apply(rot, a_pts))
    result = converge(method, cloud2(a_pts), cloud2(b_pts))
    assert_pose(result, angle, [0, 0])


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
@pytest.mark.parametrize("deg", range(10))
def test_rotation_asymmetric_geometry(method, deg):
    # ``test.cpp:133-147`` — points (0,0), (1,0)
    angle = deg * np.pi / 180.0
    a_pts = np.array([[0, 0], [1, 0]], dtype=np.float64)
    rot = geometry.from_angle_2d(np.float64(angle))
    b_pts = np.asarray(geometry.apply(rot, a_pts))
    result = converge(method, cloud2(a_pts), cloud2(b_pts))
    assert_pose(result, angle, [0, 0])


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_pure_translation_x(method):
    # ``test.cpp:149-162``
    a = cloud2([[0, 0], [0, 100]])
    b = cloud2([[100, 0], [100, 100]])
    result = converge(method, a, b)
    assert_pose(result, 0.0, [100, 0])


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_rotation_plus_translation(method):
    # ``test.cpp:164-184`` — 45 deg + (5, 5)
    angle = 45 * np.pi / 180.0
    t = np.array([5.0, 5.0])
    a_pts = np.array([[0, 0], [100, 0]], dtype=np.float64)
    tf = geometry.from_angle_2d(np.float64(angle), t)
    b_pts = np.asarray(geometry.apply(tf, a_pts))
    result = converge(method, cloud2(a_pts), cloud2(b_pts))
    assert_pose(result, angle, t)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_noisy_four_point_cloud(method):
    # ``test.cpp:186-215`` — 30 deg + (20, 10), N(0,1) noise, relaxed eps
    rng = np.random.default_rng(0)
    angle = 30 * np.pi / 180.0
    t = np.array([20.0, 10.0])
    a_pts = np.array([[0, 0], [100, 0], [50, 50], [0, 50]], dtype=np.float64)
    tf = geometry.from_angle_2d(np.float64(angle), t)
    b_pts = np.asarray(geometry.apply(tf, a_pts)) + rng.normal(0.0, 1.0, (4, 2))
    result = converge(method, cloud2(a_pts), cloud2(b_pts))
    assert_pose(result, angle, t, trans_eps=TRANS_EPS * 3, rad_eps=RAD_EPS * 5)
