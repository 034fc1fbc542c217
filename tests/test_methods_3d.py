"""3D ICP integration tests.

Ports the reference's 3D suite (``/root/reference/tests/test3d.cpp:36-206``)
for ``vanilla`` 3D, and additionally runs ``trimmed`` 3D (which the
reference registers but never unit-tests) with a gate wide enough to keep
all pairs.  Driver config and tolerances match the reference
(``test3d.cpp:17-18,39-40``): 100 iterations, 0.1 deg / 0.1 tolerance,
``TRANS_EPS=0.5``, ``RAD_EPS=0.01``.

Note the reference's 3D methods report driver cost 0.0 (the shadowed-cost
quirk, ``vanilla_3d.cpp:98-106``), so only transform-tolerance /
max-iteration termination drives these runs — reproduced here.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy_free_rotations import rot_axis, rot_zyx  # local helper below

import icp_tpu as icp
from icp_tpu import geometry

TRANS_EPS = 0.5
RAD_EPS = 0.01

DRIVER = icp.DriverConfig(
    max_iterations=100,
    angle_tolerance=0.1 * np.pi / 180,
    translation_tolerance=0.1,
)


def cloud3(points):
    return icp.from_points(np.asarray(points, dtype=np.float64), dtype=np.float64)


def methods():
    return [
        icp.from_method("vanilla", 3),
        icp.from_method("trimmed", 3, icp.Config(max_distance=1e9)),
    ]


def converge(method, a, b):
    result, _ = icp.converge(method, a, b, icp.identity(3, dtype=np.float64), DRIVER)
    return result


def assert_pose(result, expected_rot, expected_t, trans_eps=TRANS_EPS, rad_eps=RAD_EPS):
    r = np.asarray(result.transform.rotation)
    t = np.asarray(result.transform.translation)
    # Rotation error as the axis-angle magnitude of R_exp^T R — the 3D
    # analogue of the reference's smallestAngle comparison.
    err = float(geometry.rotation_angle_3d(expected_rot.T @ r))
    assert err < rad_eps, err
    np.testing.assert_allclose(t, expected_t, atol=trans_eps)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_single_point_translation(method):
    # ``test3d.cpp:43-53``
    a = cloud3([[0, 0, 0]])
    b = cloud3([[100, 0, 0]])
    result = converge(method, a, b)
    assert int(result.iteration_count) <= 10
    assert_pose(result, np.eye(3), [100, 0, 0])


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
@pytest.mark.parametrize("deg", range(10))
def test_rotation_about_x_around_centroid(method, deg):
    # ``test3d.cpp:60-87`` — unit basis points rotated about their centroid
    a_pts = np.eye(3, dtype=np.float64)
    angle = deg * np.pi / 180.0
    rot = rot_axis(angle, 0)
    center = a_pts.mean(axis=0)
    t = center - rot @ center
    b_pts = a_pts @ rot.T + t
    result = converge(method, cloud3(a_pts), cloud3(b_pts))
    assert_pose(result, rot, (np.eye(3) - rot) @ center)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_composite_zyx_rotation(method):
    # ``test3d.cpp:89-125`` — 30/30/30 ZYX about the centroid
    a_pts = np.eye(3, dtype=np.float64)
    rot = rot_zyx(np.deg2rad(30), np.deg2rad(30), np.deg2rad(30))
    center = a_pts.mean(axis=0)
    b_pts = a_pts @ rot.T + (center - rot @ center)
    result = converge(method, cloud3(a_pts), cloud3(b_pts))
    assert_pose(result, rot, (np.eye(3) - rot) @ center)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_rotation_plus_translation(method):
    # ``test3d.cpp:127-157`` — 10/10/10 ZYX + (50, 50, 50), scale-100 basis
    a_pts = 100.0 * np.eye(3, dtype=np.float64)
    rot = rot_zyx(np.deg2rad(10), np.deg2rad(10), np.deg2rad(10))
    t = np.array([50.0, 50.0, 50.0])
    b_pts = a_pts @ rot.T + t
    result = converge(method, cloud3(a_pts), cloud3(b_pts))
    assert_pose(result, rot, t)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_noisy(method):
    # ``test3d.cpp:159-201`` — 10/10/10 ZYX + (20, 10, 30), N(0,1) noise
    rng = np.random.default_rng(0)
    a_pts = 100.0 * np.eye(3, dtype=np.float64)
    rot = rot_zyx(np.deg2rad(10), np.deg2rad(10), np.deg2rad(10))
    t = np.array([20.0, 10.0, 30.0])
    b_pts = a_pts @ rot.T + t + rng.normal(0.0, 1.0, (3, 3))
    result = converge(method, cloud3(a_pts), cloud3(b_pts))
    assert_pose(result, rot, t, trans_eps=TRANS_EPS + 1.0, rad_eps=0.1)


@pytest.mark.parametrize("method", methods(), ids=lambda m: m.name)
def test_3d_guess_seeding_not_double_counted(method):
    """Regression (conscious deviation from vanilla_3d.cpp:71-73): seeding a
    3D method with the EXACT solution must return that solution, not twice
    it (the reference's working copy ignores the guess)."""
    rng = np.random.default_rng(3)
    a_pts = rng.uniform(-10, 10, (60, 3))
    rot = rot_zyx(0.1, 0.05, 0.2)
    t = np.array([1.0, -2.0, 0.5])
    b_pts = a_pts @ rot.T + t
    a = cloud3(a_pts)
    b = cloud3(b_pts)
    exact = icp.RigidTransform(jnp.asarray(rot), jnp.asarray(t))
    result, _ = icp.converge(
        method, a, b, exact,
        icp.DriverConfig(max_iterations=10, angle_tolerance=1e-6, translation_tolerance=1e-6),
    )
    np.testing.assert_allclose(np.asarray(result.transform.translation), t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(result.transform.rotation), rot, atol=1e-8)
