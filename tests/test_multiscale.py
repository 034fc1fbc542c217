"""Multiscale (coarse-to-fine) registration tests."""

import numpy as np

import icp_tpu as icp
from icp_tpu.multiscale import converge_multiscale, decimate


def test_decimate_counts():
    c = icp.from_points(np.random.default_rng(0).uniform(-5, 5, (100, 2)), capacity=104)
    d = decimate(c, 4)
    assert d.capacity == 26
    assert int(d.count) == 25  # ceil(100/4)
    np.testing.assert_allclose(np.asarray(d.points[0]), np.asarray(c.points[0]))


def test_multiscale_matches_tolerances(rng):
    """Multiscale reaches the same tolerances; final refinement is full-res."""
    a_pts = rng.uniform(-30, 30, (800, 2))
    ang = 0.25
    c, s = np.cos(ang), np.sin(ang)
    b_pts = a_pts @ np.array([[c, s], [-s, c]]) + [2.0, -1.0]
    a = icp.from_points(a_pts, capacity=800, dtype=np.float64)
    b = icp.from_points(b_pts, capacity=800, dtype=np.float64)

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5)

    r_full, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)
    r_ms, _ = converge_multiscale(
        method, a, b, icp.identity(2, dtype=np.float64), cfg, factors=(8, 2)
    )
    # Same pose up to the tolerance scale.
    np.testing.assert_allclose(
        np.asarray(r_ms.transform.translation),
        np.asarray(r_full.transform.translation),
        atol=1e-3,
    )
    # Full-res refinement needs fewer iterations than from-identity.
    assert int(r_ms.iteration_count) <= int(r_full.iteration_count)


def test_multiscale_batched(rng):
    import jax.numpy as jnp

    batch = 3
    a_pts = rng.uniform(-20, 20, (batch, 256, 2)).astype(np.float32)
    shift = rng.uniform(-1, 1, (batch, 1, 2)).astype(np.float32)
    b_pts = a_pts + shift
    a = icp.PointCloud(jnp.asarray(a_pts), jnp.full((batch,), 256, jnp.int32))
    b = icp.PointCloud(jnp.asarray(b_pts), jnp.full((batch,), 256, jnp.int32))
    method = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(max_iterations=40, angle_tolerance=1e-4, translation_tolerance=1e-4)
    r, _ = converge_multiscale(
        method, a, b, icp.identity(2, (batch,), dtype=jnp.float32), cfg, factors=(4,)
    )
    np.testing.assert_allclose(
        np.asarray(r.transform.translation), shift[:, 0], atol=0.05
    )


def test_multiscale_3d_well_conditioned(rng):
    """3D pyramid on dense structured data matches the full run.

    (On sparse or heavily decimated 3D geometry the coarse level can settle
    in a DIFFERENT local basin than the from-identity run — a documented
    caveat in icp_tpu/multiscale.py; multiscale is an accelerator for
    well-conditioned problems, not a robustness feature.)
    """
    # Non-periodic structure (periodic surfaces alias under decimation).
    a_pts = rng.uniform(-6, 6, (1200, 3)) * np.array([1.0, 0.7, 0.4])
    from scipy_free_rotations import rot_zyx

    rot = rot_zyx(0.05, 0.04, 0.08)
    b_pts = a_pts @ rot.T + [0.3, -0.2, 0.1]
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    method = icp.from_method("trimmed", 3, icp.Config(max_distance=5.0))
    cfg = icp.DriverConfig(max_iterations=80, angle_tolerance=1e-5, translation_tolerance=1e-5)

    r_full, _ = icp.converge(method, a, b, icp.identity(3, dtype=np.float64), cfg)
    r_ms, _ = converge_multiscale(
        method, a, b, icp.identity(3, dtype=np.float64), cfg, factors=(4,)
    )
    np.testing.assert_allclose(
        np.asarray(r_ms.transform.translation),
        np.asarray(r_full.transform.translation),
        atol=5e-3,
    )
