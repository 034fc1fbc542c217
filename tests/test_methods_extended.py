"""Net-new method families: point_to_plane and robust (Welsch IRLS).

These go beyond the reference's registry; tests cover transform recovery,
robustness to outliers (where the classic methods are expected to degrade),
normal estimation, and batched equivalence.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy_free_rotations import rot_zyx

import icp_tpu as icp
from icp_tpu import geometry
from icp_tpu.methods.point_to_plane import estimate_normals
from icp_tpu.methods.robust import masked_median

DRIVER = icp.DriverConfig(
    max_iterations=60,
    angle_tolerance=1e-4,
    translation_tolerance=1e-4,
)


def surface_cloud_3d(rng, n=400):
    """Points on a smooth height-field surface (normals well-defined)."""
    xy = rng.uniform(-5, 5, (n, 2))
    z = 0.4 * np.sin(xy[:, 0]) + 0.3 * np.cos(1.3 * xy[:, 1])
    return np.column_stack([xy, z])


def test_estimate_normals_on_plane(rng):
    pts = np.column_stack([rng.uniform(-5, 5, (200, 2)), np.zeros(200)])
    normals = estimate_normals(
        jnp.asarray(pts), jnp.ones(200, dtype=bool), k=8
    )
    nz = np.abs(np.asarray(normals)[:, 2])
    np.testing.assert_allclose(nz, 1.0, atol=1e-5)


def test_masked_median():
    v = jnp.asarray([5.0, 1.0, 9.0, 3.0, 100.0, 200.0])
    mask = jnp.asarray([True, True, True, True, False, False])
    assert float(masked_median(v, mask)) == 5.0  # sorted [1,3,5,9], idx 4//2=2


@pytest.mark.parametrize("dim", [2, 3])
def test_point_to_plane_recovers_transform(rng, dim):
    if dim == 2:
        a_pts = np.column_stack(
            [np.linspace(-5, 5, 300), np.sin(np.linspace(-5, 5, 300))]
        )
        rot = geometry.from_angle_2d(np.float64(0.1), np.array([0.5, -0.3]))
    else:
        a_pts = surface_cloud_3d(rng)
        r = rot_zyx(0.05, 0.08, 0.1)
        rot = geometry.RigidTransform(jnp.asarray(r), jnp.asarray([0.5, -0.3, 0.2]))
    b_pts = np.asarray(geometry.apply(rot, jnp.asarray(a_pts)))

    method = icp.from_method("point_to_plane", dim, icp.Config(normal_neighbors=8))
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    result, _ = icp.converge(method, a, b, icp.identity(dim, dtype=np.float64), DRIVER)

    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), np.asarray(rot.rotation), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(rot.translation), atol=2e-2
    )


def test_point_to_plane_converges_faster_than_vanilla_on_surface(rng):
    """The classic point-to-plane advantage: fewer iterations on smooth
    surface data under a pure translation along the surface normal-free
    directions."""
    a_pts = surface_cloud_3d(rng)
    shift = np.array([0.8, -0.5, 0.1])
    b_pts = a_pts + shift

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    cfg = icp.DriverConfig(max_iterations=80, angle_tolerance=1e-5, translation_tolerance=1e-5)

    p2l = icp.from_method("point_to_plane", 3, icp.Config(normal_neighbors=8))
    r_p2l, _ = icp.converge(p2l, a, b, icp.identity(3, dtype=np.float64), cfg)
    np.testing.assert_allclose(
        np.asarray(r_p2l.transform.translation), shift, atol=5e-2
    )

    p2p = icp.from_method("trimmed", 3, icp.Config(max_distance=1e9))
    r_p2p, _ = icp.converge(p2p, a, b, icp.identity(3, dtype=np.float64), cfg)
    assert int(r_p2l.iteration_count) <= int(r_p2p.iteration_count)


@pytest.mark.parametrize("dim", [2, 3])
def test_robust_ignores_outliers(rng, dim):
    """30% gross outliers: robust recovers the pose; vanilla does not."""
    n = 200
    a_pts = rng.uniform(-10, 10, (n, dim))
    if dim == 2:
        tf = geometry.from_angle_2d(np.float64(0.15), np.array([1.0, -0.5]))
    else:
        tf = geometry.RigidTransform(
            jnp.asarray(rot_zyx(0.0, 0.0, 0.15)), jnp.asarray([1.0, -0.5, 0.3])
        )
    b_clean = np.asarray(geometry.apply(tf, jnp.asarray(a_pts)))
    n_out = n * 3 // 10
    b_pts = np.concatenate([b_clean, rng.uniform(40, 80, (n_out, dim))])

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    method = icp.from_method("robust", dim)
    result, _ = icp.converge(method, a, b, icp.identity(dim, dtype=np.float64), DRIVER)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(tf.translation), atol=0.05
    )
    err = float(
        geometry.rotation_angle(
            jnp.swapaxes(tf.rotation, -1, -2) @ result.transform.rotation
        )
    )
    assert abs(err) < 5e-3


def test_robust_batched_matches_single(rng):
    batch = 3
    a_pts = rng.uniform(-10, 10, (batch, 50, 2))
    b_pts = a_pts + rng.uniform(-1, 1, (batch, 1, 2))
    method = icp.from_method("robust", 2)
    a_clouds = [icp.from_points(a_pts[k], capacity=56, dtype=np.float64) for k in range(batch)]
    b_clouds = [icp.from_points(b_pts[k], capacity=56, dtype=np.float64) for k in range(batch)]
    state = method.init(
        icp.stack(a_clouds), icp.stack(b_clouds), icp.identity(2, (batch,), dtype=np.float64)
    )
    for _ in range(4):
        state = method.iterate(state)
    for k in range(batch):
        s = method.init(a_clouds[k], b_clouds[k], icp.identity(2, dtype=np.float64))
        for _ in range(4):
            s = method.iterate(s)
        np.testing.assert_allclose(
            np.asarray(state.transform.translation[k]),
            np.asarray(s.transform.translation),
            atol=1e-10,
        )


@pytest.mark.parametrize("dim", [2, 3])
def test_gicp_recovers_transform(rng, dim):
    from icp_tpu.methods.gicp import surfel_covariances, _inv_spd
    import jax.numpy as jnp

    if dim == 2:
        t_lin = np.linspace(-5, 5, 300)
        a_pts = np.column_stack([t_lin, np.sin(t_lin) + 0.1 * t_lin**2 * 0.1])
        tf = geometry.from_angle_2d(np.float64(0.08), np.array([0.4, -0.2]))
    else:
        a_pts = surface_cloud_3d(rng)
        r = rot_zyx(0.04, 0.06, 0.08)
        tf = geometry.RigidTransform(jnp.asarray(r), jnp.asarray([0.4, -0.2, 0.15]))
    b_pts = np.asarray(geometry.apply(tf, jnp.asarray(a_pts)))

    method = icp.from_method("gicp", dim, icp.Config(neighbors=10))
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    result, _ = icp.converge(method, a, b, icp.identity(dim, dtype=np.float64), DRIVER)
    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), np.asarray(tf.rotation), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(tf.translation), atol=3e-2
    )


def test_gicp_surfel_covariances_flatten_planes(rng):
    from icp_tpu.methods.gicp import surfel_covariances
    import jax.numpy as jnp

    pts = np.column_stack([rng.uniform(-5, 5, (200, 2)), np.zeros(200)])
    cov = surfel_covariances(jnp.asarray(pts), jnp.ones(200, dtype=bool), k=10, eps=1e-3)
    cov = np.asarray(cov)
    # Planar neighborhoods: z-direction eigenvalue ~ eps, in-plane ~ 1.
    np.testing.assert_allclose(cov[:, 2, 2], 1e-3, atol=1e-6)
    np.testing.assert_allclose(cov[:, 0, 0], 1.0, atol=1e-6)


def test_gicp_inv_spd(rng):
    from icp_tpu.methods.gicp import _inv_spd
    import jax.numpy as jnp

    for d in (2, 3):
        a = rng.normal(size=(32, d, d))
        spd = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(d)
        inv = np.asarray(_inv_spd(jnp.asarray(spd)))
        np.testing.assert_allclose(inv, np.linalg.inv(spd), rtol=1e-9)


@pytest.mark.parametrize("name", ["gicp", "point_to_plane"])
def test_gn_methods_progress_under_cost_tolerance(rng, name):
    """Regression: delta-cost termination must not fire after one GN step
    (the stored cost previously lagged the transform by one iteration, so
    iteration 1's cost was bit-identical to init's)."""
    a_pts = surface_cloud_3d(rng, n=150)
    rot = rot_zyx(0.0, 0.0, 0.3)
    b_pts = a_pts @ rot.T + [0.4, -0.2, 0.1]
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    method = icp.from_method(name, 3, icp.Config(neighbors=10, normal_neighbors=10))
    cfg = icp.DriverConfig(max_iterations=50, absolute_cost_tolerance=1e-10)
    result, _ = icp.converge(method, a, b, icp.identity(3, dtype=np.float64), cfg)
    assert int(result.iteration_count) > 1
    err = float(
        geometry.rotation_angle_3d(jnp.asarray(rot.T) @ result.transform.rotation)
    )
    assert err < 0.02, err


def test_gicp_line_search_never_worse(rng):
    """The step-halving safeguard must not degrade a well-conditioned solve,
    and with line_search=0 the plain GN path still works."""
    a_pts = surface_cloud_3d(rng, n=200)
    rot = rot_zyx(0.05, 0.03, 0.08)
    b_pts = a_pts @ rot.T + [0.3, -0.1, 0.2]
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    cfg = icp.DriverConfig(max_iterations=40, angle_tolerance=1e-5, translation_tolerance=1e-5)

    for ls in (1, 0):
        method = icp.from_method("gicp", 3, icp.Config(neighbors=10, line_search=ls))
        result, _ = icp.converge(method, a, b, icp.identity(3, dtype=np.float64), cfg)
        err = float(
            geometry.rotation_angle_3d(jnp.asarray(rot.T) @ result.transform.rotation)
        )
        assert err < 5e-3, (ls, err)


def test_gicp_gated_cost_ignores_outliers(rng):
    """With max_distance set, far outliers must not dominate the driver
    cost or step selection (the gated objective is the scored one)."""
    a_pts = surface_cloud_3d(rng, n=150)
    rot = rot_zyx(0.0, 0.0, 0.1)
    b_clean = a_pts @ rot.T + [0.2, -0.1, 0.05]
    b_pts = np.concatenate([b_clean, rng.uniform(200, 300, (30, 3))])
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    method = icp.from_method("gicp", 3, icp.Config(neighbors=10, max_distance=2.0))
    cfg = icp.DriverConfig(max_iterations=40, absolute_cost_tolerance=1e-8)
    result, _ = icp.converge(method, a, b, icp.identity(3, dtype=np.float64), cfg)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), [0.2, -0.1, 0.05], atol=0.03
    )
    # Gated driver cost reflects the converged inliers, not outlier noise.
    assert float(result.cost) < 1.0


@pytest.mark.parametrize("dim", [2, 3])
def test_symmetric_recovers_transform(rng, dim):
    if dim == 2:
        t_lin = np.linspace(-5, 5, 300)
        a_pts = np.column_stack([t_lin, np.sin(t_lin)])
        tf = geometry.from_angle_2d(np.float64(0.1), np.array([0.4, -0.2]))
    else:
        a_pts = surface_cloud_3d(rng)
        r = rot_zyx(0.05, 0.07, 0.09)
        tf = geometry.RigidTransform(jnp.asarray(r), jnp.asarray([0.4, -0.2, 0.15]))
    b_pts = np.asarray(geometry.apply(tf, jnp.asarray(a_pts)))
    method = icp.from_method("symmetric", dim, icp.Config(normal_neighbors=8))
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    result, _ = icp.converge(method, a, b, icp.identity(dim, dtype=np.float64), DRIVER)
    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), np.asarray(tf.rotation), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(tf.translation), atol=2e-2
    )


def test_symmetric_converges_at_least_as_fast_as_p2l(rng):
    """The symmetric objective's wider funnel: iterations <= point_to_plane
    on the same surface problem."""
    a_pts = surface_cloud_3d(rng)
    r = rot_zyx(0.04, 0.05, 0.06)
    b_pts = a_pts @ r.T + [0.4, -0.3, 0.1]
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    cfg = icp.DriverConfig(max_iterations=80, angle_tolerance=1e-5, translation_tolerance=1e-5)

    r_sym, _ = icp.converge(
        icp.from_method("symmetric", 3, icp.Config(normal_neighbors=8)),
        a, b, icp.identity(3, dtype=np.float64), cfg,
    )
    r_p2l, _ = icp.converge(
        icp.from_method("point_to_plane", 3, icp.Config(normal_neighbors=8)),
        a, b, icp.identity(3, dtype=np.float64), cfg,
    )
    err = float(geometry.rotation_angle_3d(jnp.asarray(r.T) @ r_sym.transform.rotation))
    assert err < 5e-3
    assert int(r_sym.iteration_count) <= int(r_p2l.iteration_count) + 2


def test_neighborhood_moments_select_equals_topk(rng):
    """Radix-select moments must match the top_k+gather oracle path.

    Same neighbor sets (both tie toward the lower index), so cov/sw agree up
    to fp reassociation of the weighted sums.
    """
    from icp_tpu.methods.point_to_plane import neighborhood_moments

    pts = np.asarray(surface_cloud_3d(rng, n=150))
    mask = np.ones(150, dtype=bool)
    mask[140:] = False  # padded tail
    for k in (1, 5, 10, 149, 200):
        cov_s, sw_s = neighborhood_moments(
            jnp.asarray(pts), jnp.asarray(mask), k, selector="select"
        )
        cov_t, sw_t = neighborhood_moments(
            jnp.asarray(pts), jnp.asarray(mask), k, selector="topk"
        )
        np.testing.assert_array_equal(np.asarray(sw_s), np.asarray(sw_t))
        np.testing.assert_allclose(
            np.asarray(cov_s), np.asarray(cov_t), rtol=1e-5, atol=1e-7
        )


def test_neighborhood_moments_select_equals_topk_ties(rng):
    """Grid cloud with exactly duplicated distances: tie sets must agree."""
    from icp_tpu.methods.point_to_plane import neighborhood_moments

    g = np.arange(6, dtype=np.float64)
    pts = np.stack(np.meshgrid(g, g), axis=-1).reshape(-1, 2)  # 36 pts, many ties
    mask = np.ones(len(pts), dtype=bool)
    for k in (2, 4, 5, 9):
        cov_s, sw_s = neighborhood_moments(
            jnp.asarray(pts), jnp.asarray(mask), k, selector="select"
        )
        cov_t, sw_t = neighborhood_moments(
            jnp.asarray(pts), jnp.asarray(mask), k, selector="topk"
        )
        np.testing.assert_array_equal(np.asarray(sw_s), np.asarray(sw_t))
        np.testing.assert_allclose(
            np.asarray(cov_s), np.asarray(cov_t), rtol=1e-9, atol=1e-12
        )


def test_neighborhood_moments_all_masked():
    from icp_tpu.methods.point_to_plane import neighborhood_moments

    pts = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)))
    mask = jnp.zeros(8, dtype=bool)
    for sel in ("select", "topk"):
        cov, sw = neighborhood_moments(pts, mask, 4, selector=sel)
        np.testing.assert_array_equal(np.asarray(sw), np.ones(8))
        np.testing.assert_array_equal(np.asarray(cov), np.zeros((8, 3, 3)))
