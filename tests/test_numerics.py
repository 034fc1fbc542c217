"""Numerics hygiene — the TPU analogue of the reference's sanitizer CI.

The reference compiles with ASan/UBSan in CI (``CMakeLists.txt:14-33``).
The failure modes of a JAX library are different: jit-vs-eager divergence,
precision drift between the fp64 parity path and the fp32 device path, and
NaN leaks through ``where`` branches.  These tests pin all three.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import geometry, lie


def _scan_pair(rng, n=60, m=70, dtype=np.float64):
    a = rng.uniform(-30, 30, (n, 2))
    ang = 0.15
    c, s = np.cos(ang), np.sin(ang)
    b = np.concatenate(
        [a @ np.array([[c, s], [-s, c]]) + [1.0, -2.0], rng.uniform(-30, 30, (m - n, 2))]
    )
    return (
        icp.from_points(a, dtype=dtype),
        icp.from_points(b, dtype=dtype),
    )


@pytest.mark.parametrize("name", ["vanilla", "trimmed", "robust"])
def test_jit_vs_eager_parity(rng, name):
    """The compiled and op-by-op execution paths must agree exactly."""
    a, b = _scan_pair(rng)
    method = icp.from_method(name, 2)
    state = method.init(a, b, icp.identity(2, dtype=np.float64))
    jit_it = jax.jit(method.iterate)
    s_eager, s_jit = state, state
    for _ in range(3):
        s_eager = method.iterate(s_eager)
        s_jit = jit_it(s_jit)
    np.testing.assert_allclose(
        np.asarray(s_eager.transform.translation),
        np.asarray(s_jit.transform.translation),
        atol=1e-12,
    )


def test_x32_vs_x64_drift_bounded(rng):
    """The fp32 fast path must land within loose tolerance of fp64 on a
    well-conditioned problem (drift here would flag kernel bugs, not fp)."""
    a64, b64 = _scan_pair(rng)
    a32 = icp.PointCloud(a64.points.astype(jnp.float32), a64.count)
    b32 = icp.PointCloud(b64.points.astype(jnp.float32), b64.count)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=30, angle_tolerance=1e-4, translation_tolerance=1e-4)
    r64, _ = icp.converge(method, a64, b64, icp.identity(2, dtype=np.float64), cfg)
    r32, _ = icp.converge(method, a32, b32, icp.identity(2, dtype=np.float32), cfg)
    np.testing.assert_allclose(
        np.asarray(r32.transform.translation),
        np.asarray(r64.transform.translation),
        atol=1e-3,
    )


def test_no_nan_through_degenerate_paths(rng):
    """Degenerate inputs must produce finite outputs, also under jit."""
    checks = []
    # Single-point clouds, coincident points, zero-size valid sets.
    a = icp.from_points(np.zeros((1, 2)), dtype=np.float64)
    b = icp.from_points(np.zeros((1, 2)), dtype=np.float64)
    for name in ["vanilla", "trimmed", "robust"]:
        method = icp.from_method(name, 2)
        state = jax.jit(method.iterate)(method.init(a, b, icp.identity(2, dtype=np.float64)))
        checks.append(np.isfinite(np.asarray(state.transform.rotation)).all())
        checks.append(np.isfinite(np.asarray(state.transform.translation)).all())
    # Lie maps at identity / zero twist.
    checks.append(np.isfinite(np.asarray(lie.se3_log(icp.identity(3, dtype=np.float64)))).all())
    checks.append(
        np.isfinite(np.asarray(lie.se3_exp(jnp.zeros(6, dtype=jnp.float64)).rotation)).all()
    )
    assert all(bool(c) for c in checks)


def test_gradients_finite_through_registration_step(rng):
    """Autodiff through one ICP step stays finite (enables learned
    front-ends / calibration on top of the engine)."""
    a, b = _scan_pair(rng, n=24, m=24)
    method = icp.from_method("robust", 2)

    def loss(translation_guess):
        guess = geometry.RigidTransform(jnp.eye(2, dtype=jnp.float64), translation_guess)
        state = method.init(a, b, guess)
        state = method.iterate(state)
        return jnp.sum(state.transform.translation ** 2)

    g = jax.grad(loss)(jnp.zeros(2, dtype=jnp.float64))
    assert bool(jnp.isfinite(g).all())


def test_voxel_device_jit_vs_eager(rng):
    """Device voxel filter: jit == eager bitwise (sanitizer analogue for
    the round-3 map-maintenance op)."""
    from icp_tpu import mapping

    pts = jnp.asarray(rng.uniform(-8, 8, (256, 3)))
    mask = jnp.asarray(rng.random(256) > 0.2)
    eager_pts, eager_k = mapping.voxel_downsample_device(pts, mask, 0.5, 256)
    jit_pts, jit_k = jax.jit(
        lambda p, m: mapping.voxel_downsample_device(p, m, 0.5, 256)
    )(pts, mask)
    assert int(eager_k) == int(jit_k)
    np.testing.assert_array_equal(np.asarray(eager_pts), np.asarray(jit_pts))


def test_robust_optimize_finite_at_extreme_scales(rng):
    """The robust solve must stay finite at pathological scales (tiny c ->
    every robust edge rejected; huge c -> quadratic) and with zero-weight
    padded edges in the graph."""
    from icp_tpu import geometry, lie, pose_graph

    twists = rng.uniform(-0.2, 0.2, (6, 3))
    gt = [geometry.RigidTransform(jnp.eye(2), jnp.zeros(2))]
    for k in range(6):
        gt.append(geometry.compose(gt[-1], lie.se2_exp(jnp.asarray(twists[k]))))
    poses0 = geometry.RigidTransform(
        jnp.stack([p.rotation for p in gt]), jnp.stack([p.translation for p in gt])
    )
    meas = lie.se2_exp(jnp.asarray(twists + rng.normal(0, 0.02, twists.shape)))
    rel = geometry.compose(geometry.inverse(gt[0]), gt[6])
    graph = pose_graph.graph_from_trajectory(
        poses0, meas,
        loop_edges=jnp.asarray([[0, 6]], dtype=jnp.int32),
        loop_measurements=geometry.RigidTransform(
            rel.rotation[None], rel.translation[None]
        ),
    )
    graph = pose_graph.pad_edges(graph, 16)  # zero-weight padding present
    for kernel in ("gnc_gm", "cauchy", "welsch", "huber"):
        for scale in (1e-6, 1e6):
            opt, costs = pose_graph.optimize(
                graph, iterations=6, solver="pcg", cg_iterations=30,
                robust=kernel, robust_scale=scale,
            )
            assert bool(jnp.isfinite(opt.poses.translation).all()), (kernel, scale)
            assert bool(jnp.isfinite(costs).all()), (kernel, scale)
    # Auto scale through the same padded graph.
    opt, costs = pose_graph.optimize(
        graph, iterations=6, solver="pcg", cg_iterations=30,
        robust="gnc_gm", robust_scale="auto",
    )
    assert bool(jnp.isfinite(costs).all())


def test_robust_optimize_single_edge_graph(rng):
    """Degenerate topology: a two-node, one-edge graph solves cleanly under
    every kernel (median/max reductions over one element; the GNC schedule
    with max rn2 possibly 0)."""
    from icp_tpu import geometry, lie, pose_graph

    meas = lie.se2_exp(jnp.asarray(rng.uniform(-0.2, 0.2, (1, 3))))
    poses0 = geometry.identity(2, (2,), dtype=jnp.float64)
    graph = pose_graph.graph_from_trajectory(poses0, meas)
    for kernel in ("none", "gnc_gm", "cauchy"):
        opt, costs = pose_graph.optimize(
            graph, iterations=4, solver="dense", robust=kernel,
            robust_scale="auto" if kernel != "none" else 1.0,
        )
        assert bool(jnp.isfinite(opt.poses.translation).all()), kernel
