"""Scan-matching information matrices (`ops/covariance.py`) and anisotropic
pose-graph edges (`PoseGraph.sqrt_information`).

The aperture problem, quantified: a corridor-to-corridor closure pins the
lateral offset but barely constrains the along-corridor translation.  These
tests pin (a) the closed-form normal-projected information against autodiff
of the point-to-plane objective, (b) the corridor anisotropy, and (c) that
the graph solve USES it — an anisotropically-blind closure yields in the
directions it cannot see while keeping influence where it can.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu import geometry, lie, pose_graph
from icp_tpu.ops.covariance import (
    cloud_information,
    scan_matching_information,
    sqrt_information,
)


@pytest.mark.parametrize("dim", [2, 3])
def test_information_matches_autodiff_hessian(rng, dim):
    """Closed-form H == J^T J of the point-to-plane residuals
    r_i = sqrt(w_i) n_i . (exp(delta) p_i - p_i) at delta = 0, autodiffed
    through the same lie right-perturbation."""
    n = 40
    pts = jnp.asarray(rng.uniform(-3, 3, (n, dim)))
    normals_raw = rng.normal(0, 1, (n, dim))
    normals = jnp.asarray(normals_raw / np.linalg.norm(normals_raw, axis=-1, keepdims=True))
    mask = jnp.asarray(rng.random(n) > 0.25)
    d = lie.dof(dim)

    h = scan_matching_information(pts, normals, mask)

    sw = jnp.sqrt(mask.astype(pts.dtype))

    def residuals(delta):
        moved = geometry.apply(lie.exp(delta, dim), pts)
        return sw * jnp.sum(normals * (moved - pts), axis=-1)

    jac = jax.jacfwd(residuals)(jnp.zeros((d,), dtype=pts.dtype))
    ref = jac.T @ jac
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref), rtol=1e-8, atol=1e-10)


def test_corridor_information_is_anisotropic(rng):
    """Two parallel walls along x (normals +-y): translation information is
    rank-deficient along the corridor axis — the quantified aperture
    problem — while a cluttered room's is well-conditioned."""
    n = 400
    x = rng.uniform(-10, 10, n)
    y = np.where(rng.random(n) > 0.5, 1.0, -1.0)
    pts = np.stack([x, y + rng.normal(0, 0.005, n)], -1)
    normals = np.stack([np.zeros(n), np.sign(y)], -1)
    h = np.asarray(scan_matching_information(jnp.asarray(pts), jnp.asarray(normals)))
    t_block = h[:2, :2]
    assert t_block[1, 1] / max(t_block[0, 0], 1e-12) > 1e4  # x ~ unconstrained

    # Clutter: random normals -> comparable eigenvalues.
    pts2 = rng.uniform(-10, 10, (n, 2))
    nr = rng.normal(0, 1, (n, 2))
    nr /= np.linalg.norm(nr, axis=-1, keepdims=True)
    h2 = np.asarray(scan_matching_information(jnp.asarray(pts2), jnp.asarray(nr)))
    evals = np.linalg.eigvalsh(h2[:2, :2])
    assert evals[1] / evals[0] < 3


def test_cloud_information_on_real_sweep():
    """A seq1 corridor-ish sweep: the helper runs off a PointCloud and the
    weakest translation direction is geometrically meaningful (unit-norm,
    finite, normalized per point)."""
    import os

    from icp_tpu.io import parse_sweep

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sweep = parse_sweep(os.path.join(repo, "ex_data", "seq1", "sweep_000.conf"))
    h = np.asarray(cloud_information(sweep, k=10))
    assert h.shape == (3, 3)
    assert np.all(np.isfinite(h))
    evals = np.linalg.eigvalsh(h)
    assert evals[0] >= -1e-9  # PSD
    # Per-point normalization invariant: the translation block's trace is
    # the mean squared normal length == 1 (unit normals).
    np.testing.assert_allclose(h[0, 0] + h[1, 1], 1.0, atol=1e-5)


def test_sqrt_information_identity_is_noop(rng):
    """sqrt_information = stacked identities must reproduce the scalar path
    bit for bit (residuals) and to solver tolerance (optimize)."""
    from tests.test_robust_posegraph import _square_loop_graph

    graph, _, _, _ = _square_loop_graph(rng)
    d = lie.dof(graph.dim)
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=graph.poses.dtype), (graph.num_edges, d, d)
    )
    graph_i = dataclasses.replace(graph, sqrt_information=eye)
    np.testing.assert_array_equal(
        np.asarray(pose_graph.edge_residuals(graph, graph.poses)),
        np.asarray(pose_graph.edge_residuals(graph_i, graph_i.poses)),
    )
    a, _ = pose_graph.optimize(graph, iterations=8, solver="dense")
    b, _ = pose_graph.optimize(graph_i, iterations=8, solver="dense")
    np.testing.assert_allclose(
        np.asarray(a.poses.translation), np.asarray(b.poses.translation), atol=1e-12
    )
    # pcg path too (the analytic edge blocks carry the whitener).
    c, _ = pose_graph.optimize(graph_i, iterations=8, solver="pcg", cg_iterations=200)
    np.testing.assert_allclose(
        np.asarray(c.poses.translation), np.asarray(a.poses.translation), atol=1e-6
    )


def test_anisotropic_closure_yields_where_it_is_blind():
    """Two conflicting closures between nodes 0 and 2: an isotropic edge vs
    an edge whose information is blind along x but 4x stronger in y.  The
    solve follows the isotropic edge in x and leans toward the strong-y
    edge in y — a scalar weight cannot produce this split."""
    dtype = jnp.float64
    meas = geometry.RigidTransform(
        jnp.broadcast_to(jnp.eye(2, dtype=dtype), (2, 2, 2)),
        jnp.asarray([[1.0, 0.0], [1.0, 0.0]], dtype=dtype),
    )
    poses0 = geometry.RigidTransform(
        jnp.broadcast_to(jnp.eye(2, dtype=dtype), (3, 2, 2)),
        jnp.asarray([[0, 0], [1, 0], [2, 0]], dtype=dtype),
    )
    loop_edges = jnp.asarray([[0, 2], [0, 2]], dtype=jnp.int32)
    loop_meas = geometry.RigidTransform(
        jnp.broadcast_to(jnp.eye(2, dtype=dtype), (2, 2, 2)),
        jnp.asarray([[2.4, 0.0], [1.6, 0.3]], dtype=dtype),
    )
    info = jnp.stack([
        jnp.eye(3, dtype=dtype),
        jnp.diag(jnp.asarray([1e-9, 4.0, 1.0], dtype=dtype)),  # blind in x
    ])
    graph = pose_graph.graph_from_trajectory(
        poses0, meas, loop_edges=loop_edges, loop_measurements=loop_meas,
        odometry_weight=1e-3, loop_weight=10.0, loop_information=info,
    )
    opt, _ = pose_graph.optimize(graph, iterations=15, solver="dense")
    end = np.asarray(opt.poses.translation[2])
    assert abs(end[0] - 2.4) < 0.05, end  # x: only the isotropic edge sees it
    assert end[1] > 0.18, end  # y: the 4x edge dominates the compromise


def test_pad_and_shard_with_information(rng):
    from tests.test_robust_posegraph import _square_loop_graph

    from icp_tpu.parallel.mesh import make_mesh

    graph, _, _, n_odo = _square_loop_graph(rng)
    d = lie.dof(graph.dim)
    info = jnp.stack(
        [jnp.eye(d, dtype=graph.poses.dtype) * (1.0 + 0.1 * k)
         for k in range(graph.num_edges)]
    )
    graph_i = dataclasses.replace(graph, sqrt_information=sqrt_information(info))
    plain, _ = pose_graph.optimize(graph_i, iterations=5, solver="pcg")
    padded = pose_graph.pad_edges(graph_i, 8)
    opt_b, _ = pose_graph.optimize(padded, iterations=5, solver="pcg")
    np.testing.assert_allclose(
        np.asarray(plain.poses.translation),
        np.asarray(opt_b.poses.translation),
        atol=1e-12,
    )
    mesh = make_mesh(data=8, points=1)
    sharded = pose_graph.shard_over_edges(graph_i, mesh)
    opt_c, _ = jax.jit(
        lambda g: pose_graph.optimize(g, iterations=5, solver="pcg")
    )(sharded)
    np.testing.assert_allclose(
        np.asarray(opt_c.poses.translation),
        np.asarray(plain.poses.translation),
        atol=1e-9,
    )


def test_robust_kernels_compose_with_information(rng):
    """GNC + matrix whitening: the injected-bad-closure rejection still
    works when closures carry information matrices."""
    from tests.test_robust_posegraph import _ate, _loop_mask, _square_loop_graph

    graph, oracle, gt_t, n_odo = _square_loop_graph(rng)
    d = lie.dof(graph.dim)
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=graph.poses.dtype), (graph.num_edges, d, d)
    )
    graph_i = dataclasses.replace(graph, sqrt_information=eye)
    mask = _loop_mask(graph_i, n_odo)
    rob, _ = pose_graph.optimize(
        graph_i, iterations=30, solver="dense",
        robust="gnc_gm", robust_scale="auto", robust_edges=mask,
    )
    orc, _ = pose_graph.optimize(oracle, iterations=20, solver="dense")
    assert _ate(rob.poses, gt_t) < _ate(orc.poses, gt_t) + 0.05


def test_run_slam_closure_information_smoke(rng):
    """run_slam(closure_information=True) attaches per-closure anisotropic
    information and still closes the loop on the circle scenario."""
    import math

    import icp_tpu as icp
    from icp_tpu import slam

    world = rng.uniform(-30, 30, (150, 2))
    t_steps, radius = 25, 4.0
    scans = []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        scans.append(pts + rng.normal(0, 0.02, pts.shape))
    stack = icp.stack([icp.from_points(p, capacity=152, dtype=np.float64) for p in scans])
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(
        max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5
    )
    result = slam.run_slam(
        stack, method, cfg, loop_radius=1.5, loop_min_separation=t_steps - 2,
        loop_weight=10.0, loop_coarse=True, closure_information=True,
    )
    assert result.loop_edges.shape[0] >= 1
    end_raw = float(np.linalg.norm(np.asarray(result.trajectory.poses.translation[-1])))
    end_opt = float(np.linalg.norm(np.asarray(result.poses.translation[-1])))
    assert end_opt < max(0.3 * end_raw, 0.05), (end_opt, end_raw)
