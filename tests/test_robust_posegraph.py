"""Robust pose-graph back-end (VERDICT round-2 item 1).

The failure mode these tests pin: a loop closure that converged to a
PLAUSIBLE ICP cost in the WRONG basin (``pose_graph.register_loop_closures``
docstring).  ``max_cost`` filtering cannot catch it — the cost is low — so
the graph solve must down-weight it by its *graph inconsistency*.  The L2
solve provably fails (corrupted trajectory); the redescending robust
kernels (GNC-GM, Cauchy) applied to the loop edges at the auto-derived
scale recover the oracle solution.  Two measured negative findings are
pinned too: Huber's IRLS fixed point is the L2 compromise
(bounded-but-not-redescending influence cannot reject a structured
outlier), and robustifying the odometry edges lets the solver DISCONNECT
the chain instead of rejecting the closure.

No reference counterpart (the C++ library has no trajectory back-end at
all); the kernel design follows Yang et al. 2020 (GNC, PAPERS.md) and the
classic IRLS M-estimators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import geometry, lie, pose_graph


def _square_loop_graph(rng, bad_closure=True, t_steps=17, drift=0.03):
    """Noisy odometry around a square + one TRUE closure + one WRONG closure.

    Returns (graph, oracle_graph, gt_translations, n_odo_edges) where
    ``oracle_graph`` is the same draw WITHOUT the bad closure — the solve a
    perfect closure filter would have seen, the seed-independent yardstick
    for "recovered".  The wrong closure claims node ``t-3`` observes node 2
    at a pose 1.5 m off the truth — exactly the plausible-cost/wrong-basin
    case (e.g. a corridor aliased onto the wrong segment).  Ground truth is
    gauge-aligned (node 0 = identity).
    """
    side = (t_steps - 1) // 4
    true_xi = np.zeros((t_steps - 1, 3))
    true_xi[:, 0] = 1.0
    true_xi[side - 1 :: side, 2] = np.pi / 2

    gt = [geometry.RigidTransform(jnp.eye(2), jnp.zeros(2))]
    for k in range(t_steps - 1):
        gt.append(geometry.compose(gt[-1], lie.se2_exp(jnp.asarray(true_xi[k]))))

    noisy = true_xi + rng.normal(0, drift, true_xi.shape)
    meas = lie.se2_exp(jnp.asarray(noisy))
    init = [geometry.RigidTransform(jnp.eye(2), jnp.zeros(2))]
    for k in range(t_steps - 1):
        init.append(
            geometry.compose(
                init[-1],
                geometry.RigidTransform(meas.rotation[k], meas.translation[k]),
            )
        )
    poses0 = geometry.RigidTransform(
        jnp.stack([p.rotation for p in init]),
        jnp.stack([p.translation for p in init]),
    )

    loop_edges = [[t_steps - 1, 0]]
    rel_true = geometry.compose(geometry.inverse(gt[t_steps - 1]), gt[0])
    rots = [rel_true.rotation]
    trans = [rel_true.translation]
    if bad_closure:
        a, b = t_steps - 3, 2
        loop_edges.append([a, b])
        rel_ab = geometry.compose(geometry.inverse(gt[a]), gt[b])
        # Plausible-but-wrong: offset by 1.5 m in the measured frame.
        rots.append(rel_ab.rotation)
        trans.append(rel_ab.translation + jnp.asarray([1.5, 0.0]))
    loop_meas = geometry.RigidTransform(jnp.stack(rots), jnp.stack(trans))

    def build(k):
        return pose_graph.graph_from_trajectory(
            poses0,
            meas,
            loop_edges=jnp.asarray(loop_edges[:k], dtype=jnp.int32),
            loop_measurements=geometry.RigidTransform(
                loop_meas.rotation[:k], loop_meas.translation[:k]
            ),
            loop_weight=10.0,
        )

    graph = build(len(loop_edges))
    oracle = build(1)
    gt_t = np.stack([np.asarray(p.translation) for p in gt])
    return graph, oracle, gt_t, t_steps - 1


def _loop_mask(graph, n_odo):
    return jnp.arange(graph.num_edges) >= n_odo


def _ate(poses, gt_t):
    return float(
        np.sqrt(np.mean(np.sum((np.asarray(poses.translation) - gt_t) ** 2, -1)))
    )


@pytest.mark.parametrize("kernel", ["gnc_gm", "cauchy"])
@pytest.mark.parametrize("solver", ["dense", "pcg"])
def test_robust_recovers_from_injected_bad_closure(rng, kernel, solver):
    graph, oracle, gt_t, n_odo = _square_loop_graph(rng)
    mask = _loop_mask(graph, n_odo)

    l2, _ = pose_graph.optimize(graph, iterations=20, solver=solver)
    rob, _ = pose_graph.optimize(
        graph, iterations=30, solver=solver,
        robust=kernel, robust_scale="auto", robust_edges=mask,
    )
    # Yardstick: the L2 solve on the graph a perfect closure filter would
    # have produced (bad edge never accepted).
    orc, _ = pose_graph.optimize(oracle, iterations=20, solver=solver)
    ate_l2 = _ate(l2.poses, gt_t)
    ate_rob = _ate(rob.poses, gt_t)
    ate_orc = _ate(orc.poses, gt_t)
    # The L2 solve trusts the bad edge and corrupts the trajectory; both
    # kernels reject the bad edge.  GNC relaxes all the way to the oracle
    # solution; Cauchy (non-annealed, keeps an epsilon weight on the
    # outlier) recovers most of the error — pinned at its measured level.
    scale = pose_graph.auto_robust_scale(
        graph, iterations=30, solver=solver, robust_edges=mask
    )
    w, _ = pose_graph.robust_edge_weights(rob, kernel, scale, robust_edges=mask)
    assert ate_l2 > 0.25, ate_l2
    assert float(w[-1]) < 0.05, (kernel, solver, float(w[-1]))  # bad edge dead
    assert float(w[-2]) > 0.8, (kernel, solver, float(w[-2]))  # true edge alive
    if kernel == "gnc_gm":
        assert ate_rob < ate_orc + 0.05, (solver, ate_rob, ate_orc)
    else:
        assert ate_rob < 0.6 * ate_l2, (solver, ate_rob, ate_l2)


def test_robust_weights_classify_edges(rng):
    graph, _, _, n_odo = _square_loop_graph(rng)
    mask = _loop_mask(graph, n_odo)
    scale = pose_graph.auto_robust_scale(
        graph, iterations=30, solver="dense", robust_edges=mask
    )
    rob, _ = pose_graph.optimize(
        graph, iterations=30, solver="dense",
        robust="gnc_gm", robust_scale=scale, robust_edges=mask,
    )
    w, rn = pose_graph.robust_edge_weights(rob, "gnc_gm", scale, robust_edges=mask)
    w = np.asarray(w)
    # Odometry edges are exempt (mask), the true closure survives, the
    # injected closure dies.
    np.testing.assert_array_equal(w[:n_odo], 1.0)
    assert w[n_odo] > 0.5  # true closure
    assert w[n_odo + 1] < 0.01  # injected wrong closure
    assert float(rn[n_odo + 1]) > float(rn[n_odo])


def test_gnc_recommended_budget_matches_oracle(rng):
    """At the documented 30-iteration budget the GNC solve matches the
    oracle (bad closure never accepted) to odometry-noise precision —
    measured: rejection completes by ~iteration 20 on every seed but the
    trajectory needs the tail to relax (hence the run_slam default of 30
    for robust kernels)."""
    graph, oracle, gt_t, n_odo = _square_loop_graph(rng)
    mask = _loop_mask(graph, n_odo)
    rob, _ = pose_graph.optimize(
        graph, iterations=30, solver="dense",
        robust="gnc_gm", robust_scale="auto", robust_edges=mask,
    )
    orc, _ = pose_graph.optimize(oracle, iterations=30, solver="dense")
    assert abs(_ate(rob.poses, gt_t) - _ate(orc.poses, gt_t)) < 0.02
    scale = pose_graph.auto_robust_scale(
        graph, iterations=30, solver="dense", robust_edges=mask
    )
    w, _ = pose_graph.robust_edge_weights(rob, "gnc_gm", scale, robust_edges=mask)
    assert float(w[-1]) < 0.01


def test_huber_fixed_point_is_l2_compromise(rng):
    """Measured negative finding, pinned: Huber only BOUNDS outlier
    influence.  On a bendable graph its IRLS fixed point spreads the
    conflict until every closure is inside the threshold — it does NOT
    reject the wrong closure.  This is why the redescending kernels are the
    recommended defaults (optimize docstring)."""
    graph, _, gt_t, _ = _square_loop_graph(rng)
    n_odo = graph.num_edges - 2
    mask = _loop_mask(graph, n_odo)
    l2, _ = pose_graph.optimize(graph, iterations=20, solver="dense")
    hub, _ = pose_graph.optimize(
        graph, iterations=20, solver="dense",
        robust="huber", robust_scale=0.06, robust_edges=mask,
    )
    # Huber ends up at (essentially) the corrupted L2 solution, even at the
    # scale where GNC fully recovers (the auto scale here is ~0.06).
    assert abs(_ate(hub.poses, gt_t) - _ate(l2.poses, gt_t)) < 0.05
    assert _ate(hub.poses, gt_t) > 0.25


def test_robustifying_odometry_edges_disconnects_chain(rng):
    """Measured negative finding, pinned: letting the redescending kernel
    touch the odometry edges lets the solver CUT the chain and satisfy the
    wrong closure exactly (bad-edge weight back to ~1) instead of rejecting
    it.  The loop-only mask is load-bearing."""
    graph, oracle, gt_t, n_odo = _square_loop_graph(rng)
    all_edges, _ = pose_graph.optimize(
        graph, iterations=40, solver="dense", robust="gnc_gm", robust_scale=0.06
    )
    w_all, _ = pose_graph.robust_edge_weights(all_edges, "gnc_gm", 0.06)
    masked, _ = pose_graph.optimize(
        graph, iterations=40, solver="dense",
        robust="gnc_gm", robust_scale=0.06, robust_edges=_loop_mask(graph, n_odo),
    )
    # Unmasked: some odometry edge got effectively cut AND the bad closure
    # survived; masked: recovers.
    orc, _ = pose_graph.optimize(oracle, iterations=40, solver="dense")
    assert float(np.asarray(w_all)[:n_odo].min()) < 0.1
    assert float(w_all[-1]) > 0.5
    ate_masked = _ate(masked.poses, gt_t)
    assert ate_masked < _ate(orc.poses, gt_t) + 0.05
    assert ate_masked < _ate(all_edges.poses, gt_t)


def test_robust_noop_on_inlier_only_graph(rng):
    """With no outliers and a huge scale, huber reduces exactly to the L2
    solve (weights are exactly 1 below threshold); properly-scaled GNC
    still closes the loop on clean data (the anneal starts quadratic, so
    the big-but-correct closure is used, not rejected)."""
    graph, _, gt_t, n_odo = _square_loop_graph(rng, bad_closure=False)
    mask = _loop_mask(graph, n_odo)
    l2, _ = pose_graph.optimize(graph, iterations=12, solver="dense")
    hub, _ = pose_graph.optimize(
        graph, iterations=12, solver="dense",
        robust="huber", robust_scale=1e6, robust_edges=mask,
    )
    np.testing.assert_allclose(
        np.asarray(hub.poses.translation), np.asarray(l2.poses.translation), atol=1e-12
    )
    gnc, _ = pose_graph.optimize(
        graph, iterations=12, solver="dense",
        robust="gnc_gm", robust_scale="auto", robust_edges=mask,
    )
    assert _ate(gnc.poses, gt_t) < _ate(l2.poses, gt_t) + 0.05
    scale = pose_graph.auto_robust_scale(
        graph, iterations=12, solver="dense", robust_edges=mask
    )
    # The auto scale is floored at the odometry noise level, so the
    # exactly-satisfied closure is never feedback-rejected.
    w, _ = pose_graph.robust_edge_weights(gnc, "gnc_gm", scale, robust_edges=mask)
    assert float(w[-1]) > 0.5  # clean closure survives


def test_robust_cost_trace_and_cg_solver(rng):
    graph, oracle, gt_t, n_odo = _square_loop_graph(rng)
    mask = _loop_mask(graph, n_odo)
    rob, costs = pose_graph.optimize(
        graph, iterations=30, solver="cg", cg_iterations=100,
        robust="cauchy", robust_scale="auto", robust_edges=mask,
    )
    assert costs.shape == (31,)
    assert np.all(np.isfinite(np.asarray(costs)))
    assert float(costs[-1]) < float(costs[0])
    l2, _ = pose_graph.optimize(graph, iterations=20, solver="cg", cg_iterations=100)
    assert _ate(rob.poses, gt_t) < 0.6 * _ate(l2.poses, gt_t)


def test_robust_optimize_jits_and_vmaps(rng):
    """The GNC schedule is a traced array — optimize must stay jit/vmap
    composable (the fleet pattern of test_pose_graph_vmap_fleet)."""
    g1, oracle, gt_t, n_odo = _square_loop_graph(rng)
    g2, _, _, _ = _square_loop_graph(rng)
    mask = _loop_mask(g1, n_odo)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), g1, g2)

    def solve(g):
        opt, costs = pose_graph.optimize(
            g, iterations=30, solver="dense",
            robust="gnc_gm", robust_scale="auto", robust_edges=mask,
        )
        return opt.poses.translation

    batched = jax.jit(jax.vmap(solve))(stacked)
    single = solve(g1)
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single), atol=1e-9)
    orc, _ = pose_graph.optimize(oracle, iterations=30, solver="dense")
    ate_b = np.sqrt(np.mean(np.sum((np.asarray(batched[0]) - gt_t) ** 2, -1)))
    assert ate_b < _ate(orc.poses, gt_t) + 0.1


def test_unknown_kernel_raises(rng):
    graph, _, _, _ = _square_loop_graph(rng)
    with pytest.raises(ValueError, match="unknown robust kernel"):
        pose_graph.optimize(graph, iterations=2, robust="tukeyy")


def test_run_slam_robust_wiring(rng):
    """run_slam(robust=...) masks the loop edges only, populates
    edge_weights, and — given the deployment's inlier scale — keeps every
    correct closure on clean data and closes the loop.

    The explicit scale matters here: this trajectory accumulates 1.4 m of
    real drift, so even a CORRECT revisit closure retains a ~0.2 m residual
    after the solve (the odometry chain cannot be bent for free), and the
    conservative 'auto' scale — tuned to reject, because accepting a wrong
    closure corrupts the map while rejecting a correct one only costs local
    drift — flags exactly the longest-loop closure (second half of the
    test: the diagnostic is visible in edge_weights)."""
    import math

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
        loop_weight=10.0, loop_coarse=True, robust="gnc_gm", robust_scale=0.8,
    )
    assert result.loop_edges.shape[0] >= 1
    assert result.edge_weights is not None
    w = np.asarray(result.edge_weights)
    assert w.shape[0] == (t_steps - 1) + result.loop_edges.shape[0]
    np.testing.assert_array_equal(w[: t_steps - 1], 1.0)  # odometry exempt
    assert np.all(w[t_steps - 1 :] > 0.5)  # clean closures survive
    end_raw = float(np.linalg.norm(np.asarray(result.trajectory.poses.translation[-1])))
    end_opt = float(np.linalg.norm(np.asarray(result.poses.translation[-1])))
    assert end_opt < max(0.3 * end_raw, 0.03), (end_opt, end_raw)

    # Conservative auto scale on the same data: the drift-carrying revisit
    # closure is down-weighted and VISIBLE in the diagnostic, not silently
    # trusted or dropped.
    auto = slam.run_slam(
        stack, method, cfg, loop_radius=1.5, loop_min_separation=t_steps - 2,
        loop_weight=10.0, loop_coarse=True, robust="gnc_gm",
    )
    w_auto = np.asarray(auto.edge_weights)[t_steps - 1 :]
    assert w_auto.min() < 0.5  # the flagged closure shows up in the report


def test_robust_rejects_bad_closure_se3(rng):
    """The robust back-end is dimension-generic: an injected wrong SE(3)
    closure (plausible cost, wrong basin) is rejected on a 3D trajectory
    exactly like the 2D case (GNC + auto scale, loop-only mask)."""
    t_steps = 15
    twists = rng.uniform(-0.25, 0.25, (t_steps - 1, 6))
    gt = [geometry.RigidTransform(jnp.eye(3), jnp.zeros(3))]
    for k in range(t_steps - 1):
        gt.append(geometry.compose(gt[-1], lie.se3_exp(jnp.asarray(twists[k]))))
    noisy = twists + rng.normal(0, 0.02, twists.shape)
    meas = lie.se3_exp(jnp.asarray(noisy))
    init = [gt[0]]
    for k in range(t_steps - 1):
        init.append(
            geometry.compose(
                init[-1],
                geometry.RigidTransform(meas.rotation[k], meas.translation[k]),
            )
        )
    poses0 = geometry.RigidTransform(
        jnp.stack([p.rotation for p in init]),
        jnp.stack([p.translation for p in init]),
    )
    # True closure end->start; wrong closure offset 1.2 m in y.
    rel_true = geometry.compose(geometry.inverse(gt[-1]), gt[0])
    a, b = t_steps - 3, 2
    rel_bad = geometry.compose(geometry.inverse(gt[a]), gt[b])
    loop_meas = geometry.RigidTransform(
        jnp.stack([rel_true.rotation, rel_bad.rotation]),
        jnp.stack(
            [rel_true.translation, rel_bad.translation + jnp.asarray([0.0, 1.2, 0.0])]
        ),
    )
    graph = pose_graph.graph_from_trajectory(
        poses0, meas,
        loop_edges=jnp.asarray([[t_steps - 1, 0], [a, b]], dtype=jnp.int32),
        loop_measurements=loop_meas, loop_weight=10.0,
    )
    oracle = pose_graph.graph_from_trajectory(
        poses0, meas,
        loop_edges=jnp.asarray([[t_steps - 1, 0]], dtype=jnp.int32),
        loop_measurements=geometry.RigidTransform(
            rel_true.rotation[None], rel_true.translation[None]
        ),
        loop_weight=10.0,
    )
    mask = _loop_mask(graph, t_steps - 1)
    gt_t = np.stack([np.asarray(p.translation) for p in gt])

    l2, _ = pose_graph.optimize(graph, iterations=20, solver="dense")
    orc, _ = pose_graph.optimize(oracle, iterations=20, solver="dense")
    rob, _ = pose_graph.optimize(
        graph, iterations=30, solver="dense",
        robust="gnc_gm", robust_scale="auto", robust_edges=mask,
    )
    scale = pose_graph.auto_robust_scale(
        graph, iterations=30, solver="dense", robust_edges=mask
    )
    w, _ = pose_graph.robust_edge_weights(rob, "gnc_gm", scale, robust_edges=mask)
    assert _ate(l2.poses, gt_t) > 0.15
    assert float(w[-1]) < 0.05  # bad SE(3) closure dead
    assert float(w[-2]) > 0.8  # true closure alive
    assert _ate(rob.poses, gt_t) < _ate(orc.poses, gt_t) + 0.1
