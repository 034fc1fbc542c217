"""Multi-outlier robustness protocol (VERDICT round-3 item 1).

Round 3 validated the robust back-end against exactly ONE injected wrong
closure; these tests run the standard adversarial regime — the
Vertigo-style injection protocol (:mod:`icp_tpu.robustness`) at 20-30%
wrong closures, random and mutually-consistent clustered, on the bundled
Manhattan graph and an SE(3) loop — and pin the two measured failure modes
that round's design left open, plus their fixes:

* the legacy ``2·max`` auto-scale keys the inlier threshold to the WORST
  outlier, so with many outliers the scale inflates past all of them
  (measured on m600 at 20% random: scale 2068 vs the working ~50, recall
  0.01) — fixed by the upper-median rule (``auto_robust_scale``);
* even the median rule derives from residuals at the CORRUPTED L2 solve,
  leaving recall 0.69-0.93 at 20-30% — fixed by
  :func:`icp_tpu.pose_graph.robust_solve`'s bounded scale re-estimation
  (one extra pass: every m600 cell at recall 1.00 / inliers-kept 1.00 /
  ATE <= 0.02 m vs the outlier-free oracle).

No reference counterpart (the C++ library has no back-end at all); the
protocol follows Sünderhauf & Protzel (ICRA 2012) and Olson's Manhattan
benchmarks.
"""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu import geometry, lie, pose_graph, robustness
from icp_tpu import eval as tpu_eval
from icp_tpu.io import read_g2o

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
M600 = os.path.join(REPO, "ex_data", "manhattan", "m600.g2o")


def _two_lap_square(rng, t_side=8, closure_stride=3, drift=0.03,
                    closure_noise=0.005):
    """Two laps around a square: true closures link ``(k, k + perimeter)``
    — a multi-closure scenario (11 true closures) the single-closure
    round-3 tests cannot cover."""
    perimeter = 4 * t_side
    t_steps = 2 * perimeter + 1
    true_xi = np.zeros((t_steps - 1, 3))
    true_xi[:, 0] = 1.0
    true_xi[t_side - 1 :: t_side, 2] = np.pi / 2
    gt = [geometry.RigidTransform(jnp.eye(2), jnp.zeros(2))]
    for k in range(t_steps - 1):
        gt.append(geometry.compose(gt[-1], lie.se2_exp(jnp.asarray(true_xi[k]))))
    noisy = true_xi + rng.normal(0, drift, true_xi.shape)
    meas = lie.se2_exp(jnp.asarray(noisy))
    init = [gt[0]]
    for k in range(t_steps - 1):
        init.append(geometry.compose(
            init[-1], geometry.RigidTransform(meas.rotation[k], meas.translation[k])
        ))
    poses0 = geometry.RigidTransform(
        jnp.stack([p.rotation for p in init]),
        jnp.stack([p.translation for p in init]),
    )
    loop_edges, rots, trans = [], [], []
    for k in range(0, perimeter + 1, closure_stride):
        i, j = k, k + perimeter
        rel = geometry.compose(geometry.inverse(gt[i]), gt[j])
        nrel = geometry.compose(rel, lie.se2_exp(jnp.asarray(rng.normal(0, closure_noise, 3))))
        loop_edges.append([i, j])
        rots.append(nrel.rotation)
        trans.append(nrel.translation)
    graph = pose_graph.graph_from_trajectory(
        poses0, meas,
        loop_edges=jnp.asarray(loop_edges, dtype=jnp.int32),
        loop_measurements=geometry.RigidTransform(jnp.stack(rots), jnp.stack(trans)),
        loop_weight=10.0,
    )
    return graph, t_steps - 1, len(loop_edges)


def _se3_loop_graph(rng, t_steps=200, period=100, drift=0.005):
    """Smooth 3D loop (circle + vertical wobble) revisiting itself one
    period later; 20 true closures."""
    twists = np.zeros((t_steps - 1, 6))
    for k in range(t_steps - 1):
        twists[k, :3] = (0.3, 0.0, 0.02 * math.sin(2 * math.pi * k / period))
        twists[k, 5] = 2 * math.pi / period
    gt = [geometry.RigidTransform(jnp.eye(3), jnp.zeros(3))]
    for k in range(t_steps - 1):
        gt.append(geometry.compose(gt[-1], lie.se3_exp(jnp.asarray(twists[k]))))
    noisy = twists + rng.normal(0, drift, twists.shape)
    meas = lie.se3_exp(jnp.asarray(noisy))
    init = [gt[0]]
    for k in range(t_steps - 1):
        init.append(geometry.compose(
            init[-1], geometry.RigidTransform(meas.rotation[k], meas.translation[k])
        ))
    poses0 = geometry.RigidTransform(
        jnp.stack([p.rotation for p in init]),
        jnp.stack([p.translation for p in init]),
    )
    loop_edges, rots, trans = [], [], []
    for k in range(0, t_steps - period, 5):
        i, j = k, k + period
        rel = geometry.compose(geometry.inverse(gt[i]), gt[j])
        nrel = geometry.compose(rel, lie.se3_exp(jnp.asarray(rng.normal(0, 0.002, 6))))
        loop_edges.append([i, j])
        rots.append(nrel.rotation)
        trans.append(nrel.translation)
    graph = pose_graph.graph_from_trajectory(
        poses0, meas,
        loop_edges=jnp.asarray(loop_edges, dtype=jnp.int32),
        loop_measurements=geometry.RigidTransform(jnp.stack(rots), jnp.stack(trans)),
        loop_weight=10.0,
    )
    return graph, t_steps - 1, len(loop_edges)


def _ate(opt, reference_t):
    return tpu_eval.ate(opt.poses.translation, reference_t).rmse


# -- injection machinery ------------------------------------------------------


def test_inject_outliers_deterministic_and_rated(rng):
    graph, n_odo, n_true = _two_lap_square(rng)
    bad1, out1, rob1 = robustness.inject_outliers(graph, 0.3, mode="random", seed=7)
    bad2, out2, rob2 = robustness.inject_outliers(graph, 0.3, mode="random", seed=7)
    np.testing.assert_array_equal(np.asarray(bad1.edges_ij), np.asarray(bad2.edges_ij))
    np.testing.assert_array_equal(
        np.asarray(bad1.measurements.translation),
        np.asarray(bad2.measurements.translation),
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # rate = wrong / total closures on the corrupted graph.
    n_inj = int(np.asarray(out1).sum())
    assert n_inj == round(0.3 / 0.7 * n_true)
    assert bad1.num_edges == graph.num_edges + n_inj
    # Injected edges are flagged robust and claim real-closure confidence.
    assert bool(np.asarray(rob1)[-n_inj:].all())
    assert np.asarray(bad1.weights)[-n_inj:].min() > 0
    # Zero rate is the identity.
    same, out0, _ = robustness.inject_outliers(graph, 0.0, seed=7)
    assert same.num_edges == graph.num_edges
    assert not np.asarray(out0).any()


def test_injected_cluster_shares_one_wrong_hypothesis(rng):
    """'clustered' outliers must be mutually consistent: every edge in a
    cluster satisfies Z_k = X_i^{-1} · D · X_j for ONE common rigid offset
    D — the perceptual-aliasing regime where outliers corroborate each
    other."""
    graph, n_odo, n_true = _two_lap_square(rng)
    bad, is_out, _ = robustness.inject_outliers(
        graph, 0.3, mode="clustered", seed=7, min_separation=12, cluster_size=4
    )
    out_idx = np.flatnonzero(np.asarray(is_out))[:4]  # the first cluster
    rot = np.asarray(bad.poses.rotation)
    trans = np.asarray(bad.poses.translation)
    m_rot = np.asarray(bad.measurements.rotation)
    m_trans = np.asarray(bad.measurements.translation)
    ij = np.asarray(bad.edges_ij)
    ds = []
    for e in out_idx:
        i, j = ij[e]
        # D = X_i · Z · X_j^{-1}.
        d_rot = rot[i] @ m_rot[e] @ rot[j].T
        d_trans = rot[i] @ m_trans[e] + trans[i] - d_rot @ trans[j]
        ds.append((d_rot, d_trans))
    for d_rot, d_trans in ds[1:]:
        np.testing.assert_allclose(d_rot, ds[0][0], atol=1e-9)
        np.testing.assert_allclose(d_trans, ds[0][1], atol=1e-9)


def test_classify_closures_degenerate_denominators():
    w = np.asarray([1.0, 0.2, 1.0])
    rob = np.asarray([False, True, True])
    out = np.asarray([False, True, False])
    cls = robustness.classify_closures(w, out, rob)
    assert cls == {
        "precision": 1.0, "recall": 1.0, "inliers_kept": 1.0,
        "n_rejected": 1, "n_outliers": 1, "n_true_closures": 1,
    }
    # No outliers, nothing rejected: vacuously perfect, not 0/0.
    cls = robustness.classify_closures(
        np.ones(3), np.zeros(3, bool), rob
    )
    assert cls["precision"] == 1.0 and cls["recall"] == 1.0


def test_run_protocol_smoke(rng):
    graph, n_odo, n_true = _two_lap_square(rng)
    recs = robustness.run_protocol(
        graph, rates=(0.25,), modes=("clustered",),
        kernels=("none", "welsch"), iterations=30, solver="dense",
        seed=7, min_separation=12, cluster_size=4,
    )
    assert len(recs) == 2
    none_rec = next(r for r in recs if r["kernel"] == "none")
    wel_rec = next(r for r in recs if r["kernel"] == "welsch")
    assert "recall" not in none_rec
    assert wel_rec["recall"] == 1.0
    assert wel_rec["inliers_kept"] == 1.0
    assert wel_rec["ate_vs_oracle"] < 0.1 * none_rec["ate_vs_oracle"]


# -- the pinned failure + fix (VERDICT round-3 item 1) ------------------------


def test_legacy_max_rule_breaks_under_multiple_outliers():
    """The round-3 ``2·max`` auto-scale keys the threshold to the WORST
    outlier residual: at 20% random outliers on m600 the scale inflates to
    ~2068 (vs the ~243 the median rule picks and the ~50 the re-estimated
    pass lands on), the kernel rejects essentially nothing (measured
    recall 0.01), and the solve stays at the corrupted compromise.  The
    upper-median rule recovers recall 0.93 single-pass.  Pinned exactly as
    the round-3 negative findings were."""
    graph = read_g2o(M600)
    oracle, _ = pose_graph.optimize(graph, iterations=30, solver="pcg")
    orc_t = np.asarray(oracle.poses.translation)
    bad, is_out, rob = robustness.inject_outliers(graph, 0.2, mode="random", seed=3)
    results = {}
    for rule in ("max", "median"):
        s = float(pose_graph.auto_robust_scale(
            bad, iterations=30, solver="pcg", robust_edges=rob, rule=rule
        ))
        opt, _ = pose_graph.optimize(
            bad, iterations=30, solver="pcg",
            robust="welsch", robust_scale=s, robust_edges=rob,
        )
        w, _ = pose_graph.robust_edge_weights(opt, "welsch", s, robust_edges=rob)
        cls = robustness.classify_closures(w, is_out, rob)
        results[rule] = (s, cls, _ate(opt, orc_t))
    s_max, cls_max, ate_max = results["max"]
    s_med, cls_med, ate_med = results["median"]
    assert s_max > 4 * s_med, (s_max, s_med)
    assert cls_max["recall"] < 0.1, cls_max  # the pinned failure
    assert cls_med["recall"] > 0.85, cls_med  # the fix
    assert ate_med < 0.5 * ate_max, (ate_med, ate_max)


def test_two_pass_robust_solve_cleans_m600_at_30_percent():
    """robust_solve's bounded scale re-estimation on the hardest cell
    (clustered 30%): single-pass leaves recall 0.69 / 4.9 m ATE; the
    second pass reaches recall 1.00, inliers-kept 1.00, ATE < 0.1 m vs the
    outlier-free oracle — and a third pass changes nothing (the floors are
    a fixed point)."""
    graph = read_g2o(M600)
    oracle, _ = pose_graph.optimize(graph, iterations=30, solver="pcg")
    orc_t = np.asarray(oracle.poses.translation)
    bad, is_out, rob = robustness.inject_outliers(graph, 0.3, mode="clustered", seed=3)
    by_pass = {}
    for passes in (1, 2):
        opt, _, s, w = pose_graph.robust_solve(
            bad, kernel="welsch", robust_edges=rob,
            iterations=30, solver="pcg", scale_passes=passes,
        )
        by_pass[passes] = (s, robustness.classify_closures(w, is_out, rob),
                           _ate(opt, orc_t))
    s1, cls1, ate1 = by_pass[1]
    s2, cls2, ate2 = by_pass[2]
    assert cls1["recall"] < 0.9, cls1  # single-pass is not enough here
    assert ate1 > 1.0, ate1
    assert cls2["recall"] == 1.0, cls2
    assert cls2["inliers_kept"] == 1.0, cls2
    assert ate2 < 0.1, ate2
    assert s2 < s1, (s1, s2)


def test_fused_two_pass_matches_host_driver(rng):
    """robust_solve_fused (the traceable twin that backs OnlineSlam's
    mapping-scale refinement) reproduces robust_solve exactly: bit-identical
    scale, poses to fp64 roundoff, identical weights — eagerly AND under
    jit (the whole two-pass recipe as one XLA executable, traced masked
    medians/quantile replacing the host NumPy statistics)."""
    import jax

    graph, _, _ = _two_lap_square(rng)
    for mode in ("random", "clustered"):
        bad, is_out, rob = robustness.inject_outliers(graph, 0.25, mode=mode, seed=3)
        opt_h, _, s_h, w_h = pose_graph.robust_solve(bad, robust_edges=rob)
        opt_f, _, s_f, w_f = jax.jit(
            lambda g, m: pose_graph.robust_solve_fused(g, m)
        )(bad, rob)
        assert float(s_f) == s_h, (mode, s_h, float(s_f))
        np.testing.assert_allclose(
            np.asarray(opt_f.poses.translation),
            np.asarray(opt_h.poses.translation), atol=1e-12,
        )
        np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_h), atol=1e-12)
        # The fused path classifies identically.
        cls_h = robustness.classify_closures(w_h, is_out, rob)
        cls_f = robustness.classify_closures(w_f, is_out, rob)
        assert cls_h == cls_f, (mode, cls_h, cls_f)


def test_fused_explicit_scale_and_pass_counts(rng):
    """Fused driver parity holds for explicit scales and pass counts 1/3
    (pass 1 = plain single welsch solve; pass 3 = the fixed-point claim)."""
    graph, _, _ = _two_lap_square(rng)
    bad, _, rob = robustness.inject_outliers(graph, 0.2, mode="random", seed=5)
    for kwargs in ({"robust_scale": 0.7}, {"scale_passes": 1}, {"scale_passes": 3}):
        opt_h, _, s_h, w_h = pose_graph.robust_solve(bad, robust_edges=rob, **kwargs)
        opt_f, _, s_f, w_f = pose_graph.robust_solve_fused(bad, rob, **kwargs)
        np.testing.assert_allclose(
            np.asarray(opt_f.poses.translation),
            np.asarray(opt_h.poses.translation), atol=1e-12, err_msg=str(kwargs),
        )
        np.testing.assert_allclose(float(s_f), s_h, rtol=1e-12)


def test_multi_outlier_se3_two_pass_bootstrap_floor(rng):
    """SE(3), 25% outliers: the dimension-generic path.  The clustered
    cell also pins WHY the re-estimate needs the bootstrap floor: the
    single-pass scale (derived at the bent L2 solve) lands BELOW the
    inlier init-residual level, welsch cannot bootstrap and cuts every
    true closure (inliers-kept 0.00); the second pass re-anchors above the
    lower-quartile init residual and recovers all of them."""
    graph, n_odo, n_true = _se3_loop_graph(rng)
    oracle, _ = pose_graph.optimize(graph, iterations=20, solver="pcg")
    orc_t = np.asarray(oracle.poses.translation)
    for mode in ("random", "clustered"):
        bad, is_out, rob = robustness.inject_outliers(
            graph, 0.25, mode=mode, seed=11, min_separation=30
        )
        l2, _ = pose_graph.optimize(bad, iterations=20, solver="pcg")
        opt, _, s, w = pose_graph.robust_solve(
            bad, kernel="welsch", robust_edges=rob,
            iterations=30, solver="pcg", scale_passes=2,
        )
        cls = robustness.classify_closures(w, is_out, rob)
        assert cls["recall"] == 1.0, (mode, cls)
        assert cls["inliers_kept"] == 1.0, (mode, cls)
        assert _ate(opt, orc_t) < 0.05, mode
        assert _ate(l2, orc_t) > 1.0, mode  # the damage being defended


def test_gnc_head_zero_multi_outlier_schedule(rng):
    """gnc_head=0.0 (anneal from step 1, the original Yang schedule) on a
    multi-outlier toy cell where the quadratic head's full-trust phase
    costs an inlier: head=0.25 feedback-rejects one true closure
    (inliers-kept 0.91), head=0.0 keeps all 11 (measured, seed-pinned).
    The default stays 0.25 — the single-bad-closure windows of
    test_robust_posegraph.py depend on it."""
    graph, n_odo, n_true = _two_lap_square(rng)
    bad, is_out, rob = robustness.inject_outliers(
        graph, 0.1, mode="random", seed=9, min_separation=12, cluster_size=4
    )
    s = float(pose_graph.auto_robust_scale(
        bad, iterations=30, solver="dense", robust_edges=rob
    ))
    kept = {}
    for head in (0.25, 0.0):
        opt, _ = pose_graph.optimize(
            bad, iterations=30, solver="dense", robust="gnc_gm",
            robust_scale=s, robust_edges=rob, gnc_head=head,
        )
        w, _ = pose_graph.robust_edge_weights(opt, "gnc_gm", s, robust_edges=rob)
        cls = robustness.classify_closures(w, is_out, rob)
        assert cls["recall"] == 1.0, (head, cls)
        kept[head] = cls["inliers_kept"]
    assert kept[0.25] < 1.0, kept
    assert kept[0.0] == 1.0, kept


def test_robust_solve_explicit_scale_and_errors(rng):
    graph, n_odo, n_true = _two_lap_square(rng)
    mask = jnp.arange(graph.num_edges) >= n_odo
    opt, costs, s, w = pose_graph.robust_solve(
        graph, kernel="gnc_gm", robust_edges=mask,
        iterations=12, solver="dense", robust_scale=0.8, scale_passes=1,
    )
    assert s == 0.8
    assert costs.shape == (13,)
    assert w.shape == (graph.num_edges,)
    with pytest.raises(ValueError, match="'auto'"):
        pose_graph.robust_solve(graph, robust_scale="car", robust_edges=mask)
    with pytest.raises(ValueError, match="unknown auto-scale rule"):
        pose_graph.auto_robust_scale(graph, rule="p95")
    with pytest.raises(ValueError, match="rate"):
        robustness.inject_outliers(graph, 1.0)
    with pytest.raises(ValueError, match="mode"):
        robustness.inject_outliers(graph, 0.2, mode="adversarial")


def test_dense_solver_f32_conditioning(rng):
    """The Jacobi-scaled dense GN solve stays finite in f32 from a far
    (odometry-chain) init.  Round-5 regression pin: the unscaled normal
    matrix mixes edge weights (~1e2), unit blocks, and bare damping on
    zero-weight padding edges — past f32's LU range; the L2 pre-solve
    NaN'd on its FIRST step from the chain init (f64 converged 23830 ->
    657), which surfaced as scale=inf in the streaming two-pass.  The
    scaling is an exact-arithmetic no-op (f64 parity is held by every
    solver test); this pins the f32 side."""
    import dataclasses as dc

    import jax

    graph, _, _ = _two_lap_square(rng, drift=0.05)
    # f32 + stiff weights + zero-weight padding edges: the measured
    # conditioning regime.
    g32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64
        else x,
        graph,
    )
    g32 = dc.replace(g32, weights=g32.weights * 100.0)
    g32 = pose_graph.pad_edges(pose_graph.pad_nodes(g32, 128), 100)
    opt, costs = pose_graph.optimize(g32, iterations=20, solver="dense")
    c = np.asarray(costs)
    assert np.all(np.isfinite(c)), c
    assert c[-1] < 0.05 * c[0], c  # actually converged, not just finite
