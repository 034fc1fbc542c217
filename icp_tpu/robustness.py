"""Multi-outlier robustness evaluation for the pose-graph back-end.

The standard adversarial protocol for robust SLAM back-ends (Sünderhauf &
Protzel's Vertigo evaluation, ICRA 2012; Olson's Manhattan datasets):
inject WRONG loop closures into a pose graph at controlled rates and
structures, solve with each robust kernel, and report

* **closure classification**: precision/recall of outlier rejection from
  the converged IRLS weights (:func:`icp_tpu.pose_graph.robust_edge_weights`),
  plus the fraction of true closures kept;
* **trajectory quality**: Umeyama-aligned ATE (:mod:`icp_tpu.eval`) of each
  robust solve against the outlier-free ORACLE solve — the solution a
  perfect closure filter would have produced — alongside the corrupted L2
  solve that shows the damage being defended against.

Net-new vs the reference (`/root/reference` has no trajectory back-end at
all; its closest analogue is the per-pair ``max_cost`` filter idea in
``register_loop_closures``, which this protocol's plausible-cost outliers
are specifically constructed to defeat).  Two injection structures, in
increasing difficulty:

* ``'random'``: each false closure connects an independently random node
  pair and claims the relative pose of some OTHER random pair — plausible
  magnitude, mutually inconsistent.  Defeated by any per-edge redescending
  kernel.
* ``'clustered'``: false closures arrive in mutually CONSISTENT groups —
  ``cluster_size`` edges ``(i0+k, j0+k)`` all agreeing with one common
  wrong world hypothesis ``X_j = D · X_j`` (a random rigid offset ``D``) —
  the perceptual-aliasing case (two identical corridors), where the
  outliers corroborate each other and naive consensus fails.

Injection is host-side NumPy (a benchmark harness, not a hot path);
everything it produces feeds the jitted batched solver unchanged.  All
sampling is seeded — a given ``(graph, rate, mode, seed)`` reproduces the
same corrupted graph bit-for-bit.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import pose_graph
from .geometry import RigidTransform

__all__ = [
    "closure_mask",
    "inject_outliers",
    "classify_closures",
    "run_protocol",
]


def closure_mask(graph, min_separation: int = 2):
    """Bool ``(E,)`` mask of loop-like edges: id span >= ``min_separation``
    or backward (the ``cmd_graph`` convention for g2o files, where edge
    ordering is not guaranteed to put odometry first)."""
    import jax.numpy as jnp

    ij = np.asarray(graph.edges_ij)
    span = ij[:, 1] - ij[:, 0]
    return jnp.asarray((span < 0) | (np.abs(span) >= min_separation))


def _random_rotations(rng, n: int, dim: int) -> np.ndarray:
    if dim == 2:
        th = rng.uniform(-np.pi, np.pi, n)
        c, s = np.cos(th), np.sin(th)
        return np.stack(
            [np.stack([c, -s], -1), np.stack([s, c], -1)], axis=-2
        )
    # Uniform-ish 3D rotations: QR of Gaussian matrices with det fix.
    rots = []
    for _ in range(n):
        q, r = np.linalg.qr(rng.normal(size=(3, 3)))
        q = q * np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, -1] = -q[:, -1]
        rots.append(q)
    return np.stack(rots) if rots else np.zeros((0, 3, 3))


def inject_outliers(
    graph,
    rate: float,
    mode: str = "random",
    seed: int = 0,
    min_separation: int = 20,
    cluster_size: int = 8,
    robust_edges=None,
):
    """Append false loop closures to ``graph``; returns
    ``(corrupted_graph, is_outlier (E+n,) bool, robust_edges (E+n,) bool)``.

    ``rate`` is the fraction of the CORRUPTED graph's closures that are
    wrong: ``n_injected = round(rate / (1 - rate) * n_true)``, so
    ``rate=0.3`` means 30% of all closures the solver sees are false.
    ``robust_edges`` identifies the existing closures (default:
    :func:`closure_mask`); injected edges copy the weight / information
    block of a randomly chosen existing closure — a false closure in the
    wild claims the same confidence a true one does, which is exactly what
    makes it dangerous.

    ``mode='random'``: independent node pairs (id span >=
    ``min_separation``), each measuring the relative pose of a DIFFERENT
    random pair (drawn from the graph's own initial poses, so magnitudes
    are in-distribution).  ``mode='clustered'``: ``cluster_size``-edge
    groups ``(i0+k, j0+k)`` whose measurements all satisfy one common
    wrong rigid offset ``Z_k = X_{i0+k}^{-1} · D · X_{j0+k}`` — mutually
    consistent, the perceptual-aliasing regime.
    """
    import jax.numpy as jnp

    if not 0.0 <= rate < 1.0:
        raise ValueError(f"rate must be in [0, 1), got {rate}")
    if mode not in ("random", "clustered"):
        raise ValueError(f"unknown mode {mode!r}; 'random' or 'clustered'")
    if robust_edges is None:
        robust_edges = closure_mask(graph)
    rob = np.asarray(robust_edges)
    n_edges = graph.num_edges
    n_true = int(rob.sum())
    n_nodes = graph.num_nodes
    dim = graph.dim
    n_inj = int(round(rate / (1.0 - rate) * n_true))
    is_outlier = np.zeros(n_edges, dtype=bool)
    if n_inj == 0:
        return graph, jnp.asarray(is_outlier), jnp.asarray(rob)

    rng = np.random.default_rng(seed)
    rot_np = np.asarray(graph.poses.rotation, dtype=np.float64)
    trans_np = np.asarray(graph.poses.translation, dtype=np.float64)

    def rel(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Relative pose of node(s) b in node(s) a's frame (batched)."""
        r = np.einsum("...ji,...jk->...ik", rot_np[a], rot_np[b])
        t = np.einsum("...ji,...j->...i", rot_np[a], trans_np[b] - trans_np[a])
        return r, t

    def sample_pair(n: int) -> np.ndarray:
        pairs = np.zeros((n, 2), dtype=np.int64)
        for k in range(n):
            while True:
                i = int(rng.integers(0, n_nodes))
                j = int(rng.integers(0, n_nodes))
                if j - i >= min_separation:
                    pairs[k] = (i, j)
                    break
        return pairs

    if mode == "random":
        ij = sample_pair(n_inj)
        # Gross random measurements (the Vertigo convention): uniform
        # rotation, translation uniform over the trajectory's bounding box.
        # NOT the relative pose of another node pair: on grid-structured
        # trajectories (Manhattan worlds) those alias heavily — many pairs
        # share near-identical relative poses, so the "outlier" is
        # near-consistent with the truth and mathematically un-rejectable
        # (measured on the two-lap square: ~1 in 3 such draws escaped every
        # kernel at every budget while barely moving the ATE).
        lo = trans_np.min(axis=0)
        hi = trans_np.max(axis=0)
        m_rot = _random_rotations(rng, n_inj, dim)
        m_trans = rng.uniform(lo, hi, (n_inj, dim))
    else:
        ij_list, rot_list, trans_list = [], [], []
        extent = float(np.ptp(trans_np, axis=0).max()) or 1.0
        while len(ij_list) < n_inj:
            c = min(cluster_size, n_inj - len(ij_list))
            while True:
                i0 = int(rng.integers(0, n_nodes - c))
                j0 = int(rng.integers(0, n_nodes - c))
                if j0 - i0 >= min_separation + c:
                    break
            # Common wrong hypothesis D: a rigid world offset the whole
            # cluster corroborates.
            d_rot = _random_rotations(rng, 1, dim)[0]
            d_trans = rng.uniform(-0.3, 0.3, dim) * extent
            for k in range(c):
                i, j = i0 + k, j0 + k
                # Z = X_i^-1 · D · X_j  (consistent with X_j -> D X_j).
                dr = d_rot @ rot_np[j]
                dt = d_rot @ trans_np[j] + d_trans
                r = rot_np[i].T @ dr
                t = rot_np[i].T @ (dt - trans_np[i])
                ij_list.append((i, j))
                rot_list.append(r)
                trans_list.append(t)
        ij = np.asarray(ij_list)
        m_rot = np.stack(rot_list)
        m_trans = np.stack(trans_list)

    # Injected edges claim the confidence of real closures: copy weight +
    # information block from randomly chosen existing closure edges.
    donor = np.flatnonzero(rob)[rng.integers(0, n_true, n_inj)]
    w_np = np.asarray(graph.weights)
    new_w = w_np[donor]
    sqrt_info = graph.sqrt_information
    if sqrt_info is not None:
        si_np = np.asarray(sqrt_info)
        sqrt_info = jnp.concatenate([sqrt_info, jnp.asarray(si_np[donor])], axis=0)

    dtype = np.asarray(graph.poses.translation).dtype
    corrupted = dataclasses.replace(
        graph,
        edges_ij=jnp.concatenate(
            [graph.edges_ij, jnp.asarray(ij, dtype=jnp.int32)], axis=0
        ),
        measurements=RigidTransform(
            jnp.concatenate(
                [graph.measurements.rotation, jnp.asarray(m_rot, dtype=dtype)], axis=0
            ),
            jnp.concatenate(
                [graph.measurements.translation, jnp.asarray(m_trans, dtype=dtype)],
                axis=0,
            ),
        ),
        weights=jnp.concatenate([graph.weights, jnp.asarray(new_w, dtype=dtype)]),
        sqrt_information=sqrt_info,
    )
    is_outlier = np.concatenate([is_outlier, np.ones(n_inj, dtype=bool)])
    rob_new = np.concatenate([rob, np.ones(n_inj, dtype=bool)])
    return corrupted, jnp.asarray(is_outlier), jnp.asarray(rob_new)


def classify_closures(
    weights, is_outlier, robust_edges, reject_below: float = 0.5
) -> dict:
    """Precision/recall of outlier REJECTION from converged IRLS weights.

    An edge is classified rejected when its weight falls below
    ``reject_below``.  Precision = rejected edges that are truly outliers /
    all rejected; recall = truly-outlier edges rejected / all outliers;
    ``inliers_kept`` = true closures NOT rejected / all true closures.
    Degenerate denominators report 1.0 (nothing to reject -> vacuously
    perfect), so clean-graph rows read correctly.
    """
    w = np.asarray(weights)
    out = np.asarray(is_outlier)
    rob = np.asarray(robust_edges)
    rejected = (w < reject_below) & rob
    tp = int(np.sum(rejected & out))
    n_rej = int(np.sum(rejected))
    n_out = int(np.sum(out))
    true_closures = rob & ~out
    kept = int(np.sum(true_closures & ~rejected))
    n_true = int(np.sum(true_closures))
    return {
        "precision": tp / n_rej if n_rej else 1.0,
        "recall": tp / n_out if n_out else 1.0,
        "inliers_kept": kept / n_true if n_true else 1.0,
        "n_rejected": n_rej,
        "n_outliers": n_out,
        "n_true_closures": n_true,
    }


def run_protocol(
    graph,
    rates=(0.1, 0.2, 0.3),
    modes=("random", "clustered"),
    kernels=("none", "huber", "cauchy", "welsch", "gnc_gm"),
    iterations: int = 30,
    solver: str = "auto",
    cg_iterations: int = 50,
    seed: int = 0,
    min_separation: int = 20,
    cluster_size: int = 8,
    robust_edges=None,
    reject_below: float = 0.5,
    scale_passes: int = 2,
    gnc_head: float = 0.0,
) -> list[dict]:
    """Run the full injection matrix on ``graph``; returns one record per
    ``(mode, rate, kernel)``.

    Each record carries the classification metrics of
    :func:`classify_closures` plus ``ate_vs_oracle`` — the Umeyama-aligned
    ATE RMSE of the solve's trajectory against the outlier-free L2 oracle
    solve (``kernel='none'`` rows show the corruption a non-robust back-end
    absorbs) — and the scale the solve actually used.  Robust rows go
    through :func:`pose_graph.robust_solve` (auto scale + ``scale_passes``
    bounded re-estimations; pass ``scale_passes=1`` for the single-pass
    comparison rows).  ``gnc_head=0.0`` (anneal from step 1) is the
    multi-outlier-correct GNC schedule — see ``optimize``; the
    single-bad-closure regimes keep the 0.25 default there.
    """
    from . import eval as tpu_eval

    if robust_edges is None:
        robust_edges = closure_mask(graph)
    oracle, _ = pose_graph.optimize(
        graph, iterations=iterations, solver=solver, cg_iterations=cg_iterations
    )
    oracle_t = np.asarray(oracle.poses.translation)
    records: list[dict] = []
    for mode in modes:
        for rate in rates:
            bad, is_out, rob = inject_outliers(
                graph,
                rate,
                mode=mode,
                seed=seed,
                min_separation=min_separation,
                cluster_size=cluster_size,
                robust_edges=robust_edges,
            )
            for kernel in kernels:
                if kernel == "none":
                    opt, costs = pose_graph.optimize(
                        bad,
                        iterations=iterations,
                        solver=solver,
                        cg_iterations=cg_iterations,
                    )
                    scale, w = 0.0, None
                else:
                    opt, costs, scale, w = pose_graph.robust_solve(
                        bad,
                        kernel=kernel,
                        robust_edges=rob,
                        iterations=iterations,
                        solver=solver,
                        cg_iterations=cg_iterations,
                        scale_passes=scale_passes,
                        gnc_head=gnc_head,
                    )
                rec = {
                    "mode": mode,
                    "rate": rate,
                    "kernel": kernel,
                    "scale_passes": scale_passes if kernel != "none" else 0,
                    "n_injected": int(np.asarray(is_out).sum()),
                    "scale": float(scale),
                    "ate_vs_oracle": tpu_eval.ate(
                        opt.poses.translation, oracle_t
                    ).rmse,
                    "chi2_final": float(costs[-1]),
                }
                if w is not None:
                    rec.update(
                        classify_closures(w, is_out, rob, reject_below=reject_below)
                    )
                records.append(rec)
    return records
