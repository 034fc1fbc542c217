"""One-call offline SLAM pipeline.

Packages the full back-end the CLI drives — coarse-seeded odometry →
loop-closure detection → closure registration → pose-graph optimization —
as a single library entry point, so programmatic users get the same
pipeline as ``icp-tpu odometry --coarse --loop-radius ...`` in one call.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from . import geometry, odometry, pose_graph
from .cloud import PointCloud
from .driver import DriverConfig
from .methods.base import Method
from .geometry import RigidTransform


@dataclasses.dataclass(frozen=True)
class SlamResult:
    poses: RigidTransform  # optimized world-from-scan poses (T, ...)
    trajectory: odometry.Trajectory  # raw odometry (pre-optimization)
    loop_edges: jnp.ndarray  # (K, 2) accepted closures
    graph_costs: jnp.ndarray  # per-GN-iteration costs (+ final)
    edge_weights: jnp.ndarray | None = None  # (E,) final IRLS weights (robust only)


def run_slam(
    scans: PointCloud,
    method: Method,
    config: DriverConfig,
    *,
    coarse: bool = False,
    multiscale: bool = False,
    loop_radius: float | None = None,
    loop_min_separation: int = 10,
    loop_max_candidates: int | None = 64,
    loop_max_cost: float | None = None,
    loop_coarse: bool = False,
    loop_weight: float = 10.0,
    gn_iterations: int | None = None,
    gn_solver: str = "dense",
    robust: str = "none",
    robust_scale: float | str = "auto",
) -> SlamResult:
    """Odometry + (optional) loop closure + pose-graph refinement.

    ``scans`` is the batched ``(T, N, D)`` scan stack.  With
    ``loop_radius=None`` only the odometry chain runs (poses ==
    trajectory.poses).  Returns optimized poses in the scan-0 frame.

    ``robust`` / ``robust_scale`` select a per-edge robust kernel for the
    graph solve (see :func:`icp_tpu.pose_graph.optimize`): ``max_cost`` only
    rejects closures whose ICP *cost* is high, but a closure can converge to
    a plausible cost in the wrong basin — the robust kernel (``'gnc_gm'``
    recommended) down-weights such edges by their graph inconsistency
    instead of trusting them.  The final per-edge weights are reported in
    ``SlamResult.edge_weights``.  ``gn_iterations`` defaults to 10 for the
    plain solve and 30 for robust kernels (the GNC anneal + post-rejection
    relaxation need the budget; see optimize's docstring).
    """
    if gn_iterations is None:
        gn_iterations = 10 if robust == "none" else 30
    traj = odometry.chain_scans(
        scans, method, config, coarse=coarse, multiscale=multiscale
    )

    loop_edges = jnp.zeros((0, 2), dtype=jnp.int32)
    loop_meas = None
    if loop_radius is not None:
        cands = pose_graph.find_loop_candidates(
            traj.poses, radius=loop_radius,
            min_separation=loop_min_separation,
            max_candidates=loop_max_candidates,
        )
        loop_edges, loop_meas, _ = pose_graph.register_loop_closures(
            scans, traj.poses, cands, method, config,
            max_cost=loop_max_cost, coarse=loop_coarse,
        )

    if loop_edges.shape[0] == 0:
        # Odometry-only graphs are exactly satisfiable — optimization is a
        # numerical no-op; skip the O(T^2) dense solve entirely.
        return SlamResult(
            poses=traj.poses,
            trajectory=traj,
            loop_edges=loop_edges,
            graph_costs=jnp.zeros((0,)),
        )

    graph = pose_graph.graph_from_trajectory(
        traj.poses,
        geometry.inverse(traj.relative),
        loop_edges=loop_edges,
        loop_measurements=loop_meas,
        loop_weight=loop_weight,
    )
    # Robustify ONLY the loop-closure edges (the last K): odometry edges are
    # sequential scan matches — they can be noisy but not wrong associations
    # — and letting a redescending kernel cut them can disconnect the chain
    # (pose_graph.optimize docstring).
    robust_mask = None
    if robust != "none":
        n_odo = graph.num_edges - loop_edges.shape[0]
        robust_mask = jnp.arange(graph.num_edges) >= n_odo
        if isinstance(robust_scale, str):  # 'auto': resolve once, reuse below
            robust_scale = pose_graph.auto_robust_scale(
                graph, iterations=gn_iterations, solver=gn_solver,
                robust_edges=robust_mask,
            )
    graph, costs = pose_graph.optimize(
        graph, iterations=gn_iterations, solver=gn_solver,
        robust=robust, robust_scale=robust_scale, robust_edges=robust_mask,
    )
    weights = None
    if robust != "none":
        weights, _ = pose_graph.robust_edge_weights(
            graph, robust, robust_scale, robust_edges=robust_mask
        )
    return SlamResult(
        poses=graph.poses,
        trajectory=traj,
        loop_edges=loop_edges,
        graph_costs=costs,
        edge_weights=weights,
    )
