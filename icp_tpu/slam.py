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
    gn_iterations: int = 10,
    gn_solver: str = "dense",
) -> SlamResult:
    """Odometry + (optional) loop closure + pose-graph refinement.

    ``scans`` is the batched ``(T, N, D)`` scan stack.  With
    ``loop_radius=None`` only the odometry chain runs (poses ==
    trajectory.poses).  Returns optimized poses in the scan-0 frame.
    """
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
    graph, costs = pose_graph.optimize(
        graph, iterations=gn_iterations, solver=gn_solver
    )
    return SlamResult(
        poses=graph.poses,
        trajectory=traj,
        loop_edges=loop_edges,
        graph_costs=costs,
    )
