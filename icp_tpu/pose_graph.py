"""Pose-graph optimization back-end (Gauss-Newton over SE(2)/SE(3)).

Net-new vs the reference (no trajectory/back-end at all).  Given keyframe
poses and relative-pose constraints (odometry chains + loop closures from
re-registering keyframe pairs), minimize

    sum_e  w_e * || log( Z_e^{-1} · X_i^{-1} · X_j ) ||^2

over the poses, with pose 0 gauge-fixed.  TPU-native formulation:

* residuals for ALL edges evaluate in one batched pass (gathers + batched
  matmuls + the branch-free tangent maps of :mod:`icp_tpu.lie`);
* Jacobians come from ``jax.jacfwd`` of the tangent perturbation
  ``X_k <- X_k · exp(delta_k)`` — no hand-derived adjoints to get wrong;
* the normal system solves either **dense** (small graphs — one
  ``jnp.linalg.solve`` on the MXU) or **matrix-free CG** where the
  ``J^T J v`` operator is a jvp/vjp sandwich — no materialized Hessian, and
  every matvec is a batched edge computation that shards over the mesh's
  ``data`` axis (edges) exactly like a batch of registrations;
* the GN iteration loop is a ``lax.scan`` with a fixed iteration budget
  (compile-once, no host round-trips).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import geometry, lie
from .geometry import RigidTransform

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Nodes ``poses`` (batched transform, T nodes) + relative-pose edges.

    ``edges_ij (E, 2)`` int32 node indices; ``measurements`` the measured
    ``Z_e`` = frame-i-relative pose of frame j; ``weights (E,)`` scalar
    information weights.
    """

    poses: RigidTransform  # (T, D, D) / (T, D)
    edges_ij: Array  # (E, 2) int32
    measurements: RigidTransform  # (E, D, D) / (E, D)
    weights: Array  # (E,)

    @property
    def num_nodes(self) -> int:
        return self.poses.translation.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edges_ij.shape[0]

    @property
    def dim(self) -> int:
        return self.poses.dim


def edge_residuals(graph: PoseGraph, poses: RigidTransform) -> Array:
    """Weighted tangent residuals ``(E, dof)`` for all edges at once."""
    i = graph.edges_ij[:, 0]
    j = graph.edges_ij[:, 1]
    xi = RigidTransform(poses.rotation[i], poses.translation[i])
    xj = RigidTransform(poses.rotation[j], poses.translation[j])
    rel = geometry.compose(geometry.inverse(xi), xj)
    err = geometry.compose(geometry.inverse(graph.measurements), rel)
    r = lie.log(err)
    return r * jnp.sqrt(graph.weights)[..., None]


def _retract(poses: RigidTransform, delta: Array, dim: int) -> RigidTransform:
    """Right-perturb every pose: ``X_k <- X_k · exp(delta_k)``."""
    step = lie.exp(delta, dim)
    return geometry.compose(poses, step)


def _residual_of_delta(graph: PoseGraph, delta_flat: Array) -> Array:
    dim = graph.dim
    d = lie.dof(dim)
    delta = delta_flat.reshape(graph.num_nodes, d)
    # Gauge fix: node 0 stays put.
    delta = delta.at[0].set(0.0)
    return edge_residuals(graph, _retract(graph.poses, delta, dim)).reshape(-1)


def optimize(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "dense",
    cg_iterations: int = 50,
) -> tuple[PoseGraph, Array]:
    """Run Gauss-Newton; returns (optimized graph, per-iteration cost).

    ``solver='dense'`` builds J explicitly (fine to a few thousand DOF);
    ``'cg'`` is matrix-free conjugate gradient on the normal equations.
    """
    dim = graph.dim
    d = lie.dof(dim)
    n_var = graph.num_nodes * d

    def gn_step(poses, _):
        g = dataclasses.replace(graph, poses=poses)

        def res(delta_flat):
            return _residual_of_delta(g, delta_flat)

        zero = jnp.zeros((n_var,), dtype=poses.dtype)
        r0 = res(zero)
        cost = jnp.sum(r0 * r0)

        if solver == "dense":
            jac = jax.jacfwd(res)(zero)  # (E*dof, n_var)
            jtj = jac.T @ jac
            jtr = jac.T @ r0
            jtj = jtj + damping * jnp.eye(n_var, dtype=poses.dtype)
            delta = -jnp.linalg.solve(jtj, jtr)
        elif solver == "cg":
            _, vjp = jax.vjp(res, zero)

            def jtjv(v):
                jv = jax.jvp(res, (zero,), (v,))[1]
                return vjp(jv)[0] + damping * v

            jtr = vjp(r0)[0]
            delta, _ = jax.scipy.sparse.linalg.cg(
                jtjv, -jtr, maxiter=cg_iterations
            )
        else:
            raise ValueError(f"unknown solver {solver!r}")

        delta = delta.reshape(graph.num_nodes, d).at[0].set(0.0)
        new_poses = _retract(poses, delta, dim)
        return new_poses, cost

    poses, costs = jax.lax.scan(gn_step, graph.poses, None, length=iterations)
    # costs[k] is evaluated BEFORE step k; append the post-final-step cost so
    # costs has length iterations+1 and costs[-1] reflects the returned poses.
    final = edge_residuals(dataclasses.replace(graph, poses=poses), poses)
    costs = jnp.concatenate([costs, jnp.sum(final * final)[None]])
    return dataclasses.replace(graph, poses=poses), costs


def find_loop_candidates(
    poses: RigidTransform,
    radius: float,
    min_separation: int = 10,
    max_candidates: int | None = None,
) -> Array:
    """Candidate loop-closure pairs ``(K, 2)``: trajectory indices whose
    poses are within ``radius`` but at least ``min_separation`` steps apart.

    Host-side (feeds graph construction, not compiled compute).  Pairs are
    ordered by ascending distance; ``max_candidates`` truncates.
    """
    import numpy as np

    t = np.asarray(poses.translation)
    n = len(t)
    d = np.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    sep = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    ii, jj = np.nonzero((d < radius) & (sep >= min_separation))
    keep = ii < jj  # one direction per pair
    ii, jj = ii[keep], jj[keep]
    order = np.argsort(d[ii, jj], kind="stable")
    ii, jj = ii[order], jj[order]
    if max_candidates is not None:
        ii, jj = ii[:max_candidates], jj[:max_candidates]
    return jnp.asarray(np.stack([ii, jj], axis=-1), dtype=jnp.int32)


def register_loop_closures(
    clouds,
    poses: RigidTransform,
    candidates: Array,
    method,
    driver_config,
    max_cost: float | None = None,
    coarse: bool = False,
):
    """Register every candidate pair (batched) and return accepted
    ``(edges (K', 2), measurements, costs)``.

    ``clouds`` is the batched keyframe cloud stack ``(T, N, D)`` aligned with
    ``poses``.  The relative pose seed is derived from the current poses
    (``X_i^{-1} X_j``); with ``coarse=True`` the global initializer
    (``ops/coarse.py``) seeds instead — the right choice when accumulated
    drift is large enough that the pose-derived seed leaves ICP's basin
    (a wrongly-converged closure silently confirms the drift).
    ``max_cost`` drops closures whose converged cost exceeds it (bad
    closures corrupt graphs — standard practice).
    """
    import numpy as np

    from . import cloud as cloud_mod
    from .driver import converge

    cand = np.asarray(candidates).reshape(-1, 2)
    if cand.size == 0:
        dim = poses.dim
        empty_tf = RigidTransform(
            jnp.zeros((0, dim, dim), dtype=poses.dtype),
            jnp.zeros((0, dim), dtype=poses.dtype),
        )
        return (
            jnp.zeros((0, 2), dtype=jnp.int32),
            empty_tf,
            jnp.zeros((0,), dtype=poses.dtype),
        )
    i, j = cand[:, 0], cand[:, 1]
    src = cloud_mod.PointCloud(clouds.points[j], clouds.count[j])
    tgt = cloud_mod.PointCloud(clouds.points[i], clouds.count[i])
    # Seed: the transform taking frame-j points into frame i under current
    # estimates is X_i^{-1} X_j.
    if coarse:
        from .ops.coarse import coarse_align_2d, coarse_align_3d

        seed = (coarse_align_2d if poses.dim == 2 else coarse_align_3d)(src, tgt)
    else:
        xi = RigidTransform(poses.rotation[i], poses.translation[i])
        xj = RigidTransform(poses.rotation[j], poses.translation[j])
        seed = geometry.compose(geometry.inverse(xi), xj)

    result, _ = converge(method, src, tgt, seed, driver_config)
    # Measurement convention of :class:`PoseGraph`: Z_e = frame-i pose of
    # frame j. Registering j->i yields exactly that transform.
    meas = result.transform
    if max_cost is not None:
        good = np.asarray(result.cost) <= max_cost
        cand = cand[good]
        meas = RigidTransform(meas.rotation[good], meas.translation[good])
        return jnp.asarray(cand, dtype=jnp.int32), meas, result.cost[good]
    return candidates, meas, result.cost


def graph_from_trajectory(
    poses: RigidTransform,
    odometry_measurements: RigidTransform,
    loop_edges: Array | None = None,
    loop_measurements: RigidTransform | None = None,
    odometry_weight: float = 1.0,
    loop_weight: float = 1.0,
) -> PoseGraph:
    """Assemble a graph: consecutive odometry edges + optional loop closures.

    ``odometry_measurements`` are frame-t-relative poses of frame t+1
    (length T-1); loop edges/measurements likewise frame-i-relative of j.
    """
    t = poses.translation.shape[0]
    dtype = poses.dtype
    ij = jnp.stack(
        [jnp.arange(t - 1, dtype=jnp.int32), jnp.arange(1, t, dtype=jnp.int32)],
        axis=-1,
    )
    meas = odometry_measurements
    weights = jnp.full((t - 1,), odometry_weight, dtype=dtype)
    if loop_edges is not None and loop_edges.shape[0] > 0:
        ij = jnp.concatenate([ij, loop_edges.astype(jnp.int32)], axis=0)
        meas = RigidTransform(
            jnp.concatenate([meas.rotation, loop_measurements.rotation], axis=0),
            jnp.concatenate([meas.translation, loop_measurements.translation], axis=0),
        )
        weights = jnp.concatenate(
            [weights, jnp.full((loop_edges.shape[0],), loop_weight, dtype=dtype)]
        )
    return PoseGraph(poses=poses, edges_ij=ij, measurements=meas, weights=weights)
