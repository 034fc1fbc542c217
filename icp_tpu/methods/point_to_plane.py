"""Point-to-plane ICP (net-new method family — not in the reference).

Minimizes the distance of transformed source points to the tangent plane of
their nearest target point (Chen & Medioni 1992, the standard ICP variant
for smooth surfaces; see also "Fast and Robust Iterative Closest Point",
PAPERS.md).  Converges in far fewer iterations than point-to-point on
surface-like data because sliding along a surface costs nothing.

TPU-native formulation — everything batched, no dynamic shapes:

* Target normals are estimated ONCE in ``init`` by local PCA: exact k-NN via
  the same fused distance kernel (``lax.top_k`` on negated distances, k
  static from config), neighborhood covariance as one einsum, smallest
  eigenvector by the batched closed-form/Jacobi eigensolver already used for
  the rigid solve.
* Each iteration solves the linearized normal equations
  ``min_x sum_i w_i (J_i . x + r_i)^2`` with ``J_i = [n_i ; a_i x n_i]``
  (2D: ``[n_i ; cross2(a_i, n_i)]``), a ``(dof x dof)`` batched solve on the
  MXU, and retracts with the exact SE(D) exponential (``icp_tpu.lie``) so
  the estimate stays exactly rigid.

Config: ``normal_neighbors`` (int, default 10), ``max_distance`` (float,
optional gate like ``trimmed_3d``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry, lie
from ..cloud import PointCloud
from ..config import Config
from ..geometry import HIGHEST, RigidTransform
from ..ops.nn import nearest_neighbors, pairwise_sq_dists
from ..ops.rigid_fit import _jacobi_eigh_sym
from .base import Method

Array = jax.Array

DEFAULT_NORMAL_NEIGHBORS = 10


def neighborhood_moments(points: Array, mask: Array, k: int, selector: str = "auto"):
    """Masked k-NN neighborhoods: returns ``(cov (..., M, D, D), count)``.

    ``k`` is clamped to the cloud capacity; padded/masked slots never
    contaminate the moments (their contributions carry weight 0), so clouds
    with fewer valid points than ``k`` stay well-defined.

    Two implementations, same selected neighbor sets (ties toward the lower
    index in both; equality-tested in ``tests/test_methods_extended.py``):

    * ``"select"`` — the TPU fast path: the 0/1 neighborhood matrix comes
      from the radix k-smallest selection (:mod:`icp_tpu.ops.select`,
      O(32 N) per row) and the centered covariance is a weighted broadcast
      contraction XLA maps to batched matmuls — no ``lax.top_k`` sorting
      networks, no dynamic gathers (both measured slow on TPU; this init
      dominated gicp's round-1 throughput, BASELINE.md "Net-new method
      throughput").
    * ``"topk"`` — the round-1 ``lax.top_k`` + gather path, kept as the
      oracle for tests.
    """
    k = min(k, points.shape[-2])
    d2 = pairwise_sq_dists(points, points)
    big = jnp.asarray(jnp.finfo(points.dtype).max, dtype=points.dtype)
    d2 = jnp.where(mask[..., None, :], d2, big)
    if selector == "auto":
        selector = "select"
    if selector == "select":
        from ..ops.select import select_smallest_weights

        keep = jnp.full(d2.shape[:-1], k, dtype=jnp.int32)
        w = select_smallest_weights(d2, keep, points.dtype)  # (..., M, N) 0/1
        w = w * mask[..., None, :].astype(points.dtype)
        sw = jnp.maximum(w.sum(axis=-1), 1.0)
        center = (
            jnp.einsum("...mn,...nd->...md", w, points, precision=HIGHEST)
            / sw[..., None]
        )
        diff = points[..., None, :, :] - center[..., :, None, :]  # (..., M, N, D)
        cov = jnp.einsum(
            "...mni,...mnj,...mn->...mij", diff, diff, w, precision=HIGHEST
        )
        return cov, sw
    if selector != "topk":
        raise ValueError(f"unknown selector {selector!r}")
    # k nearest including self (self has distance 0).
    _, idx = jax.lax.top_k(-d2, k)  # (..., M, k)
    neigh = jnp.take_along_axis(
        jnp.broadcast_to(points[..., None, :, :], (*d2.shape, points.shape[-1])),
        idx[..., None],
        axis=-2,
    )  # (..., M, k, D)
    w = jnp.take_along_axis(
        jnp.broadcast_to(mask[..., None, :], d2.shape), idx, axis=-1
    ).astype(points.dtype)  # (..., M, k)
    sw = jnp.maximum(w.sum(axis=-1), 1.0)
    center = jnp.einsum("...kd,...k->...d", neigh, w, precision=HIGHEST) / sw[..., None]
    centered = neigh - center[..., None, :]
    cov = jnp.einsum("...ki,...kj,...k->...ij", centered, centered, w, precision=HIGHEST)
    return cov, sw


def estimate_normals(points: Array, mask: Array, k: int) -> Array:
    """Unit normals per point via masked k-NN PCA ``(..., M, D) -> (..., M, D)``.

    The normal is the smallest-eigenvalue eigenvector of the neighborhood
    covariance.  Masked points get arbitrary (unit) normals — they are never
    selected as correspondences.  Sign is unoriented (point-to-plane cost is
    sign-invariant).
    """
    cov, _ = neighborhood_moments(points, mask, k)
    eigvals, eigvecs = _jacobi_eigh_sym(cov)
    smallest = jnp.argmin(eigvals, axis=-1)
    normal = jnp.take_along_axis(
        eigvecs, smallest[..., None, None].repeat(points.shape[-1], axis=-2), axis=-1
    )[..., 0]
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return normal / jnp.maximum(norm, jnp.finfo(points.dtype).tiny)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointToPlaneState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    normals: Array  # (..., M, D) target normals, fixed after init
    match_idx: Array  # (..., N) int32
    match_cost: Array  # (..., N) squared plane distance


def solve_normal_equations(jac, r, w):
    """Damped LS solve of ``min sum_i w_i (jac_i . x + r_i)^2`` -> twist.

    Shared by the point-to-plane and symmetric methods; tiny Tikhonov keeps
    degenerate rows (e.g. all-collinear normals) solvable.
    """
    jtj = jnp.einsum("...ni,...nj,...n->...ij", jac, jac, w, precision=HIGHEST)
    jtr = jnp.einsum("...ni,...n,...n->...i", jac, r, w, precision=HIGHEST)
    dof = jac.shape[-1]
    eye = jnp.eye(dof, dtype=jac.dtype)
    damped = jtj + 1e-9 * jnp.trace(jtj, axis1=-2, axis2=-1)[..., None, None] * eye + 1e-20 * eye
    return -jnp.linalg.solve(damped, jtr[..., None])[..., 0]


def _solve_increment(a_cur, matched_b, matched_n, w, dim):
    """Linearized point-to-plane step: returns the SE(D) twist ``(dof,)``."""
    r = jnp.einsum("...nd,...nd->...n", a_cur - matched_b, matched_n, precision=HIGHEST)
    if dim == 2:
        # J_i = [n_x, n_y, a_x n_y - a_y n_x]
        cross = (
            a_cur[..., 0] * matched_n[..., 1] - a_cur[..., 1] * matched_n[..., 0]
        )
        jac = jnp.concatenate([matched_n, cross[..., None]], axis=-1)  # (..., N, 3)
    else:
        cross = jnp.cross(a_cur, matched_n)
        jac = jnp.concatenate([matched_n, cross], axis=-1)  # (..., N, 6)
    return solve_normal_equations(jac, r, w)


def create(config: Config) -> Method:
    k = int(config.get("normal_neighbors", DEFAULT_NORMAL_NEIGHBORS))
    max_distance = config.get("max_distance", None)  # None = no gate;
    # an explicit 0.0 is respected (rejects everything), unlike a falsy-collapse
    dim = int(config.get("dim", 3))

    def precompute(cloud: PointCloud) -> Array:
        """Per-cloud unit normals (only the target's are consumed)."""
        return estimate_normals(cloud.points, cloud.mask, k)

    def _init_with(source, target, guess, normals) -> PointToPlaneState:
        a_cur = geometry.apply(guess, source.points)
        idx, cost = _matches(a_cur, target, normals, source.mask)
        return PointToPlaneState(guess, source, target, normals, idx, cost)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> PointToPlaneState:
        return _init_with(source, target, guess, precompute(target))

    def _matches(a_cur, target, normals, src_mask):
        sq, idx = nearest_neighbors(a_cur, target.points, target.mask)
        matched_b = jnp.take_along_axis(target.points, idx[..., None], axis=-2)
        matched_n = jnp.take_along_axis(normals, idx[..., None], axis=-2)
        plane = (
            jnp.einsum("...nd,...nd->...n", a_cur - matched_b, matched_n, precision=HIGHEST)
            ** 2
        )
        plane = jnp.where(src_mask, plane, jnp.inf)
        return idx, plane

    def iterate(state: PointToPlaneState) -> PointToPlaneState:
        src, tgt = state.source, state.target
        a_cur = geometry.apply(state.transform, src.points)
        sq, idx = nearest_neighbors(a_cur, tgt.points, tgt.mask)
        w = src.mask.astype(src.dtype)
        if max_distance is not None:
            w = w * (jnp.sqrt(sq) <= max_distance).astype(src.dtype)
        matched_b = jnp.take_along_axis(tgt.points, idx[..., None], axis=-2)
        matched_n = jnp.take_along_axis(state.normals, idx[..., None], axis=-2)
        xi = _solve_increment(a_cur, matched_b, matched_n, w, src.dim)
        step = lie.exp(xi, src.dim)
        new_transform = geometry.compose(step, state.transform)
        # Post-step residual under the same correspondences (a pre-step cost
        # would be bit-identical to init's on iteration 1 and spuriously
        # trip delta-cost termination criteria).
        a_new = geometry.apply(new_transform, src.points)
        plane = (
            jnp.einsum("...nd,...nd->...n", a_new - matched_b, matched_n, precision=HIGHEST)
            ** 2
        )
        plane = jnp.where(src.mask, plane, jnp.inf)
        return dataclasses.replace(
            state,
            transform=new_transform,
            match_idx=idx,
            match_cost=plane,
        )

    def cost(state: PointToPlaneState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    def with_precomputed(normals_a, normals_b) -> Method:
        # Only the target's normals participate in the objective.
        return Method(
            name="point_to_plane",
            dim=dim,
            init=lambda s, t, g: _init_with(s, t, g, normals_b),
            iterate=iterate,
            cost=cost,
            precompute=precompute,
        )

    return Method(
        name="point_to_plane",
        dim=dim,
        init=init,
        iterate=iterate,
        cost=cost,
        precompute=precompute,
        with_precomputed=with_precomputed,
        # Only the target's normals participate in the objective; skip
        # estimating the source's on aux-caching hot paths (ADVICE round-3).
        precompute_source=False,
    )
