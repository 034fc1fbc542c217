"""Generalized-ICP (plane-to-plane; net-new method family).

Segal, Haehnel & Thrun (RSS 2009): model every point with a local
covariance (disc-like, from neighborhood PCA) and minimize the Mahalanobis
distance under the COMBINED covariance of each correspondence:

    sum_i  d_i^T (C^b_i + R C^a_i R^T)^{-1} d_i,   d_i = R a_i + t - b_{j(i)}

Point-to-point and point-to-plane are the isotropic / degenerate special
cases.  GICP is the production-standard ICP variant for 3D LiDAR odometry.

TPU-native formulation:

* Per-point covariances for BOTH clouds once in ``init``: exact k-NN via
  ``lax.top_k`` over the fused distance matrix, neighborhood covariance as
  one einsum, eigen-decomposition by the batched fixed-sweep Jacobi solver,
  eigenvalues regularized to ``(eps, 1)`` along principal axes (the
  plane-to-plane regularization of the paper) — all (N, D, D) batched.
* Each iteration: NN correspondence; 2x2/3x3 combined-covariance inverses in
  closed form (adjugate — branch-free, batched); one Gauss-Newton step on
  the SE(D) twist with matrix-weighted normal equations (einsums on the
  MXU); exact manifold retraction via ``icp_tpu.lie``.

Config: ``neighbors`` (int, default 20), ``cov_epsilon`` (float, default
1e-3), ``max_distance`` (float, optional correspondence gate),
``line_search`` (int/bool, default 1: per-lane step-halving safeguard — the
full and half Gauss-Newton steps are scored by Mahalanobis cost under the
current correspondences and the better one is taken, batched), ``dim``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry, lie
from ..cloud import PointCloud
from ..config import Config
from ..geometry import RigidTransform
from ..ops.nn import nearest_neighbors
from ..ops.rigid_fit import _jacobi_eigh_sym
from .base import Method
from .point_to_plane import neighborhood_moments

Array = jax.Array

DEFAULT_NEIGHBORS = 20
DEFAULT_COV_EPSILON = 1e-3


def surfel_covariances(points: Array, mask: Array, k: int, eps: float) -> Array:
    """GICP-regularized covariances ``(..., N, D, D)``.

    Neighborhood covariance eigen-decomposed; eigenvalues replaced by
    ``(eps, 1, ..., 1)`` (smallest direction flattened to eps) — every point
    becomes a disc in its local tangent plane, per the GICP paper.
    """
    cov, sw = neighborhood_moments(points, mask, k)
    cov = cov / sw[..., None, None]
    eigvals, eigvecs = _jacobi_eigh_sym(cov)
    # Replace eigenvalues: smallest -> eps, others -> 1.
    order = jnp.argsort(eigvals, axis=-1)
    dim = points.shape[-1]
    new_vals = jnp.ones_like(eigvals)
    smallest = order[..., 0]
    new_vals = jnp.where(
        jax.nn.one_hot(smallest, dim, dtype=bool), jnp.asarray(eps, eigvals.dtype), new_vals
    )
    return jnp.einsum("...ik,...k,...jk->...ij", eigvecs, new_vals, eigvecs)


def _inv_spd(m: Array) -> Array:
    """Closed-form batched inverse of 2x2 / 3x3 SPD matrices (adjugate)."""
    dim = m.shape[-1]
    if dim == 2:
        a, b = m[..., 0, 0], m[..., 0, 1]
        c, d = m[..., 1, 0], m[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack(
            [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
        )
        return inv / det[..., None, None]
    # 3x3 adjugate
    cof = jnp.stack(
        [
            jnp.stack(
                [
                    m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1],
                    m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2],
                    m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2],
                    m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0],
                    m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0],
                    m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1],
                    m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    det = (
        m[..., 0, 0] * cof[..., 0, 0]
        + m[..., 0, 1] * cof[..., 1, 0]
        + m[..., 0, 2] * cof[..., 2, 0]
    )
    return cof / det[..., None, None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GicpState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    cov_a: Array  # (..., N, D, D) source surfel covariances (source frame)
    cov_b: Array  # (..., M, D, D) target surfel covariances
    match_idx: Array  # (..., N) int32
    match_cost: Array  # (..., N) Mahalanobis cost


def _jacobian_rows(a_cur: Array, dim: int) -> Array:
    """d(residual)/d(twist): ``(..., N, D, dof)`` with residual = Ra+t-b.

    d/dt = I; d/domega = -[a]_x (3D) / perpendicular (2D), evaluated at the
    current points (right-perturbation on the accumulated transform).
    """
    eye = jnp.broadcast_to(jnp.eye(dim, dtype=a_cur.dtype), (*a_cur.shape[:-1], dim, dim))
    if dim == 2:
        # rotation column: d(R(theta) a)/dtheta at 0 = (-a_y, a_x)
        rot_col = jnp.stack([-a_cur[..., 1], a_cur[..., 0]], axis=-1)[..., None]
        return jnp.concatenate([eye, rot_col], axis=-1)  # (..., N, 2, 3)
    # 3D: d(exp(w) a)/dw at 0 = -[a]_x
    ax, ay, az = a_cur[..., 0], a_cur[..., 1], a_cur[..., 2]
    z = jnp.zeros_like(ax)
    neg_hat = jnp.stack(
        [
            jnp.stack([z, az, -ay], axis=-1),
            jnp.stack([-az, z, ax], axis=-1),
            jnp.stack([ay, -ax, z], axis=-1),
        ],
        axis=-2,
    )
    return jnp.concatenate([eye, neg_hat], axis=-1)  # (..., N, 3, 6)


def create(config: Config) -> Method:
    k = int(config.get("neighbors", DEFAULT_NEIGHBORS))
    eps = float(config.get("cov_epsilon", DEFAULT_COV_EPSILON))
    max_distance = config.get("max_distance", None)  # None = no gate; 0.0 respected
    line_search = bool(config.get("line_search", 1))
    dim = int(config.get("dim", 3))

    def _mahalanobis(a_cur, rot, cov_a, cov_b, points_b, idx):
        matched_b = jnp.take_along_axis(points_b, idx[..., None], axis=-2)
        matched_cb = jnp.take_along_axis(cov_b, idx[..., None, None], axis=-3)
        rca = jnp.einsum("...ij,...njk,...lk->...nil", rot, cov_a, rot)
        w_mat = _inv_spd(matched_cb + rca)
        resid = a_cur - matched_b
        return jnp.einsum("...ni,...nij,...nj->...n", resid, w_mat, resid)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> GicpState:
        cov_a = surfel_covariances(source.points, source.mask, k, eps)
        cov_b = surfel_covariances(target.points, target.mask, k, eps)
        a_cur = geometry.apply(guess, source.points)
        sq, idx = nearest_neighbors(a_cur, target.points, target.mask)
        # Same Mahalanobis units as iterate so the driver's delta-cost
        # criteria compare like with like from the first iteration.
        mahal = _mahalanobis(a_cur, guess.rotation, cov_a, cov_b, target.points, idx)
        cost = jnp.where(source.mask, mahal, jnp.inf)
        return GicpState(guess, source, target, cov_a, cov_b, idx, cost)

    def iterate(state: GicpState) -> GicpState:
        src, tgt = state.source, state.target
        rot = state.transform.rotation
        a_cur = geometry.apply(state.transform, src.points)
        sq, idx = nearest_neighbors(a_cur, tgt.points, tgt.mask)

        w_valid = src.mask.astype(src.dtype)
        if max_distance is not None:
            w_valid = w_valid * (jnp.sqrt(sq) <= max_distance).astype(src.dtype)

        matched_b = jnp.take_along_axis(tgt.points, idx[..., None], axis=-2)
        matched_cb = jnp.take_along_axis(
            state.cov_b, idx[..., None, None], axis=-3
        )
        # Combined covariance: C_b + R C_a R^T, inverted in closed form.
        rca = jnp.einsum("...ij,...njk,...lk->...nil", rot, state.cov_a, rot)
        w_mat = _inv_spd(matched_cb + rca)  # (..., N, D, D)

        resid = a_cur - matched_b  # (..., N, D)
        jac = _jacobian_rows(a_cur, src.dim)  # (..., N, D, dof)

        wj = jnp.einsum("...nij,...njk->...nik", w_mat, jac)  # (..., N, D, dof)
        jtj = jnp.einsum("...nik,...nil,...n->...kl", jac, wj, w_valid)
        jtr = jnp.einsum("...nik,...nij,...nj,...n->...k", jac, w_mat, resid, w_valid)
        dof = jac.shape[-1]
        eye = jnp.eye(dof, dtype=a_cur.dtype)
        damped = (
            jtj
            + 1e-9 * jnp.trace(jtj, axis1=-2, axis2=-1)[..., None, None] * eye
            + 1e-20 * eye
        )
        xi = -jnp.linalg.solve(damped, jtr[..., None])[..., 0]

        def post_cost(transform):
            a_new = geometry.apply(transform, src.points)
            mahal = _mahalanobis(
                a_new, transform.rotation, state.cov_a, state.cov_b, tgt.points, idx
            )
            m = jnp.where(src.mask, mahal, 0.0)
            n = jnp.maximum(src.count.astype(m.dtype), 1.0)
            return mahal, jnp.sum(m, axis=-1) / n

        t_full = geometry.compose(lie.exp(xi, src.dim), state.transform)
        if line_search:
            # Per-lane step-halving safeguard: score the full and half GN
            # steps under the CURRENT correspondences (no extra NN pass)
            # and take the better; protects strongly anisotropic covariance
            # problems where the linearization overshoots.
            t_half = geometry.compose(lie.exp(0.5 * xi, src.dim), state.transform)
            mahal_f, mean_f = post_cost(t_full)
            mahal_h, mean_h = post_cost(t_half)
            take_full = mean_f <= mean_h  # (...,)

            def sel(full, half):
                cond = take_full.reshape(take_full.shape + (1,) * (full.ndim - take_full.ndim))
                return jnp.where(cond, full, half)

            new_transform = geometry.RigidTransform(
                sel(t_full.rotation, t_half.rotation),
                sel(t_full.translation, t_half.translation),
            )
            mahal = sel(mahal_f, mahal_h)
        else:
            new_transform = t_full
            # Stored cost is the POST-step residual under the same
            # correspondences: without this, iteration 1's cost would be
            # bit-identical to init's and delta-cost tolerances would
            # terminate after one Gauss-Newton step.
            mahal, _ = post_cost(new_transform)
        cost = jnp.where(src.mask, mahal, jnp.inf)
        return dataclasses.replace(
            state,
            transform=new_transform,
            match_idx=idx,
            match_cost=cost,
        )

    def cost(state: GicpState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    return Method(name="gicp", dim=dim, init=init, iterate=iterate, cost=cost)
