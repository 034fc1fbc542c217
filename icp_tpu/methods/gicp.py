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
``line_search`` (int/bool, default 1: per-lane safeguarded step selection —
the full, half, and ZERO Gauss-Newton steps are scored by the gated
Mahalanobis cost under the current correspondences and the best is taken,
batched; a lane whose linearization overshoots holds its pose), ``dim``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry, lie
from ..cloud import PointCloud
from ..config import Config
from ..geometry import HIGHEST, RigidTransform
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
    dim = points.shape[-1]
    new_vals = jnp.ones_like(eigvals)
    smallest = jnp.argmin(eigvals, axis=-1)
    new_vals = jnp.where(
        jax.nn.one_hot(smallest, dim, dtype=bool), jnp.asarray(eps, eigvals.dtype), new_vals
    )
    return jnp.einsum("...ik,...k,...jk->...ij", eigvecs, new_vals, eigvecs, precision=HIGHEST)


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

    def _residual_weights(a_cur, rot, cov_a, matched_b, matched_cb):
        """``(resid, w_mat)`` for the combined covariance C_b + R C_a R^T.

        Single source of truth for the objective: the GN solve, the
        line-search scoring, and the stored cost all flow through here so
        they can never optimize/score different quantities.
        """
        rca = jnp.einsum("...ij,...njk,...lk->...nil", rot, cov_a, rot, precision=HIGHEST)
        w_mat = _inv_spd(matched_cb + rca)
        return a_cur - matched_b, w_mat

    def _gather_matches(points_b, cov_b, idx):
        matched_b = jnp.take_along_axis(points_b, idx[..., None], axis=-2)
        matched_cb = jnp.take_along_axis(cov_b, idx[..., None, None], axis=-3)
        return matched_b, matched_cb

    def precompute(cloud: PointCloud) -> Array:
        """Per-cloud surfel covariances — the init-dominating estimation,
        exposed for reuse across sequential registrations (odometry)."""
        return surfel_covariances(cloud.points, cloud.mask, k, eps)

    def _init_with(source, target, guess, cov_a, cov_b) -> GicpState:
        a_cur = geometry.apply(guess, source.points)
        sq, idx = nearest_neighbors(a_cur, target.points, target.mask)
        matched_b, matched_cb = _gather_matches(target.points, cov_b, idx)
        # Same (gated) Mahalanobis units as iterate so the driver's
        # delta-cost criteria compare like with like from iteration 1.
        resid, w_mat = _residual_weights(a_cur, guess.rotation, cov_a, matched_b, matched_cb)
        mahal = jnp.einsum("...ni,...nij,...nj->...n", resid, w_mat, resid, precision=HIGHEST)
        gate = source.mask.astype(source.dtype)
        if max_distance is not None:
            gate = gate * (jnp.sqrt(sq) <= max_distance).astype(source.dtype)
        cost = jnp.where(source.mask, mahal * gate, jnp.inf)
        return GicpState(guess, source, target, cov_a, cov_b, idx, cost)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> GicpState:
        return _init_with(
            source, target, guess, precompute(source), precompute(target)
        )

    def iterate(state: GicpState) -> GicpState:
        src, tgt = state.source, state.target
        rot = state.transform.rotation
        a_cur = geometry.apply(state.transform, src.points)
        sq, idx = nearest_neighbors(a_cur, tgt.points, tgt.mask)

        w_valid = src.mask.astype(src.dtype)
        if max_distance is not None:
            w_valid = w_valid * (jnp.sqrt(sq) <= max_distance).astype(src.dtype)

        # Transform-independent gathers, hoisted: the GN solve and every
        # line-search scoring reuse them.
        matched_b, matched_cb = _gather_matches(tgt.points, state.cov_b, idx)

        resid, w_mat = _residual_weights(a_cur, rot, state.cov_a, matched_b, matched_cb)
        jac = _jacobian_rows(a_cur, src.dim)  # (..., N, D, dof)

        wj = jnp.einsum("...nij,...njk->...nik", w_mat, jac, precision=HIGHEST)  # (..., N, D, dof)
        jtj = jnp.einsum("...nik,...nil,...n->...kl", jac, wj, w_valid, precision=HIGHEST)
        jtr = jnp.einsum(
            "...nik,...nij,...nj,...n->...k", jac, w_mat, resid, w_valid, precision=HIGHEST
        )
        dof = jac.shape[-1]
        eye = jnp.eye(dof, dtype=a_cur.dtype)
        damped = (
            jtj
            + 1e-9 * jnp.trace(jtj, axis1=-2, axis2=-1)[..., None, None] * eye
            + 1e-20 * eye
        )
        xi = -jnp.linalg.solve(damped, jtr[..., None])[..., 0]

        n_gated = jnp.maximum(jnp.sum(w_valid, axis=-1), 1.0)

        def post_cost(transform):
            """(per-point gated mahal, gated mean) at ``transform`` under
            the current correspondences — the SAME gated objective the GN
            step was fit to (ungated residuals of non-overlap points must
            not decide step selection or drive the driver's tolerances)."""
            a_new = geometry.apply(transform, src.points)
            r, w = _residual_weights(
                a_new, transform.rotation, state.cov_a, matched_b, matched_cb
            )
            mahal = jnp.einsum("...ni,...nij,...nj->...n", r, w, r, precision=HIGHEST) * w_valid
            return mahal, jnp.sum(mahal, axis=-1) / n_gated

        t_full = geometry.compose(lie.exp(xi, src.dim), state.transform)
        if line_search:
            # Per-lane safeguarded step selection among {full, half, zero}:
            # the zero-step (current transform) candidate means a lane whose
            # GN linearization overshoots in BOTH trial steps holds its pose
            # (transform tolerance can then terminate it) instead of
            # committing a cost increase.
            t_half = geometry.compose(lie.exp(0.5 * xi, src.dim), state.transform)
            cands = [t_full, t_half, state.transform]
            scored = [post_cost(t) for t in cands]
            means = jnp.stack([m for _, m in scored], axis=-1)  # (..., 3)
            best = jnp.argmin(means, axis=-1)  # ties -> full > half > zero

            def sel(values):
                stacked = jnp.stack(values, axis=-1)  # (..., 3) trailing
                b = best.reshape(best.shape + (1,) * (stacked.ndim - best.ndim - 1) + (1,))
                return jnp.take_along_axis(stacked, b, axis=-1)[..., 0]

            new_transform = geometry.RigidTransform(
                sel([t.rotation for t in cands]),
                sel([t.translation for t in cands]),
            )
            mahal = sel([m for m, _ in scored])
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

    def with_precomputed(cov_a: Array, cov_b: Array) -> Method:
        return Method(
            name="gicp",
            dim=dim,
            init=lambda s, t, g: _init_with(s, t, g, cov_a, cov_b),
            iterate=iterate,
            cost=cost,
            precompute=precompute,
        )

    return Method(
        name="gicp",
        dim=dim,
        init=init,
        iterate=iterate,
        cost=cost,
        precompute=precompute,
        with_precomputed=with_precomputed,
    )
