"""Symmetric-objective ICP (Rusinkiewicz 2019; net-new method family).

Minimizes the symmetrized point-to-plane residual

    sum_i w_i ( (R a_i + t - b_{j(i)}) . (n^a_i + n^b_{j(i)}) )^2

where ``n^a`` are SOURCE normals rotated by the current estimate and ``n^b``
target normals.  The symmetric objective's zero set is exact for locally
quadratic surfaces (not just planes), giving a wider convergence funnel and
faster convergence than one-sided point-to-plane — the strongest classical
point-cloud objective per the paper.

TPU formulation mirrors ``point_to_plane``: both clouds' normals via masked
k-NN PCA once in ``init``; each iteration solves the linearized normal
equations with ``J_i = [ n_i ; a_i x n_i ]`` for the summed normal
``n_i = R n^a_i + n^b_{j(i)}`` and retracts exactly through
:mod:`icp_tpu.lie`.

Config: ``normal_neighbors`` (int, default 10), ``max_distance`` (float,
optional gate), ``dim`` (2 or 3).
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
from .base import Method
from .point_to_plane import DEFAULT_NORMAL_NEIGHBORS, _solve_increment, estimate_normals

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SymmetricState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    normals_a: Array  # (..., N, D) source normals (source frame), fixed
    normals_b: Array  # (..., M, D) target normals, fixed
    match_idx: Array  # (..., N) int32
    match_cost: Array  # (..., N) squared symmetric-plane residual


def create(config: Config) -> Method:
    k = int(config.get("normal_neighbors", DEFAULT_NORMAL_NEIGHBORS))
    max_distance = config.get("max_distance", None)  # None = no gate
    dim = int(config.get("dim", 3))

    def _symmetric_parts(state, a_cur, idx):
        """(matched_b, summed normals n = R n_a + n_b) for current matches."""
        rot = state.transform.rotation
        matched_b = jnp.take_along_axis(state.target.points, idx[..., None], axis=-2)
        matched_nb = jnp.take_along_axis(state.normals_b, idx[..., None], axis=-2)
        na_rot = jnp.einsum("...ij,...nj->...ni", rot, state.normals_a)
        # The two normals are unoriented (sign-ambiguous PCA); flip n_a to
        # agree with n_b before summing, else antiparallel pairs cancel.
        sign = jnp.sign(jnp.einsum("...nd,...nd->...n", na_rot, matched_nb))
        sign = jnp.where(sign == 0, 1.0, sign)
        n_sum = na_rot * sign[..., None] + matched_nb
        return matched_b, n_sum

    def _plane_cost(a_pts, matched_b, n_sum, mask):
        r = jnp.einsum("...nd,...nd->...n", a_pts - matched_b, n_sum)
        return jnp.where(mask, r * r, jnp.inf)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> SymmetricState:
        normals_a = estimate_normals(source.points, source.mask, k)
        normals_b = estimate_normals(target.points, target.mask, k)
        a_cur = geometry.apply(guess, source.points)
        sq, idx = nearest_neighbors(a_cur, target.points, target.mask)
        state = SymmetricState(
            guess, source, target, normals_a, normals_b, idx,
            jnp.where(source.mask, sq, jnp.inf),
        )
        matched_b, n_sum = _symmetric_parts(state, a_cur, idx)
        cost = _plane_cost(a_cur, matched_b, n_sum, source.mask)
        return dataclasses.replace(state, match_cost=cost)

    def iterate(state: SymmetricState) -> SymmetricState:
        src, tgt = state.source, state.target
        a_cur = geometry.apply(state.transform, src.points)
        sq, idx = nearest_neighbors(a_cur, tgt.points, tgt.mask)
        w = src.mask.astype(src.dtype)
        if max_distance is not None:
            w = w * (jnp.sqrt(sq) <= max_distance).astype(src.dtype)

        matched_b, n_sum = _symmetric_parts(state, a_cur, idx)
        xi = _solve_increment(a_cur, matched_b, n_sum, w, src.dim)
        step = lie.exp(xi, src.dim)
        new_transform = geometry.compose(step, state.transform)

        # Post-step residual under the same correspondences (see the
        # point_to_plane note on delta-cost termination).
        a_new = geometry.apply(new_transform, src.points)
        cost = _plane_cost(a_new, matched_b, n_sum, src.mask)
        return dataclasses.replace(
            state,
            transform=new_transform,
            match_idx=idx,
            match_cost=cost,
        )

    def cost(state: SymmetricState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    return Method(name="symmetric", dim=dim, init=init, iterate=iterate, cost=cost)
