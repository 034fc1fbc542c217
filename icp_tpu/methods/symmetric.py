"""Symmetric-objective ICP (Rusinkiewicz 2019; net-new method family).

Minimizes the symmetrized point-to-plane residual

    sum_i w_i ( (R a_i + t - b_{j(i)}) . (R n^a_i + n^b_{j(i)}) )^2

where ``n^a`` are SOURCE normals carried through the current rotation and
``n^b`` target normals.  The symmetric objective's zero set is exact for
locally quadratic surfaces (not just planes), giving a wider convergence
funnel than one-sided point-to-plane.

The Gauss-Newton linearization here is the FULL analytic Jacobian of the
residual including the normal-rotation term: with ``p = R a`` (rotated
point, translation excluded), ``m = R n^a``, ``n = m + n^b`` and
``d = R a + t - b``,

    dr/dt     = n
    dr/domega = p x n + m x d     (2D: the scalar cross products)

— the ``m x d`` term is what distinguishes the symmetric solve from plain
point-to-plane with an averaged normal.  Normals are estimated once in
``init`` by masked k-NN PCA for BOTH clouds; the step retracts exactly
through :mod:`icp_tpu.lie`; the stored cost is the post-step residual with
post-step-rotated source normals (the objective at the returned transform).

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
from ..geometry import HIGHEST, RigidTransform
from ..ops.nn import nearest_neighbors
from .base import Method
from .point_to_plane import (
    DEFAULT_NORMAL_NEIGHBORS,
    estimate_normals,
    solve_normal_equations,
)

Array = jax.Array


def _cross(u: Array, v: Array, dim: int) -> Array:
    """2D scalar cross (``(..., N)``) or 3D vector cross (``(..., N, 3)``)."""
    if dim == 2:
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]
    return jnp.cross(u, v)


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

    def _summed_normals(rot, normals_a, matched_nb):
        """``(m, n)``: rotated source normals and sign-aligned sums.

        The PCA normals are unoriented; flip ``m`` to agree with ``n_b``
        per pair before summing, else antiparallel pairs cancel.
        """
        m = jnp.einsum("...ij,...nj->...ni", rot, normals_a, precision=HIGHEST)
        sign = jnp.sign(jnp.einsum("...nd,...nd->...n", m, matched_nb, precision=HIGHEST))
        sign = jnp.where(sign == 0, 1.0, sign)
        m = m * sign[..., None]
        return m, m + matched_nb

    def _plane_cost(transform, src, matched_b, matched_nb, normals_a):
        a_pts = geometry.apply(transform, src.points)
        _, n_sum = _summed_normals(transform.rotation, normals_a, matched_nb)
        r = jnp.einsum("...nd,...nd->...n", a_pts - matched_b, n_sum, precision=HIGHEST)
        return jnp.where(src.mask, r * r, jnp.inf)

    def _gather(state, idx):
        matched_b = jnp.take_along_axis(state.target.points, idx[..., None], axis=-2)
        matched_nb = jnp.take_along_axis(state.normals_b, idx[..., None], axis=-2)
        return matched_b, matched_nb

    def precompute(cloud: PointCloud) -> Array:
        """Per-cloud unit normals (both clouds' participate here)."""
        return estimate_normals(cloud.points, cloud.mask, k)

    def _init_with(source, target, guess, normals_a, normals_b) -> SymmetricState:
        a_cur = geometry.apply(guess, source.points)
        _, idx = nearest_neighbors(a_cur, target.points, target.mask)
        matched_b = jnp.take_along_axis(target.points, idx[..., None], axis=-2)
        matched_nb = jnp.take_along_axis(normals_b, idx[..., None], axis=-2)
        cost = _plane_cost(guess, source, matched_b, matched_nb, normals_a)
        return SymmetricState(guess, source, target, normals_a, normals_b, idx, cost)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> SymmetricState:
        return _init_with(
            source, target, guess, precompute(source), precompute(target)
        )

    def iterate(state: SymmetricState) -> SymmetricState:
        src, tgt = state.source, state.target
        rot, trans = state.transform.rotation, state.transform.translation
        a_cur = geometry.apply(state.transform, src.points)
        sq, idx = nearest_neighbors(a_cur, tgt.points, tgt.mask)
        w = src.mask.astype(src.dtype)
        if max_distance is not None:
            w = w * (jnp.sqrt(sq) <= max_distance).astype(src.dtype)

        matched_b, matched_nb = _gather(state, idx)
        m, n_sum = _summed_normals(rot, state.normals_a, matched_nb)
        d = a_cur - matched_b
        p = a_cur - trans[..., None, :]  # R a (rotation-only part)

        r = jnp.einsum("...nd,...nd->...n", d, n_sum, precision=HIGHEST)
        # Full symmetric Jacobian rows: [ n ; p x n + m x d ].
        rot_rows = _cross(p, n_sum, src.dim) + _cross(m, d, src.dim)
        if src.dim == 2:
            jac = jnp.concatenate([n_sum, rot_rows[..., None]], axis=-1)
        else:
            jac = jnp.concatenate([n_sum, rot_rows], axis=-1)
        xi = solve_normal_equations(jac, r, w)
        step = lie.exp(xi, src.dim)
        new_transform = geometry.compose(step, state.transform)

        # Post-step residual with post-step-rotated normals, under the same
        # correspondences — the true objective at the returned transform
        # (and distinct from init's value, so delta-cost criteria work).
        cost = _plane_cost(new_transform, src, matched_b, matched_nb, state.normals_a)
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

    def with_precomputed(normals_a, normals_b) -> Method:
        return Method(
            name="symmetric",
            dim=dim,
            init=lambda s, t, g: _init_with(s, t, g, normals_a, normals_b),
            iterate=iterate,
            cost=cost,
            precompute=precompute,
        )

    return Method(
        name="symmetric",
        dim=dim,
        init=init,
        iterate=iterate,
        cost=cost,
        precompute=precompute,
        with_precomputed=with_precomputed,
    )
