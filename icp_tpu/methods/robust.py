"""Robust Welsch-weighted ICP (net-new method family — not in the reference).

Iteratively-reweighted point-to-point ICP with the Welsch influence function
(the robust kernel of "Fast and Robust Iterative Closest Point",
Zhang et al. 2021; PAPERS.md): each iteration's rigid solve weights pair i by

    w_i = exp( -d_i^2 / (2 sigma^2) )

so outliers and non-overlap regions decay smoothly instead of the hard
rank cut of ``trimmed``.  The kernel width anneals toward a floor:
``sigma = max(sigma_min, nu * sqrt(median(d^2)))`` — a scale estimate that
is itself robust.  The annealing median is a masked quantile over the
current distances (one on-device sort — no host round-trip).

Everything else (correspondence, weighted Kabsch, composition, batching)
reuses the same fused ops as the reference-parity methods; this method is
pure configuration of the weighted solve, which is the point of the
weights-first design (``icp_tpu/ops/rigid_fit.py``).

Config: ``nu`` (float, default 3.0, kernel width in robust-sigma units),
``sigma_min`` (float, default 1e-3), ``dim`` (2 or 3).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import geometry
from ..cloud import PointCloud
from ..config import Config
from ..geometry import RigidTransform
from ..ops.nn import nearest_neighbors
from ..ops.rigid_fit import fit_rigid_indexed
from .base import Method

Array = jax.Array

DEFAULT_NU = 3.0
DEFAULT_SIGMA_MIN = 1e-3


def masked_median(values: Array, mask: Array) -> Array:
    """Median of the masked entries (per batch element).

    Masked slots are pushed to +inf; the median index is derived from the
    valid count so padding never contaminates the estimate.  Selection is
    the radix k-th-smallest (``ops/select.py``) — bit-identical to
    ``sort(v)[count // 2]`` but O(32 N) branch-free VPU work instead of a
    sorting network, and this runs every iteration of every robust-family
    converge (measured as part of the radix-trim work, BASELINE.md
    "Radix-select trim").
    """
    from ..ops.select import kth_smallest_value

    big = jnp.asarray(jnp.inf, dtype=values.dtype)
    v = jnp.where(mask, values, big)
    count = jnp.sum(mask, axis=-1)
    return kth_smallest_value(v, jnp.maximum(count // 2, 0) + 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobustState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    match_idx: Array  # (..., N) int32
    match_cost: Array  # (..., N) squared NN distance
    sigma: Array  # (...,) current kernel width


def create(config: Config) -> Method:
    nu = float(config.get("nu", DEFAULT_NU))
    sigma_min = float(config.get("sigma_min", DEFAULT_SIGMA_MIN))
    dim = int(config.get("dim", 2))

    def _matches(a_cur, target, src_mask):
        sq, idx = nearest_neighbors(a_cur, target.points, target.mask)
        sq = jnp.where(src_mask, sq, jnp.inf)
        return idx, sq

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> RobustState:
        a_cur = geometry.apply(guess, source.points)
        idx, sq = _matches(a_cur, target, source.mask)
        sigma = jnp.maximum(
            nu * jnp.sqrt(masked_median(sq, source.mask)), sigma_min
        )
        return RobustState(guess, source, target, idx, sq, sigma)

    def iterate(state: RobustState) -> RobustState:
        src, tgt = state.source, state.target
        a_cur = geometry.apply(state.transform, src.points)
        idx, sq = _matches(a_cur, tgt, src.mask)
        sigma = jnp.maximum(nu * jnp.sqrt(masked_median(sq, src.mask)), sigma_min)
        sq_safe = jnp.where(src.mask, sq, 0.0)
        w = jnp.exp(-sq_safe / (2.0 * sigma[..., None] ** 2))
        w = w * src.mask.astype(src.dtype)
        step = fit_rigid_indexed(a_cur, tgt.points, idx, w)
        return dataclasses.replace(
            state,
            transform=geometry.compose(step, state.transform),
            match_idx=idx,
            match_cost=sq,
            sigma=sigma,
        )

    def cost(state: RobustState) -> Array:
        finite = jnp.where(state.source.mask, state.match_cost, 0.0)
        n = jnp.maximum(state.source.count.astype(finite.dtype), 1.0)
        return jnp.sqrt(jnp.sum(finite, axis=-1) / n)

    return Method(name="robust", dim=dim, init=init, iterate=iterate, cost=cost)
