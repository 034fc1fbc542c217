"""2D ``vanilla`` point-to-point ICP.

TPU-native re-design of ``lib/icp/impl/vanilla.cpp``.  Semantics reproduced
exactly, including the reference's quirks:

* **Matches are computed from the *untransformed* source** — the reference's
  ``compute_matches`` queries the k-d tree with ``a.col(i)``, not
  ``a_current`` (``vanilla.cpp:80``), so the correspondence set is identical
  every iteration.  The reference nevertheless rebuilds the k-d tree and
  re-queries it per iteration (``vanilla.cpp:36,73-83``); we compute the
  matches **once** in ``init`` and reuse them — bit-identical results,
  strictly less work.
* **Match cost is ``sqrt(Euclidean distance)``** — the k-d tree's
  ``distance()`` returns Euclidean (not squared, despite its docstring;
  ``include/algo/kdtree.h:121-127``) and ``vanilla.cpp:84`` takes another
  ``sqrt``, so ``cost_i = d_i^(1/2) = (d_i^2)^(1/4)``.  Consequently the
  driver-visible ``calculate_cost`` never changes across iterations for this
  method.

Per-iteration math (``vanilla.cpp:28-66``): transform source by the current
estimate, center both sides on their (full-set) centroids, accumulate the
2x2 cross-covariance as a matmul, solve the optimal SO(2) rotation in closed
form (equivalent to the reference's det-fixed 2x2 SVD), set
``t = b̅ - R a̅``, and left-compose the step.
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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VanillaState:
    transform: RigidTransform
    source: PointCloud
    target: PointCloud
    match_idx: Array  # (..., N) int32 — fixed for the whole run (see module doc)
    match_cost: Array  # (..., N) — sqrt(Euclidean NN distance), fixed


def _compute_matches(source: PointCloud, target: PointCloud):
    sq, idx = nearest_neighbors(source.points, target.points, target.mask)
    euclid = jnp.sqrt(sq)
    cost = jnp.sqrt(euclid)  # the reference's double-sqrt chain
    cost = jnp.where(source.mask, cost, 0.0)
    return idx, cost


def create(config: Config) -> Method:
    del config  # vanilla takes no parameters (``vanilla.cpp:17``)

    def init(source: PointCloud, target: PointCloud, guess: RigidTransform) -> VanillaState:
        idx, cost = _compute_matches(source, target)
        return VanillaState(guess, source, target, idx, cost)

    def iterate(state: VanillaState) -> VanillaState:
        src, tgt = state.source, state.target
        a_current = geometry.apply(state.transform, src.points)
        weights = src.mask.astype(src.dtype)
        step = fit_rigid_indexed(a_current, tgt.points, state.match_idx, weights)
        return dataclasses.replace(
            state, transform=geometry.compose(step, state.transform)
        )

    def cost(state: VanillaState) -> Array:
        # calculate_cost = sqrt(mean(match costs)) over valid source points
        # (``icp.h:149-155``).
        n = jnp.maximum(state.source.count.astype(state.match_cost.dtype), 1.0)
        return jnp.sqrt(jnp.sum(state.match_cost, axis=-1) / n)

    return Method(name="vanilla", dim=2, init=init, iterate=iterate, cost=cost)
