"""3D ``trimmed`` ICP (distance-gated, not overlap-rate based).

TPU-native re-design of ``lib/icp/impl/trimmed_3d.cpp``.  Identical to the
3D vanilla method except pairs are **gated by distance**: only matches with
``neighbor.distance <= max_distance`` feed the rigid solve
(``trimmed_3d.cpp:97-102``).  Because the neighbor distance is
``sqrt(Euclidean)`` (see ``vanilla_3d`` module doc), the gate effectively
compares ``d^(1/2) <= max_distance`` i.e. Euclidean ``d <= max_distance^2``
— reproduced exactly.

Config: ``max_distance`` (double, default 1.0, ``trimmed_3d.cpp:27``).
(The reference's no-config constructor leaves ``max_distance``
uninitialized — UB we do not reproduce.)

The gate becomes a 0/1 weight vector into the weighted Kabsch solve; an
empty gate (reference: 3x0 matrices into Eigen SVD, NaN centroids) instead
yields an identity step here — a documented, conscious deviation for a
well-defined edge case.

Driver-visible cost is 0.0 exactly as in ``vanilla_3d`` (shared quirk).
"""

from __future__ import annotations

import dataclasses

import jax

from .. import geometry
from ..config import Config
from ..ops.rigid_fit import fit_rigid_indexed
from .base import Method
from .vanilla_3d import (
    Vanilla3dState,
    _mean_distance,
    _neighbor_distances,
    make_parity_cost,
    working_copy_init,
)

Array = jax.Array

DEFAULT_MAX_DISTANCE = 1.0  # ``trimmed_3d.cpp:27``


def create(config: Config) -> Method:
    max_distance = config.get("max_distance", DEFAULT_MAX_DISTANCE)
    parity = bool(config.get("parity", 1))
    solver = config.get("solver", "auto")

    init = working_copy_init  # shared 3D-family init (guess-seeded working copy)

    def iterate(state: Vanilla3dState) -> Vanilla3dState:
        src, tgt = state.source, state.target
        dist, idx = _neighbor_distances(state.c, tgt)
        gate = (dist <= max_distance) & src.mask
        weights = gate.astype(src.dtype)
        step = fit_rigid_indexed(state.c, tgt.points, idx, weights, solver=solver)
        c_new = geometry.apply(step, state.c)
        return dataclasses.replace(
            state,
            transform=geometry.compose(step, state.transform),
            c=c_new,
            # cost uses ALL neighbor distances, not just gated ones
            # (``trimmed_3d.cpp:115`` passes the full vector).
            mean_nn_dist=_mean_distance(dist, src.mask, src.count),
        )

    return Method(
        name="trimmed", dim=3, init=init, iterate=iterate, cost=make_parity_cost(parity)
    )
