"""Method interface and string-keyed registry.

TPU-native counterpart of the ``ICP<Dim>`` abstract class and its static
method registry (``include/icp/icp.h:49-173``, ``lib/icp/icp.cpp:16-27``).
Instead of virtual ``setup()``/``iterate()`` mutating protected state, a
method is a bundle of **pure functions** over an immutable state pytree:

* ``init(source, target, guess) -> state``   — ``ICP::begin`` + ``setup()``
  (``icp.h:120-133``)
* ``iterate(state) -> state``                — ``ICP::iterate`` (``icp.h:141``)
* ``cost(state) -> scalar``                  — ``ICP::calculate_cost``
  (``icp.h:149-155``); per-method quirks preserved (see method modules).

States support arbitrary leading batch dimensions, so one compiled program
registers one pair or thousands.  Config parameters are resolved at method
construction (trace time) and baked into the jitted step.

The registry mirrors ``from_method`` / ``is_method_registered`` /
``registered_methods`` (``icp.h:95-114``): 2D registers ``vanilla``,
``trimmed``, ``feature_aware``; 3D registers ``vanilla``, ``trimmed``
(``icp.cpp:16-27``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax

from ..cloud import PointCloud
from ..config import Config
from ..geometry import RigidTransform

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Method:
    """A registered ICP method: pure init/iterate/cost over a state pytree.

    ``precompute``/``with_precomputed`` (optional) expose per-cloud derived
    data that ``init`` would otherwise recompute — surfel covariances
    (gicp), normals (point_to_plane/symmetric).  ``precompute(cloud)``
    returns the aux pytree for a (batched) cloud;
    ``with_precomputed(aux_source, aux_target)`` returns a Method whose
    ``init`` consumes it instead of re-estimating.  Sequential pipelines
    (odometry: scan t is the target of pair t-1 AND the source of pair t)
    precompute once per scan instead of twice — see
    :func:`icp_tpu.odometry.chain_scans`.  No reference counterpart (the
    reference registers exactly one pair per run)."""

    name: str
    dim: int
    init: Callable[[PointCloud, PointCloud, RigidTransform], Any]
    iterate: Callable[[Any], Any]
    cost: Callable[[Any], Array]
    precompute: Callable[[PointCloud], Any] | None = None
    with_precomputed: Callable[[Any, Any], "Method"] | None = None
    # Whether with_precomputed actually CONSUMES the source's aux.  Methods
    # whose objective only derives data from the target (point_to_plane:
    # target normals; ndt p2d: target Gaussian maps) declare False, and
    # aux-caching pipelines skip precompute(source) on their hot path —
    # e.g. scan-to-map odometry was building (and discarding) 2^D
    # voxel-Gaussian maps of EVERY scan (ADVICE round-3).  Such methods
    # accept with_precomputed(None, aux_target).
    precompute_source: bool = True


@dataclasses.dataclass(frozen=True)
class Matches:
    """Per-source-point correspondences — ``ICP::get_matches``'s
    ``Match{point, pair, cost}`` (``icp.h:61-70,157-169``) in SoA form.

    ``valid`` marks real source points; padded slots carry arbitrary
    indices and +inf/zero costs and must be ignored."""

    source_idx: Any  # (..., N) int32 — the implicit identity ``point`` index
    target_idx: Any  # (..., N) int32 — ``pair``
    cost: Any  # (..., N)
    valid: Any  # (..., N) bool


def get_matches(state) -> Matches | None:
    """Extract the current match set from a method state.

    Returns ``None`` for states that do not track matches — the 3D family,
    whose base-class ``matches`` the reference never fills (the
    ``vanilla_3d.cpp`` quirk); parity preserved.
    """
    idx = getattr(state, "match_idx", None)
    cost = getattr(state, "match_cost", None)
    if idx is None or cost is None:
        return None
    import jax.numpy as jnp

    n = idx.shape[-1]
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), idx.shape)
    return Matches(source_idx=src, target_idx=idx, cost=cost, valid=state.source.mask)


MethodFactory = Callable[[Config], Method]

_REGISTRY: dict[tuple[str, int], MethodFactory] = {}


def register_method(name: str, dim: int, factory: MethodFactory) -> None:
    """Register a method constructor under ``(name, dim)``.

    The extension contract mirrors the reference's how-to guide
    (``book/writing_icp.md:43-76``): implement init/iterate, then register.
    """
    _REGISTRY[(name, dim)] = factory


def from_method(name: str, dim: int, config: Config | None = None) -> Method:
    """Construct a method by name, as ``ICP<Dim>::from_method`` (``icp.h:95-102``).

    Raises ``KeyError`` listing registered methods if unknown (the reference
    returns an empty optional and the CLI prints the list,
    ``vis/main.cpp:133-139``).
    """
    key = (name, dim)
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown {dim}D method {name!r}; registered: {registered_methods(dim)}"
        )
    return _REGISTRY[key](config if config is not None else Config())


def is_method_registered(name: str, dim: int) -> bool:
    return (name, dim) in _REGISTRY


def registered_methods(dim: int) -> list[str]:
    return sorted(n for (n, d) in _REGISTRY if d == dim)
