"""Coarse-to-fine (multiscale) registration.

A standard ICP accelerator absent from the reference: run the convergence
loop on decimated clouds first (an iteration on N/f points costs ~1/f² of a
full-resolution iteration for the dominant N×M correspondence), then refine
at full resolution seeded by the coarse result.  The final level runs the
caller's exact driver config, so the accuracy contract (termination
tolerances) is unchanged; only the path to the basin is cheaper and wider.

Caveat: multiscale is an ACCELERATOR, not a robustness feature — on sparse
or highly structured geometry the decimated cost landscape can have a
different nearest local minimum, and the full-resolution refinement then
converges in that basin instead of the from-identity one.  Use it where the
problem is well-conditioned (dense scans, good initial guesses, the bench
workload); for hard initializations use :mod:`icp_tpu.ops.coarse` instead.

Decimation is stride subsampling of the front-packed cloud — a static-shape
slice (``points[::f]``), with the valid count adjusted to ``ceil(count/f)``;
no data-dependent shapes anywhere, so each pyramid level is one compiled
program reused across calls.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .cloud import PointCloud
from .driver import ConvergenceState, DriverConfig, converge
from .geometry import RigidTransform
from .methods.base import Method


def decimate(cloud: PointCloud, factor: int) -> PointCloud:
    """Stride-``factor`` subsample of a front-packed cloud (static shape)."""
    if factor == 1:
        return cloud
    points = cloud.points[..., ::factor, :]
    count = (cloud.count + factor - 1) // factor  # ceil: kept indices < count
    return PointCloud(points, count.astype(jnp.int32))


def converge_multiscale(
    method: Method,
    source: PointCloud,
    target: PointCloud,
    guess: RigidTransform,
    config: DriverConfig,
    factors: tuple[int, ...] = (4,),
    coarse_max_iterations: int | None = None,
) -> tuple[ConvergenceState, object]:
    """Pyramid converge: coarse levels (largest factor first) seed the next.

    ``factors`` are the coarse decimation factors (e.g. ``(8, 2)``); the
    full-resolution level always runs last with the caller's ``config``.
    Coarse levels reuse the same config except ``max_iterations`` may be
    capped by ``coarse_max_iterations``.  Returns the final level's
    ``(ConvergenceState, method state)`` — iteration counts and costs refer
    to the full-resolution refinement only.
    """
    current = guess
    for f in sorted(set(int(x) for x in factors), reverse=True):
        if f <= 1:
            continue
        cfg = _capped(config, coarse_max_iterations)
        result, _ = converge(method, decimate(source, f), decimate(target, f), current, cfg)
        current = result.transform
    return converge(method, source, target, current, config)


def _capped(config: DriverConfig, coarse_max_iterations: int | None) -> DriverConfig:
    """Driver config for a coarse level: iteration budget capped."""
    if coarse_max_iterations is None or (
        config.max_iterations is not None
        and coarse_max_iterations >= config.max_iterations
    ):
        return config
    coarse_min = config.min_iterations
    if coarse_min is not None:
        coarse_min = min(coarse_min, coarse_max_iterations)
    return dataclasses.replace(
        config,
        max_iterations=coarse_max_iterations,
        min_iterations=coarse_min,
    )


def converge_ndt_multiscale(
    source: PointCloud,
    target: PointCloud,
    guess: RigidTransform,
    config: DriverConfig,
    dim: int = 2,
    ndt_config=None,
    scales: tuple[float, ...] = (4.0,),
    coarse_max_iterations: int | None = 10,
    decimate_factor: int | None = None,
    coarse_init: bool = False,
) -> tuple[ConvergenceState, object]:
    """Coarse-to-fine NDT: a CELL-SIZE schedule, the standard NDT practice
    (Magnusson 2009 §6.5 uses exactly this) the point-decimation pyramid
    above cannot express — NDT's resolution knob is the voxel size, not
    the point count.

    Registration runs first at ``scale x cell_size`` for each entry of
    ``scales`` (largest first, iteration budget capped by
    ``coarse_max_iterations``), each level seeding the next, and finally
    at the caller's exact NDT config and driver tolerances — so, as with
    :func:`converge_multiscale`, the accuracy contract is unchanged and
    only the path to the basin is cheaper and wider:

    * a coarse grid's Gaussians are broad, so the score surface is smooth
      and a few GN steps cover most of the initial error (large cells =
      the convergence-basin knob, Magnusson's own argument);
    * the expensive FINE level then starts inside its quadratic region and
      spends ~2 iterations instead of ~9 (measured on the scan1 bench
      cell, BASELINE.md round-4 NDT row).

    Coarse levels also stride-decimate both clouds by ``decimate_factor``
    (default: ``round(scale)``) — with cells ``scale``x larger, the
    decimated points still land ~the same number per cell, so the
    Gaussians are statistically equivalent while the lookup contraction
    shrinks by the same factor.  Map slot capacity (``cells``) is kept
    from the caller's config at every level: occupied-cell count only
    DROPS at coarser resolution, so the static capacity stays safe
    (``overflowed`` semantics unchanged).

    ``ndt_config`` is the fine-level NDT :class:`~icp_tpu.config.Config`
    (``cell_size``, ``cells``, ``lookup``, ``variant`` — every key is
    honored at every level; only ``cell_size`` is scaled).  Returns the
    fine level's ``(ConvergenceState, method state)``.

    ``coarse_init=True`` replaces ``guess`` with the global coarse
    initializer (:mod:`icp_tpu.ops.coarse` — centroid shift + rotation
    search), the same rescue the streaming front-end uses for anomalous
    scans.  NDT's score surface is only as wide as its coarsest Gaussians,
    so a schedule alone cannot recover arbitrarily bad starts — measured
    on the bench's hard scan1 fleet (±0.15 rad / ±0.6 m, B=256): the
    8x→2x→1x schedule converges 188/256 lanes from the raw perturbed
    guesses and **256/256** from the coarse initializer (CPU; chip row
    ``scan1_ndt_multiscale_coarse_*`` in ``bench_results.json``).  Use it
    whenever no trustworthy guess exists (global localization, map-merge
    seeding); keep the caller's guess when tracking (odometry seeds are
    already inside the basin and cost no initializer pass).
    """
    from .config import Config
    from .methods import from_method

    cfg = ndt_config if ndt_config is not None else Config()
    cell_size = float(cfg.get("cell_size", 1.0))
    current = guess
    if coarse_init:
        from .ops.coarse import coarse_align_2d, coarse_align_3d

        current = (coarse_align_2d if dim == 2 else coarse_align_3d)(
            source, target
        )
    for s in sorted((float(x) for x in scales), reverse=True):
        if s <= 1.0:
            continue
        coarse_method = from_method(
            "ndt", dim, cfg.set("cell_size", cell_size * s).set("dim", dim)
        )
        f = int(round(s)) if decimate_factor is None else decimate_factor
        result, _ = converge(
            coarse_method,
            decimate(source, max(f, 1)),
            decimate(target, max(f, 1)),
            current,
            _capped(config, coarse_max_iterations),
        )
        current = result.transform
    fine_method = from_method("ndt", dim, cfg.set("dim", dim))
    return converge(fine_method, source, target, current, config)
