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
        cfg = config
        if coarse_max_iterations is not None and (
            config.max_iterations is None
            or coarse_max_iterations < config.max_iterations
        ):
            coarse_min = config.min_iterations
            if coarse_min is not None:
                coarse_min = min(coarse_min, coarse_max_iterations)
            cfg = dataclasses.replace(
                config,
                max_iterations=coarse_max_iterations,
                min_iterations=coarse_min,
            )
        result, _ = converge(method, decimate(source, f), decimate(target, f), current, cfg)
        current = result.transform
    return converge(method, source, target, current, config)
