"""Coarse 2D alignment: global rotation search by histogram correlation.

ICP is a local optimizer — from an identity guess it reliably recovers
rotations up to ~15-20 degrees (observed: consecutive-scan turns of 30+
degrees diverge).  This op supplies the missing global initializer for 2D
scans: a rotation estimate from circular cross-correlation of
centroid-bearing histograms, plus centroid translation alignment.

TPU-shape: both histograms are fixed-size scatter-adds; the circular
cross-correlation over all bin shifts is one (B, B) matmul-like contraction
(or FFT); everything is static-shape, batched, and jittable.  The result
seeds the usual ``converge``.

This is net-new capability (the reference has no global alignment), kept as
an op rather than a method: ``guess = coarse_align_2d(a, b); converge(...,
guess, ...)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import geometry
from ..cloud import PointCloud
from ..geometry import RigidTransform

Array = jax.Array


def bearing_histogram(points: Array, mask: Array, bins: int) -> Array:
    """Histogram of point bearings about the masked centroid ``(..., bins)``.

    Soft-binned (linear interpolation between adjacent bins) so the
    correlation objective is smooth; rows are L1-normalized.
    """
    centroid = geometry.masked_centroid(points, mask)
    rel = points - centroid[..., None, :]
    theta = jnp.arctan2(rel[..., 1], rel[..., 0])  # (-pi, pi]
    pos = (theta + jnp.pi) / (2 * jnp.pi) * bins  # [0, bins)
    lo = jnp.floor(pos)
    frac = pos - lo
    lo_idx = jnp.mod(lo.astype(jnp.int32), bins)
    hi_idx = jnp.mod(lo_idx + 1, bins)
    w = mask.astype(points.dtype)

    oh_lo = jax.nn.one_hot(lo_idx, bins, dtype=points.dtype)
    oh_hi = jax.nn.one_hot(hi_idx, bins, dtype=points.dtype)
    hist = jnp.einsum("...n,...nb->...b", w * (1.0 - frac), oh_lo) + jnp.einsum(
        "...n,...nb->...b", w * frac, oh_hi
    )
    total = jnp.sum(hist, axis=-1, keepdims=True)
    return hist / jnp.maximum(total, jnp.finfo(points.dtype).tiny)


def rotation_from_histograms(h_a: Array, h_b: Array) -> Array:
    """Best rotation angle (radians) aligning histogram ``h_a`` to ``h_b``.

    Circular cross-correlation over all bin shifts via real FFT (O(B log B)),
    argmax refined by parabolic interpolation between neighboring shifts.
    """
    bins = h_a.shape[-1]
    corr = jnp.fft.irfft(
        jnp.conj(jnp.fft.rfft(h_a, axis=-1)) * jnp.fft.rfft(h_b, axis=-1),
        n=bins,
        axis=-1,
    )
    best = jnp.argmax(corr, axis=-1)
    # Parabolic sub-bin refinement on (best-1, best, best+1).
    c0 = jnp.take_along_axis(corr, jnp.mod(best - 1, bins)[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(corr, best[..., None], axis=-1)[..., 0]
    c2 = jnp.take_along_axis(corr, jnp.mod(best + 1, bins)[..., None], axis=-1)[..., 0]
    denom = c0 - 2 * c1 + c2
    offset = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0
    )
    shift = best.astype(h_a.dtype) + offset
    return shift * (2 * jnp.pi / bins)


def coarse_align_2d(
    source: PointCloud, target: PointCloud, bins: int = 180
) -> RigidTransform:
    """Global SE(2) initial guess: histogram rotation + centroid translation.

    Returns a transform T with ``T(source) ~ target`` up to local refinement;
    feed it as the ``guess`` of :func:`icp_tpu.driver.converge`.  Batched
    over leading dims.
    """
    h_a = bearing_histogram(source.points, source.mask, bins)
    h_b = bearing_histogram(target.points, target.mask, bins)
    angle = rotation_from_histograms(h_a, h_b)
    rot = geometry.from_angle_2d(angle)
    ca = geometry.masked_centroid(source.points, source.mask)
    cb = geometry.masked_centroid(target.points, target.mask)
    t = cb - jnp.einsum("...ij,...j->...i", rot.rotation, ca)
    return RigidTransform(rot.rotation, t)
