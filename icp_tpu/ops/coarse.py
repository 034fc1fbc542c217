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
from ..geometry import HIGHEST, RigidTransform

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
    hist = jnp.einsum(
        "...n,...nb->...b", w * (1.0 - frac), oh_lo, precision=HIGHEST
    ) + jnp.einsum("...n,...nb->...b", w * frac, oh_hi, precision=HIGHEST)
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
    t = cb - jnp.einsum("...ij,...j->...i", rot.rotation, ca, precision=HIGHEST)
    return RigidTransform(rot.rotation, t)


def coarse_align_3d(
    source: PointCloud, target: PointCloud
) -> RigidTransform:
    """Global SE(3) initial guess by principal-axes alignment.

    Aligns the eigenbases of the two clouds' covariances: with
    ``C_a = V_a L V_a^T`` and ``C_b = V_b M V_b^T`` (eigenvalues ascending),
    the 4 proper rotations ``R = V_b S V_a^T`` (sign matrices ``S`` with
    ``det(V_b S V_a^T) = +1``) are the axis-consistent candidates; each is
    scored by its post-alignment mean NN distance (one fused batched pass)
    and the best one wins.  Batched over leading dims.

    Handles arbitrary rotations as long as the cloud has anisotropic
    structure (degenerate spheres score all candidates equally — any is as
    good).  The result seeds ``converge`` like :func:`coarse_align_2d`.
    """
    from ..ops.nn import nearest_neighbors
    from ..ops.rigid_fit import _jacobi_eigh_sym

    def eigbasis(points, mask):
        c = geometry.masked_centroid(points, mask)
        w = mask.astype(points.dtype)
        centered = (points - c[..., None, :]) * w[..., None]
        cov = jnp.einsum("...ni,...nj->...ij", centered, centered, precision=HIGHEST)
        vals, vecs = _jacobi_eigh_sym(cov)
        order = jnp.argsort(vals, axis=-1)
        vecs = jnp.take_along_axis(
            vecs, order[..., None, :].repeat(3, axis=-2), axis=-1
        )
        # Make each basis right-handed.
        det = jnp.linalg.det(vecs)
        vecs = vecs.at[..., :, 0].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
        return c, vecs

    ca, va = eigbasis(source.points, source.mask)
    cb, vb = eigbasis(target.points, target.mask)

    # 4 sign patterns with product +1 keep det(R) = +1.
    signs = jnp.asarray(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], dtype=source.dtype
    )

    def candidate(s):
        r = jnp.einsum("...ik,k,...jk->...ij", vb, s, va, precision=HIGHEST)
        t = cb - jnp.einsum("...ij,...j->...i", r, ca, precision=HIGHEST)
        return RigidTransform(r, t)

    cands = [candidate(signs[i]) for i in range(4)]
    # Score ALL candidates in one batched NN pass: stack them on a new
    # leading axis and broadcast the clouds across it.
    rot = jnp.stack([tf.rotation for tf in cands], axis=0)  # (4, ..., 3, 3)
    trans = jnp.stack([tf.translation for tf in cands], axis=0)  # (4, ..., 3)
    stacked = RigidTransform(rot, trans)
    src_b = jnp.broadcast_to(source.points, (4, *source.points.shape))
    tgt_b = jnp.broadcast_to(target.points, (4, *target.points.shape))
    tmask_b = jnp.broadcast_to(target.mask, (4, *target.mask.shape))
    moved = geometry.apply(stacked, src_b)
    sq, _ = nearest_neighbors(moved, tgt_b, tmask_b)  # (4, ..., N)
    sq = jnp.where(source.mask, sq, 0.0)
    n = jnp.maximum(jnp.sum(source.mask, axis=-1).astype(sq.dtype), 1.0)
    scores = jnp.moveaxis(jnp.sum(sq, axis=-1) / n, 0, -1)  # (..., 4)
    best = jnp.argmin(scores, axis=-1)
    rot_l = jnp.moveaxis(rot, 0, -3)  # (..., 4, 3, 3)
    trans_l = jnp.moveaxis(trans, 0, -2)  # (..., 4, 3)
    r = jnp.take_along_axis(
        rot_l, best[..., None, None, None].repeat(3, -2).repeat(3, -1), axis=-3
    )[..., 0, :, :]
    t = jnp.take_along_axis(trans_l, best[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    return RigidTransform(r, t)
