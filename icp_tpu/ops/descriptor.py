"""Scan Context place-recognition descriptors (net-new — no reference
counterpart; the reference's loop story ends at registration,
``/root/reference/include/icp/icp.h`` has no retrieval at all).

Pose-radius loop-candidate search (:func:`icp_tpu.pose_graph.
find_loop_candidates`) trusts the drifted trajectory: when accumulated
drift exceeds the search radius, true revisits are never proposed and the
graph never gets the edge that would fix the drift — the classic SLAM
chicken-and-egg.  Place recognition breaks it by matching scan APPEARANCE:
this module implements the polar Scan Context descriptor (Kim & Kim, IROS
2018) re-designed static-shape for TPU:

* :func:`scan_context` — one descriptor per scan: points binned into a
  ``(rings, sectors)`` polar grid around the scan centroid.  3D scans
  store the bin's max height (the original formulation); 2D scans store
  binary occupancy.  The binning is a one-hot ``segment_max``/``segment
  _sum`` at static shapes — no hash maps, jit/vmap-friendly.
* :func:`ring_key` — the rotation-invariant ring occupancy vector used as
  a cheap prefilter key (rotation permutes sectors within a ring, so the
  per-ring mean is invariant).
* :func:`descriptor_distances` — all-pairs Scan Context distance: for each
  candidate column shift (= yaw hypothesis) the mean column-wise cosine
  distance, minimized over shifts.  One einsum per shift on the MXU; the
  argmin shift is returned too — it is a free coarse YAW estimate
  (``2*pi*shift/sectors``) that seeds the closure registration outside
  the pose-derived basin.
* :func:`find_loop_candidates_descriptor` — top-K candidate pairs by
  descriptor distance with a minimum temporal separation, mirroring the
  pose-radius search's static-top-k + host-compaction contract.

Scale note: descriptors are ``O(R*S)`` = a few KB per scan; the all-pairs
distance is ``S`` einsums of ``(T, R*S) x (T, R*S)`` — at T=1000 keyframes
and the default 20x60 grid that is 60 x 1.2 GFLOP, well inside one chip's
per-refinement budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import HIGHEST

Array = jax.Array

DEFAULT_RINGS = 20
DEFAULT_SECTORS = 60


def _context_single(
    points: Array, mask: Array, rings: int, sectors: int, max_radius, center: str
) -> Array:
    """Unbatched ``(N, D)`` -> ``(rings, sectors)`` descriptor."""
    n, dim = points.shape
    dtype = points.dtype
    if center == "centroid":
        c = jnp.sum(jnp.where(mask[:, None], points, 0.0), axis=0) / jnp.maximum(
            jnp.sum(mask), 1
        )
    else:  # sensor frame: the scanner IS the origin
        c = jnp.zeros((dim,), dtype)
    rel = points - c
    xy = rel[..., :2]
    r = jnp.linalg.norm(xy, axis=-1)
    theta = jnp.arctan2(xy[..., 1], xy[..., 0])  # [-pi, pi]
    ring = jnp.floor(r / max_radius * rings).astype(jnp.int32)
    in_range = mask & (ring < rings)
    ring = jnp.clip(ring, 0, rings - 1)
    nbins = rings * sectors
    if dim == 3:
        # Original Scan Context: the bin's max z (structure height),
        # hard-binned (a max cannot be splatted).
        sector = jnp.floor((theta + jnp.pi) / (2 * jnp.pi) * sectors).astype(
            jnp.int32
        )
        sector = jnp.clip(sector, 0, sectors - 1)  # theta == +pi lands on S
        bin_id = ring * sectors + sector
        height = jnp.where(in_range, rel[..., 2], -jnp.inf)
        cell = jax.ops.segment_max(height, bin_id, num_segments=nbins)
        occupied = jax.ops.segment_sum(
            in_range.astype(dtype), bin_id, num_segments=nbins
        )
        cell = jnp.where(occupied > 0, cell, 0.0)
        return cell.reshape(rings, sectors)
    # 2D LiDAR has no height: occupancy mass, bilinearly SPLATTED across
    # the two adjacent sector bins.  A thin 2D scan occupies ~1 ring per
    # sector, so hard binning makes a fractional-sector rotation flip
    # whole columns (measured: same place rotated 0.9 rad -> distance
    # 0.20); splatting makes the descriptor rotate smoothly and the best
    # integer shift stays within half a bin of the true yaw.
    sector_f = (theta + jnp.pi) / (2 * jnp.pi) * sectors - 0.5
    s0 = jnp.floor(sector_f)
    w1 = (sector_f - s0).astype(dtype)
    s0i = jnp.mod(s0.astype(jnp.int32), sectors)
    s1i = jnp.mod(s0i + 1, sectors)
    wf = in_range.astype(dtype)
    cnt = jax.ops.segment_sum(
        jnp.concatenate([wf * (1.0 - w1), wf * w1]),
        jnp.concatenate([ring * sectors + s0i, ring * sectors + s1i]),
        num_segments=nbins,
    )
    return cnt.reshape(rings, sectors)


def scan_context(
    points: Array,
    mask: Array,
    rings: int = DEFAULT_RINGS,
    sectors: int = DEFAULT_SECTORS,
    max_radius: float | None = None,
    center: str = "origin",
) -> Array:
    """Scan Context descriptor of ``points (..., N, D)`` with ``mask
    (..., N)`` -> ``(..., rings, sectors)``.

    ``max_radius`` fixes the radial extent (points beyond it are dropped);
    it must be a COMMON constant across every scan that will be compared
    (per-scan normalization would destroy comparability) — pass the
    sensor range.

    ``center``: ``"origin"`` (default) assumes sensor-frame scans — the
    scanner is the origin, the original Scan Context convention; use
    ``"centroid"`` only for clouds with no sensor frame (e.g. model
    registration).  Centroid centering on real sweeps is unstable: the
    centroid moves with occlusions/dropouts, decorrelating descriptors of
    the same place (measured on seq1: revisit distances 0.32-0.66, no
    separation from far pairs, with centroid centering).
    """
    if max_radius is None:
        raise ValueError(
            "scan_context needs an explicit max_radius (common across all "
            "scans that will be compared)"
        )
    if center not in ("origin", "centroid"):
        raise ValueError(f"center must be 'origin' or 'centroid', got {center!r}")
    batch = points.shape[:-2]

    def build(p, m):
        return _context_single(p, m, rings, sectors, max_radius, center)

    if not batch:
        return build(points, mask)
    flat_p = points.reshape((-1,) + points.shape[-2:])
    flat_m = mask.reshape((-1,) + mask.shape[-1:])
    out = jax.vmap(build)(flat_p, flat_m)
    return out.reshape(batch + out.shape[1:])


def ring_key(desc: Array) -> Array:
    """Rotation-invariant ring key ``(..., rings)``: per-ring mean over
    sectors (a yaw rotation permutes sectors cyclically within each ring,
    leaving the mean unchanged)."""
    return jnp.mean(desc, axis=-1)


def descriptor_query(queries: Array, db: Array) -> tuple[Array, Array]:
    """Scan Context distance of every query against every database entry.

    ``queries (Q, R, S)`` vs ``db (K, R, S)`` -> ``(dist (Q, K), shift
    (Q, K) int32)``: ``dist[q, k]`` is the min-over-shifts mean
    column-wise cosine distance between query q and database entry k
    rotated by ``shift[q, k]`` sectors — the shift at the minimum is the
    yaw hypothesis aligning scan k to scan q (``yaw ~ 2*pi*shift/S``).
    Kim & Kim 2018 eq. (5)-(6), batched: one ``(Q, RS) x (K, RS)`` einsum
    per shift, min-folded with lax.scan.
    """
    sectors = queries.shape[-1]

    def unitize(d):
        norms = jnp.linalg.norm(d, axis=-2, keepdims=True)  # column norms
        return d / jnp.maximum(norms, jnp.finfo(d.dtype).tiny)

    uq, uk = unitize(queries), unitize(db)

    def one_shift(carry, s):
        best, arg = carry
        rolled = jnp.roll(uk, -s, axis=-1)
        sim = jnp.einsum("irs,jrs->ij", uq, rolled, precision=HIGHEST)
        # Mean cosine distance over all S columns; an empty column's unit
        # vector is 0, so empty-vs-anything contributes the full distance
        # 1 — the original definition.
        d = 1.0 - sim / sectors
        better = d < best
        best = jnp.where(better, d, best)
        arg = jnp.where(better, s, arg)
        return (best, arg), None

    init = (
        jnp.full((queries.shape[0], db.shape[0]), jnp.inf, queries.dtype),
        jnp.zeros((queries.shape[0], db.shape[0]), jnp.int32),
    )
    (dist, shift), _ = jax.lax.scan(
        one_shift, init, jnp.arange(sectors, dtype=jnp.int32)
    )
    return dist, shift


def descriptor_distances(descs: Array) -> tuple[Array, Array]:
    """All-pairs Scan Context distance over ``descs (T, R, S)`` —
    :func:`descriptor_query` of the stack against itself."""
    return descriptor_query(descs, descs)


def find_loop_candidates_descriptor(
    descs: Array,
    max_distance: float,
    min_separation: int = 10,
    max_candidates: int | None = None,
) -> tuple[Array, Array]:
    """Candidate loop pairs by descriptor similarity: ``(pairs (K, 2),
    yaw (K,))`` with ``dist < max_distance`` and indices at least
    ``min_separation`` apart (j > i), ordered by ascending distance.

    ``yaw`` is the per-pair coarse yaw estimate from the best column
    shift — scan j's rotation RELATIVE TO scan i (``p_j - c_j ~
    R(yaw) (p_i - c_i)``).  Feed it to :func:`yaw_seeds` (which applies
    the inverse) to seed the closure registration when drift is large
    (:func:`icp_tpu.pose_graph.register_loop_closures` ``guesses=``).
    """
    import numpy as np

    t = descs.shape[0]
    sectors = descs.shape[-1]
    dist, shift = descriptor_distances(descs)
    idx = jnp.arange(t)
    sep = idx[None, :] - idx[:, None]
    ok = (dist < max_distance) & (sep >= min_separation)
    masked = jnp.where(ok, dist, jnp.inf)
    k = max_candidates if max_candidates is not None else t * t
    k = min(k, t * t)
    neg, flat = jax.lax.top_k(-masked.reshape(-1), k)
    pairs = jnp.stack([flat // t, flat % t], axis=-1).astype(jnp.int32)
    yaw = (
        shift.reshape(-1)[flat].astype(descs.dtype) * (2 * jnp.pi / sectors)
    )
    # Wrap to (-pi, pi] so the seed is the small rotation, not ~2*pi.
    yaw = jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, yaw)
    valid = np.asarray(jnp.isfinite(neg))
    pairs_np = np.asarray(pairs)[valid]
    yaw_np = np.asarray(yaw)[valid]
    return jnp.asarray(pairs_np, dtype=jnp.int32), jnp.asarray(yaw_np)


def find_loop_candidates_descriptor_incremental(
    descs: Array,
    new_start: int,
    max_distance: float,
    min_separation: int = 10,
    max_candidates: int | None = None,
    exclude: Array | None = None,
) -> tuple[Array, Array]:
    """Incremental form of :func:`find_loop_candidates_descriptor`: only
    pairs whose NEWER member is a keyframe ``>= new_start`` can be fresh
    (descriptors are immutable, so every (i, j) with ``j < new_start`` was
    already scored by an earlier retrieval), so score just the new block
    against the whole database — ``O((T - new_start) · T · S)`` einsums
    instead of the all-pairs ``O(T² · S)`` that grows quadratically with
    the session (and retraces at every keyframe count; ADVICE round-3).

    Returns the same ``(pairs (K, 2), yaw (K,))`` contract, restricted to
    ``j >= new_start``: identical to filtering the all-pairs result
    (pinned by ``tests/test_descriptor.py``), with the same yaw convention
    (query axis = i, so the shift aligns scan j onto scan i).  Both axes
    are padded to power-of-two buckets so a long-running session reuses a
    handful of compiled executables instead of recompiling at every
    refinement's keyframe count.

    ``exclude`` (bool ``(T, T)``, optional): pairs to drop BEFORE the
    top-k truncation, so the candidate budget is spent entirely on fresh
    pairs — the radius path's semantics (ADVICE round-4: without it, a
    caller that re-lowers the cursor to re-saturate — e.g.
    :func:`icp_tpu.slam.merge_sessions` in descriptor mode — would spend
    the whole budget re-ranking already-tried pairs).
    """
    import numpy as np

    from ..cloud import bucket_capacity

    t = descs.shape[0]
    if not 0 <= new_start <= t:
        raise ValueError(f"new_start must be in [0, {t}], got {new_start}")
    n_new = t - new_start
    if n_new == 0:
        return (
            jnp.zeros((0, 2), dtype=jnp.int32),
            jnp.zeros((0,), dtype=descs.dtype),
        )
    rings, sectors = descs.shape[-2:]
    cap_db = bucket_capacity(t, min_capacity=8)
    cap_new = bucket_capacity(n_new, min_capacity=8)
    pad_db = jnp.zeros((cap_db - t, rings, sectors), dtype=descs.dtype)
    db = jnp.concatenate([descs, pad_db], axis=0)
    new_block = jnp.concatenate(
        [
            descs[new_start:],
            jnp.zeros((cap_new - n_new, rings, sectors), dtype=descs.dtype),
        ],
        axis=0,
    )
    k = max_candidates if max_candidates is not None else cap_db * cap_new
    k = min(k, cap_db * cap_new)
    if exclude is not None:
        ex = jnp.zeros((cap_db, cap_db + cap_new), dtype=bool)
        ex = ex.at[: exclude.shape[0], : exclude.shape[1]].set(exclude)
    else:
        ex = jnp.zeros((cap_db, cap_db + cap_new), dtype=bool)
    dist, shift, ok = _incremental_scores(
        db, new_block, new_start, t, max_distance, min_separation, ex
    )
    masked = jnp.where(ok, dist, jnp.inf)
    neg, flat = jax.lax.top_k(-masked.reshape(-1), k)
    gi = flat // cap_new
    gj = new_start + flat % cap_new
    pairs = jnp.stack([gi, gj], axis=-1).astype(jnp.int32)
    yaw = shift.reshape(-1)[flat].astype(descs.dtype) * (2 * jnp.pi / sectors)
    yaw = jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, yaw)
    valid = np.asarray(jnp.isfinite(neg))
    return (
        jnp.asarray(np.asarray(pairs)[valid], dtype=jnp.int32),
        jnp.asarray(np.asarray(yaw)[valid]),
    )


@jax.jit
def _incremental_scores(
    db, new_block, new_start, count, max_distance, min_separation, exclude
):
    """Jitted core of the incremental retrieval: distances of the new
    block against the database plus the validity mask (separation +
    padding + caller exclusions).  Query axis = database (i), so the shift
    convention matches the all-pairs search."""
    dist, shift = descriptor_query(db, new_block)  # (cap_db, cap_new)
    cap_db = db.shape[0]
    cap_new = new_block.shape[0]
    gi = jnp.arange(cap_db)[:, None]
    gj = new_start + jnp.arange(cap_new)[None, :]
    # The (i, j) grid's j-axis starts at the traced cursor: slice the
    # padded exclusion matrix to the same window.
    start = jnp.asarray(new_start, jnp.int32)
    ex = jax.lax.dynamic_slice(
        exclude, (jnp.zeros((), jnp.int32), start), (cap_db, cap_new)
    )
    ok = (
        (dist < max_distance)
        & (gj - gi >= min_separation)
        & (gi < count)
        & (gj < count)
        & ~ex
    )
    return dist, shift, ok


def yaw_seeds(clouds, pairs: Array, yaw: Array):
    """Registration seeds from descriptor yaw estimates.

    For each pair ``(i, j)`` the seed takes frame-j points into frame i by
    rotating ``yaw[k]`` about the (2D plane / 3D z) axis around the scan
    centroids: ``T = (R(yaw), c_i - R(yaw) c_j)`` — appearance-derived, so
    it stays inside ICP's basin even when the pose-derived seed has
    drifted out of it.  Returns a ``(K,)``-batched
    :class:`~icp_tpu.geometry.RigidTransform` for
    :func:`icp_tpu.pose_graph.register_loop_closures` ``guesses=``.
    """
    from ..geometry import RigidTransform

    pts = clouds.points
    msk = clouds.mask
    dim = pts.shape[-1]
    centers = jnp.sum(jnp.where(msk[..., None], pts, 0.0), axis=-2) / jnp.maximum(
        jnp.sum(msk, axis=-1, keepdims=True), 1
    )  # (T, D)
    i, j = pairs[:, 0], pairs[:, 1]
    # ``yaw`` is scan j's rotation RELATIVE TO scan i (the descriptor
    # shift convention); the seed applies its inverse to bring j back.
    yaw = -yaw
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    if dim == 2:
        rot = jnp.stack(
            [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
        )  # (K, 2, 2)
    else:
        z = jnp.zeros_like(c)
        o = jnp.ones_like(c)
        rot = jnp.stack(
            [
                jnp.stack([c, -s, z], -1),
                jnp.stack([s, c, z], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )  # (K, 3, 3) — yaw about z
    ci, cj = centers[i], centers[j]
    trans = ci - jnp.einsum("kab,kb->ka", rot, cj, precision=HIGHEST)
    return RigidTransform(rot.astype(pts.dtype), trans.astype(pts.dtype))
