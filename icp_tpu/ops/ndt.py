"""Voxel-Gaussian map construction for NDT scan matching.

The Normal Distributions Transform (Biber & Strasser 2003, 2D; Magnusson
2009, 3D) replaces point-to-point correspondences with a compact Gaussian
per occupied voxel: registering a scan against the map means maximizing the
likelihood of the transformed points under those Gaussians.  The reference
library has no NDT (its five methods are all point-to-point,
``/root/reference/lib/icp/icp.cpp:16-27``); this is a net-new method family
in the production scan-matching canon, and its structure is a natural fit
for the TPU:

* **Build** (:func:`build_ndt_map`): one stable sort on packed int32 cell
  keys (the :mod:`icp_tpu.ops.grid_nn` encoding), segment boundaries from
  adjacent-key comparison, then first/second moments per cell via three
  ``segment_sum`` scatters into a STATIC ``capacity``-slot table — no hash
  map, no dynamic shapes, one fused XLA program.  Covariances are
  eigenvalue-regularized (Magnusson 2009 §6.2: eigenvalues below
  ``min_eigenvalue_ratio`` of the largest are clamped to that fraction, so
  thin cells describe planes/lines instead of singular matrices) and stored
  pre-inverted.
* **Lookup** (:func:`lookup_cells`): a transformed point's cell statistics
  come from one vectorized ``searchsorted`` into the sorted key table plus
  an exact-key check — O(log V) per point, batched, branch-free.
* **Overlapping grids**: the original 2D NDT smooths the piecewise-constant
  cell assignment by scoring every point against ``2^D`` grids shifted by
  half a cell per axis combination (Biber & Strasser 2003 §III).  The map
  builder exposes that directly: pass an ``offset`` and build ``2^D``
  stacked maps with ``jax.vmap`` (see :func:`build_overlapping_ndt_maps`).

Exactness/semantics notes: cell membership uses ``floor((p + offset) /
cell_size)`` — the half-open box convention.  Cells with fewer than
``min_points`` members are marked invalid (a 1-2 point cell has a
degenerate covariance and, in the original formulation, is skipped).
Overflow beyond ``capacity`` distinct occupied cells sets the returned
``overflowed`` flag; callers assert it off once per deployment, as with
:mod:`icp_tpu.ops.grid_nn`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import HIGHEST
from .grid_nn import _cell_keys
from .rigid_fit import _jacobi_eigh_sym

Array = jax.Array

DEFAULT_MIN_POINTS = 4
DEFAULT_MIN_EIGENVALUE_RATIO = 1e-2


class NdtMap(NamedTuple):
    """Static-capacity voxel-Gaussian table (a pytree of arrays).

    Slots are in ascending packed-cell-key order (searchsorted's contract);
    ``valid`` marks well-populated cells.  Underpopulated-but-occupied
    slots keep their real key (order!) with identity statistics and
    ``valid=False``; only EMPTY slots carry the int32-max sentinel key,
    and those are all trailing.  Leading batch dimensions are allowed on
    every array (``vmap``-built).
    """

    keys: Array  # (..., V) int32, ascending; sentinel = int32 max
    means: Array  # (..., V, D)
    inv_covs: Array  # (..., V, D, D) regularized inverse covariances
    valid: Array  # (..., V) bool
    counts: Array  # (..., V) member counts (0 on empty slots)
    cell_size: Array  # () or (...,) bin side length
    offset: Array  # (..., D) grid shift added before binning
    overflowed: Array  # (...,) bool — more occupied cells than capacity
    covs: Array  # (..., V, D, D) regularized covariances (inv_covs^-1;
    # D2D-NDT needs the forward form to build R Σ_s Rᵀ + Σ_t)


def _regularize_inverse(cov: Array, min_ratio: float) -> tuple[Array, Array]:
    """Clamp eigenvalues to ``min_ratio * lambda_max``; return
    ``(regularized inverse, regularized covariance)``.

    Magnusson 2009 §6.2 (the standard 3D-NDT conditioning): near-singular
    directions (planar/linear cells) get a floor proportional to the
    largest eigenvalue, keeping the Gaussian a sensible plane/line model.
    An absolute floor guards the all-coincident-points cell.
    """
    eigvals, eigvecs = _jacobi_eigh_sym(cov)
    lam_max = jnp.max(eigvals, axis=-1, keepdims=True)
    floor = jnp.maximum(
        min_ratio * lam_max, jnp.asarray(jnp.finfo(cov.dtype).tiny ** 0.5, cov.dtype)
    )
    lam = jnp.maximum(eigvals, floor)
    inv = jnp.einsum(
        "...ik,...k,...jk->...ij", eigvecs, 1.0 / lam, eigvecs, precision=HIGHEST
    )
    reg = jnp.einsum(
        "...ik,...k,...jk->...ij", eigvecs, lam, eigvecs, precision=HIGHEST
    )
    return inv, reg


def _build_single(
    points: Array,
    mask: Array,
    cell_size,
    offset: Array,
    capacity: int,
    min_points: int,
    min_ratio: float,
) -> NdtMap:
    """Unbatched builder: ``points (N, D)``, ``mask (N,)`` -> V-slot map."""
    n, dim = points.shape
    dtype = points.dtype
    sentinel = jnp.iinfo(jnp.int32).max

    key, _ = _cell_keys(points + offset, cell_size, dim)
    key = jnp.where(mask, key, sentinel)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    pts_s = points[order]
    valid_s = key_s != sentinel

    # Dense segment ids in sorted order; invalid tail gets weight 0.
    first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    seg = jnp.cumsum(first) - 1  # (N,) 0-based, ascending
    n_cells = jnp.where(jnp.any(valid_s), seg[jnp.sum(valid_s) - 1] + 1, 0)
    overflowed = n_cells > capacity
    w = valid_s & (seg < capacity)
    segc = jnp.minimum(seg, capacity - 1)
    wf = w.astype(dtype)

    cnt = jax.ops.segment_sum(wf, segc, num_segments=capacity)  # (V,)
    psum = jax.ops.segment_sum(pts_s * wf[:, None], segc, num_segments=capacity)
    # Second moments accumulate in a per-cell-anchored frame: the raw
    # E[pp^T] - mu mu^T form cancels catastrophically in f32 once
    # |p| >> cell_size (at ~300 m with 0.5 m cells the rounding error
    # rivals the true within-cell variance).  Shifting each point by its
    # own cell's corner — constant within a segment, so the covariance is
    # unchanged — keeps the contraction on O(cell_size) values, where the
    # subtraction is exact to within a few ulps of the variance itself.
    anchor = jnp.floor((pts_s + offset) / cell_size) * cell_size - offset
    rel = pts_s - anchor
    rsum = jax.ops.segment_sum(rel * wf[:, None], segc, num_segments=capacity)
    outer = jnp.einsum("ni,nj->nij", rel, rel, precision=HIGHEST)
    osum = jax.ops.segment_sum(outer * wf[:, None, None], segc, num_segments=capacity)
    keys = jax.ops.segment_min(
        jnp.where(w, key_s, sentinel), segc, num_segments=capacity
    )

    denom = jnp.maximum(cnt, 1.0)
    mean = psum / denom[:, None]
    mean_rel = rsum / denom[:, None]
    cov = osum / denom[:, None, None] - jnp.einsum(
        "ni,nj->nij", mean_rel, mean_rel, precision=HIGHEST
    )
    cell_valid = cnt >= min_points
    # Underpopulated cells keep their REAL key (the table must stay in
    # ascending key order for lookup_cells' searchsorted — a sentinel in
    # the middle breaks the invariant and silently loses every later
    # cell's matches) and are gated by ``valid`` at lookup instead; only
    # empty slots carry the sentinel (segment_min's identity), and those
    # are all trailing.  Identity statistics keep the inverse finite.
    eye = jnp.eye(dim, dtype=dtype)
    cov = jnp.where(cell_valid[:, None, None], cov, eye)
    inv_cov, reg_cov = _regularize_inverse(cov, min_ratio)
    inv_cov = jnp.where(cell_valid[:, None, None], inv_cov, eye)
    reg_cov = jnp.where(cell_valid[:, None, None], reg_cov, eye)
    return NdtMap(
        keys=keys,
        means=jnp.where(cell_valid[:, None], mean, 0.0),
        inv_covs=inv_cov,
        valid=cell_valid,
        counts=cnt,
        cell_size=jnp.asarray(cell_size, dtype),
        offset=jnp.asarray(offset, dtype),
        overflowed=overflowed,
        covs=reg_cov,
    )


def build_ndt_map(
    points: Array,
    mask: Array,
    cell_size,
    capacity: int,
    offset: Array | None = None,
    min_points: int = DEFAULT_MIN_POINTS,
    min_eigenvalue_ratio: float = DEFAULT_MIN_EIGENVALUE_RATIO,
) -> NdtMap:
    """Voxel-Gaussian map of ``points (..., N, D)`` with ``mask (..., N)``.

    Jittable, batched over arbitrary leading dims.  ``capacity`` is the
    static slot budget for distinct occupied cells (see module doc).
    """
    dim = points.shape[-1]
    if offset is None:
        offset = jnp.zeros((dim,), points.dtype)
    offset = jnp.asarray(offset, points.dtype)
    batch = points.shape[:-2]

    def build(p, m):
        return _build_single(
            p, m, cell_size, offset, capacity, min_points, min_eigenvalue_ratio
        )

    if not batch:
        return build(points, mask)
    flat_p = points.reshape((-1,) + points.shape[-2:])
    flat_m = mask.reshape((-1,) + mask.shape[-1:])
    out = jax.vmap(build)(flat_p, flat_m)
    return jax.tree.map(
        lambda x: x.reshape(batch + x.shape[1:]), out
    )


def build_overlapping_ndt_maps(
    points: Array,
    mask: Array,
    cell_size,
    capacity: int,
    min_points: int = DEFAULT_MIN_POINTS,
    min_eigenvalue_ratio: float = DEFAULT_MIN_EIGENVALUE_RATIO,
) -> NdtMap:
    """The ``2^D`` half-cell-shifted grids of the original 2D NDT
    (Biber & Strasser 2003 §III), stacked on a new LEADING ``G = 2^D`` axis
    (before any batch dims — maps are indexed ``[g, ..., v]``).

    Scoring a point against all ``G`` grids makes the objective piecewise
    smooth where a single grid's cell assignment is piecewise constant.
    """
    dim = points.shape[-1]
    half = jnp.asarray(cell_size, points.dtype) / 2
    combos = jnp.stack(
        jnp.meshgrid(*([jnp.asarray([0.0, 1.0], points.dtype)] * dim), indexing="ij"),
        axis=-1,
    ).reshape(-1, dim)  # (2^D, D)
    offsets = combos * half

    def one(off):
        return build_ndt_map(
            points,
            mask,
            cell_size,
            capacity,
            offset=off,
            min_points=min_points,
            min_eigenvalue_ratio=min_eigenvalue_ratio,
        )

    return jax.vmap(one)(offsets)


def lookup_cells_dense(
    query: Array, ndt: NdtMap, include_covs: bool = False
):
    """MXU formulation of :func:`lookup_cells` — same contract, same values.

    The sorted-table searchsorted+gather path scalarizes on TPU (random
    gathers do not tile; measured 14.3 ms vs the 3.1 ms brute NN reduce at
    the 64k-map bench shape — the grid_nn story again).  This variant
    instead builds the exact-key one-hot ``(..., N, V)`` mask with one
    elementwise compare and selects the statistics with two matmul
    contractions (``onehot @ means``, ``onehot @ inv_covs``) that ride the
    MXU.  Cell keys are unique per map, so the one-hot has at most a single
    1 per row: the matmul reproduces the gathered values exactly (x * 1.0
    and + 0.0 are exact in every IEEE precision).  Misses return zero
    statistics with ``hit=False`` (callers weight them 0 either way;
    ``lookup_cells`` returns an arbitrary slot's values there instead).

    O(N*V) work instead of O(N log V) — and measurably faster on TPU,
    where the dense contraction is the shape the hardware wants.  Batched
    over leading dims shared by ``query`` and the map.

    Everything rides ONE matmul: the per-slot statistics are packed as
    ``[1, slot_index, mean, inv_cov] (V, 2 + D + D^2)`` so the one-hot is
    read once — hit is the selected 1-column (exactly 1.0 on a hit, 0.0
    otherwise) and the slot index column is exact for ``V < 2^24`` in f32.
    """
    dim = query.shape[-1]
    v = ndt.keys.shape[-1]
    # Batched maps carry (...,) cell_size and (..., D) offset; align them
    # with the query's point axis for broadcasting.
    offset = ndt.offset
    cell = ndt.cell_size
    if offset.ndim > 1:
        offset = offset[..., None, :]
    if getattr(cell, "ndim", 0) >= 1:
        cell = cell[..., None, None]
    key, _ = _cell_keys(query + offset, cell, dim)
    eq = (key[..., :, None] == ndt.keys[..., None, :]) & ndt.valid[..., None, :]
    onehot = eq.astype(query.dtype)
    ic_flat = ndt.inv_covs.reshape(ndt.inv_covs.shape[:-3] + (v, dim * dim))
    lead = jnp.broadcast_to(
        jnp.stack(
            [jnp.ones((v,), query.dtype), jnp.arange(v, dtype=query.dtype)], -1
        ),
        ndt.means.shape[:-1] + (2,),
    )
    cols = [lead, ndt.means, ic_flat]
    if include_covs:
        # D2D-NDT also needs the FORWARD covariance; one wider matmul
        # beats a second one-hot pass.
        cols.append(ndt.covs.reshape(ndt.covs.shape[:-3] + (v, dim * dim)))
    stats = jnp.concatenate(cols, axis=-1)
    sel = jnp.einsum("...nv,...vk->...nk", onehot, stats, precision=HIGHEST)
    hit = sel[..., 0] > 0.5
    idx = sel[..., 1].astype(jnp.int32)
    means = sel[..., 2 : 2 + dim]
    dd = dim * dim
    inv_covs = sel[..., 2 + dim : 2 + dim + dd].reshape(
        query.shape[:-1] + (dim, dim)
    )
    if include_covs:
        covs = sel[..., 2 + dim + dd :].reshape(query.shape[:-1] + (dim, dim))
        return means, inv_covs, hit, idx, covs
    return means, inv_covs, hit, idx


def lookup_cells(query: Array, ndt: NdtMap, include_covs: bool = False):
    """Cell statistics containing each query point.

    ``query (..., N, D)`` against an UNBATCHED map (leading map batch dims
    must be vmapped by the caller) -> ``(means (..., N, D),
    inv_covs (..., N, D, D), valid (..., N) bool, idx (..., N) int32)``,
    plus ``covs (..., N, D, D)`` when ``include_covs``.
    Queries in unoccupied/invalid cells return ``valid=False`` (stats from
    an arbitrary slot; callers weight them 0).
    """
    dim = query.shape[-1]
    key, _ = _cell_keys(query + ndt.offset, ndt.cell_size, dim)
    pos = jnp.searchsorted(ndt.keys, key, side="left")
    idx = jnp.clip(pos, 0, ndt.keys.shape[-1] - 1).astype(jnp.int32)
    hit = (jnp.take(ndt.keys, idx, axis=-1) == key) & jnp.take(
        ndt.valid, idx, axis=-1
    )
    means = jnp.take(ndt.means, idx, axis=0)
    inv_covs = jnp.take(ndt.inv_covs, idx, axis=0)
    if include_covs:
        return means, inv_covs, hit, idx, jnp.take(ndt.covs, idx, axis=0)
    return means, inv_covs, hit, idx


def inverse_small_spd(m: Array) -> Array:
    """Closed-form inverse of batched 2x2 / 3x3 SPD matrices (adjugate /
    det) — pure elementwise VPU math.  ``jnp.linalg.inv`` lowers to a
    batched LU on TPU and measured 60x slower at the D2D bench shape
    (65k 3x3 inversions inside the iterate: 184 ms/iter vs ~3 ms)."""
    d = m.shape[-1]
    if d == 2:
        a, b = m[..., 0, 0], m[..., 0, 1]
        c, e = m[..., 1, 0], m[..., 1, 1]
        det = a * e - b * c
        adj = jnp.stack(
            [jnp.stack([e, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return adj / det[..., None, None]
    if d == 3:
        a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        e, f, g = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        h, i, j = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        ca = f * j - g * i
        cb = g * h - e * j
        cc = e * i - f * h
        det = a * ca + b * cb + c * cc
        adj = jnp.stack(
            [
                jnp.stack([ca, c * i - b * j, b * g - c * f], -1),
                jnp.stack([cb, a * j - c * h, c * e - a * g], -1),
                jnp.stack([cc, b * h - a * i, a * f - b * e], -1),
            ],
            -2,
        )
        return adj / det[..., None, None]
    raise ValueError(f"inverse_small_spd supports D in (2, 3), got {d}")
