"""Grid-accelerated exact radius-gated 1-NN for large clouds.

The workhorse correspondence op (:mod:`icp_tpu.ops.nn`) computes the full
``(N, M)`` distance product — exact, branch-free, and the right shape for
the VPU at bench scale (1024²).  At LARGE ``M`` (dense 3D maps, 10k-100k
points) most of that product is provably irrelevant whenever the caller
gates correspondences by a max distance anyway (``trimmed_3d``'s Euclidean
gate, scan-to-map against a local map): a target farther than
``max_distance`` never feeds the solve.

This module computes the *same gated answer* in ``O(N · 3^D · C)`` instead
of ``O(N · M)``:

1. **Build** (:func:`build_grid`): targets are binned into cubic cells of
   side ``cell_size`` (packed single-int32 keys — TPU-safe, no x64 —
   10 bits/axis in 3D, 15 in 2D), then sorted by key, carrying original
   indices.  Masked-out targets get a sentinel key that sorts last.  No
   hash table and no per-cell storage: a cell's members ARE a contiguous
   range of the sorted arrays.
2. **Query** (:func:`grid_nearest_neighbors`): each query visits its
   ``3^D`` neighbor cells; each cell's range comes from two vectorized
   ``searchsorted`` binary searches; up to ``cell_capacity`` candidates per
   cell are fetched with one gather; distances use the same
   per-coordinate subtract-square-accumulate as the brute-force op, so
   matched pairs produce bit-identical squared distances; ties break to the
   lowest ORIGINAL target index (the :mod:`ops.nn` contract).

Exactness contract: for every query whose true nearest (masked) target lies
within ``cell_size`` Euclidean, the returned ``(sq_dist, index)`` equals the
brute-force answer bitwise — any such target is at most one cell away in
every axis, so the 3^D neighborhood provably contains the NN.  Queries with
no target inside ``cell_size`` return ``(+inf, 0)`` ("no correspondence
within the gate" — exactly what the gated solvers do with them).  Set
``cell_size = max_distance`` to make the grid gate coincide with the
method's gate.

Static-shape discipline: ``cell_capacity`` (max targets per cell) is a
static parameter.  If any *visited* cell holds more than ``cell_capacity``
targets the result may silently miss candidates, so the query also returns
an ``overflowed`` flag — callers assert it off once per deployment (host
check) and bump the capacity or shrink the cells.  Cells are clamped to
±2^(bits-1) cells from the origin; beyond that extent, border cells merge
(same caveat as :func:`icp_tpu.mapping.voxel_downsample_device`).

Status: exactness is pinned by ``tests/test_grid_nn.py`` on CPU.  The TPU
decision probe (``scripts/grid_nn_probe.py``, real chip 2026-08-19) is a
recorded NEGATIVE: the fused (N, M) brute reduce costs 0.56-0.74 ms across
every probed size up to (16384, 131072) while the gather-heavy grid query
costs 1.2-9.4 ms (0.47x -> 0.08x "speedup") — the MXU absorbs the dense
contraction and random gathers do not tile.  So this op is a CPU-backend
tool only (10.4x at M=131k on host); no TPU method adopts it (the
pallas_nn lesson: integration follows measurement, never precedes it).
For large-map TPU matching use NDT's dense one-hot-matmul lookup
(:mod:`icp_tpu.ops.ndt`) instead — the same measurement story, resolved
the TPU way: 2.9 ms/iter vs the 3.1 ms brute reduce at the 64k-map bench
shape (and 15.9 ms for NDT's own gather-based variant).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

_BITS = {2: 15, 3: 10}


class GridIndex(NamedTuple):
    """Sorted cell-key index over one target cloud (a pytree of arrays)."""

    sorted_keys: Array  # (M,) int32, masked-out targets last
    sorted_points: Array  # (M, D) reordered targets
    sorted_index: Array  # (M,) int32 original target indices
    cell_size: Array  # () the bin side length (traced scalar ok)


def _cell_keys(points: Array, cell_size, dim: int) -> tuple[Array, Array]:
    """Packed int32 cell key per point + the per-axis cell coords."""
    bits = _BITS[dim]
    bound = 1 << (bits - 1)
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    cells = jnp.clip(cells, -bound, bound - 1) + bound  # [0, 2^bits)
    key = cells[..., 0]
    for d in range(1, dim):
        key = (key << bits) | cells[..., d]
    return key, cells


def build_grid(targets: Array, target_mask: Array | None, cell_size) -> GridIndex:
    """Index ``targets (M, D)`` for :func:`grid_nearest_neighbors`.

    Jittable; one stable sort.  ``target_mask`` semantics match
    :func:`icp_tpu.ops.nn.nearest_neighbors` (masked-out targets can never
    be matched).
    """
    m, dim = targets.shape
    key, _ = _cell_keys(targets, cell_size, dim)
    if target_mask is not None:
        key = jnp.where(target_mask, key, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key, stable=True)
    return GridIndex(
        sorted_keys=key[order],
        sorted_points=targets[order],
        sorted_index=order.astype(jnp.int32),
        cell_size=jnp.asarray(cell_size, dtype=targets.dtype),
    )


def grid_nearest_neighbors(
    query: Array,
    grid: GridIndex,
    cell_capacity: int,
) -> tuple[Array, Array, Array]:
    """Exact 1-NN within ``grid.cell_size`` of each query (module doc).

    Returns ``(sq_dists (N,), indices (N,) int32, overflowed ())``:
    bit-identical to the brute-force gated answer when ``overflowed`` is
    False; queries with nothing inside the radius get ``(+inf, 0)``.
    """
    n, dim = query.shape
    m = grid.sorted_points.shape[0]
    bits = _BITS[dim]
    bound = 1 << (bits - 1)
    cell_size = grid.cell_size

    cells = jnp.floor(query / cell_size).astype(jnp.int32)
    cells = jnp.clip(cells, -bound, bound - 1) + bound

    # 3^D neighbor offsets, a static (K, D) table.
    import numpy as np

    offsets = jnp.asarray(
        np.stack(
            np.meshgrid(*([np.arange(-1, 2)] * dim), indexing="ij"), -1
        ).reshape(-1, dim),
        dtype=jnp.int32,
    )  # (K, D)
    nbr = jnp.clip(cells[:, None, :] + offsets[None, :, :], 0, 2 * bound - 1)
    nbr_key = nbr[..., 0]
    for d in range(1, dim):
        nbr_key = (nbr_key << bits) | nbr[..., d]  # (N, K)

    # Contiguous sorted-range per visited cell: two vectorized binary
    # searches over the sorted keys.
    start = jnp.searchsorted(grid.sorted_keys, nbr_key.reshape(-1), side="left")
    end = jnp.searchsorted(grid.sorted_keys, nbr_key.reshape(-1), side="right")
    k = offsets.shape[0]
    start = start.reshape(n, k).astype(jnp.int32)
    end = end.reshape(n, k).astype(jnp.int32)
    # A border-clamped query can see the same (clamped) cell through several
    # offsets; duplicated candidates are harmless for an argmin.
    overflowed = jnp.any(end - start > cell_capacity)

    cand = start[..., None] + jnp.arange(cell_capacity, dtype=jnp.int32)  # (N,K,C)
    valid = cand < end[..., None]
    cand = jnp.minimum(cand, m - 1)
    pts = jnp.take(grid.sorted_points, cand.reshape(n, -1), axis=0)  # (N,K*C,D)
    idx = jnp.take(grid.sorted_index, cand.reshape(n, -1), axis=0)  # (N,K*C)
    valid = valid.reshape(n, -1)

    # Same arithmetic as ops.nn.pairwise_sq_dists -> bit-identical distances.
    acc = None
    for d in range(dim):
        diff = query[:, None, d] - pts[..., d]
        sq = diff * diff
        acc = sq if acc is None else acc + sq
    big = jnp.asarray(jnp.inf, dtype=acc.dtype)
    d2 = jnp.where(valid, acc, big)

    sq_min = jnp.min(d2, axis=-1)
    int_max = jnp.iinfo(jnp.int32).max
    tie = jnp.where(d2 == sq_min[:, None], idx, int_max)
    idx_min = jnp.min(tie, axis=-1)

    # Certified only inside the radius: beyond cell_size the true NN may
    # live outside the visited neighborhood.
    inside = sq_min <= cell_size * cell_size
    sq_out = jnp.where(inside, sq_min, big)
    idx_out = jnp.where(inside, idx_min, 0).astype(jnp.int32)
    return sq_out, idx_out, overflowed
