"""Fused Pallas 1-NN correspondence kernel (TPU hot path).

The distance-matrix + row-argmin that replaces the reference's k-d tree and
brute-force loops (see :mod:`icp_tpu.ops.nn`) materializes an (N, M) matrix
in HBM on the portable jnp path.  This kernel never does: the target is
streamed tile-by-tile through VMEM and the running (min, argmin) carry lives
in the output block, so HBM traffic is O(N·D + M·D + N) instead of O(N·M) —
the op is bandwidth-bound at D∈{2,3}, so this is the speed-of-light shape.

Layout: coordinates-first ``(D, N)`` / ``(D, M)`` so the big tile axes sit
in (sublane, lane); the per-tile distance block is computed **targets-major**
``(TM, TN)`` so the argmin reduces over sublanes and lands directly in the
lane-aligned ``(1, TN)`` output block.

Exactness contract (bit-matching ``icp_tpu.ops.nn.nearest_neighbors``):
squared Euclidean distances, masked targets at +inf, ties to the lower
global target index (within a tile: first-occurrence argmin; across tiles:
strict-improvement keeps the earlier tile).

Measured on a real TPU chip (2026-08, this repo's bench env): exact parity
with the jnp path at every size tested, and throughput parity at the bench
workload (1024x1024: 1.41 ms vs 1.43 ms), but 0.4-0.6x at large sizes
(10720^2, 8192x65536) — XLA's fused subtract-square-variadic-reduce is
already at VPU speed-of-light for this op (no (N, M) HBM materialization
happens in practice), so hand-scheduling buys nothing.  The default
correspondence path therefore remains ``icp_tpu.ops.nn``; this kernel is
kept as the base for future *fused-iteration* work (NN + gather + partial
Kabsch sums in one kernel), where cross-op fusion XLA won't do is the win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cloud import round_up as _round_up

Array = jax.Array

TILE_N = 128  # query tile (lanes of the output block)
TILE_M = 512  # target tile (sublanes of the distance block)


def _nn_kernel(
    q_ref, t_ref, tmask_ref, min_ref, idx_ref, *, dim: int, tile_m: int, m_tiles: int
):
    """One query tile vs the whole (VMEM-resident) target.

    The target stays pinned in VMEM across the 1-D grid (its index map is
    constant, so Pallas fetches it once); the (min, argmin) carry lives in
    registers through the inner ``fori_loop`` — the output block is written
    exactly once, and there is no per-tile kernel relaunch overhead.
    """
    q = [q_ref[d, :] for d in range(dim)]  # dim x (TN,)

    def body(j, carry):
        best_min, best_idx = carry  # (1, TN)
        sl = pl.ds(j * tile_m, tile_m)
        acc = None
        for d in range(dim):
            diff = t_ref[d, sl][:, None] - q[d][None, :]  # (TM, TN)
            sq = diff * diff
            acc = sq if acc is None else acc + sq
        big = jnp.asarray(jnp.inf, dtype=acc.dtype)
        acc = jnp.where(tmask_ref[sl, 0][:, None], acc, big)

        local_min = jnp.min(acc, axis=0)[None, :]  # (1, TN)
        local_idx = (
            jnp.argmin(acc, axis=0).astype(jnp.int32)[None, :] + j * tile_m
        )  # first occurrence -> lowest index within the tile
        better = local_min < best_min  # strict: ties keep the earlier tile
        return (
            jnp.where(better, local_min, best_min),
            jnp.where(better, local_idx, best_idx),
        )

    init = (
        jnp.full(min_ref.shape, jnp.inf, dtype=min_ref.dtype),
        jnp.zeros(idx_ref.shape, dtype=jnp.int32),
    )
    best_min, best_idx = jax.lax.fori_loop(0, m_tiles, body, init)
    min_ref[:, :] = best_min
    idx_ref[:, :] = best_idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    query: Array,
    targets: Array,
    target_mask: Array | None = None,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Exact masked 1-NN ``(N, D) x (M, D) -> (sq_dists (N,), idx (N,) i32)``.

    Unbatched core; batch via ``jax.vmap`` (the leading dim becomes a grid
    axis).  Inputs are padded to tile multiples internally; ``target_mask``
    defaults to all-valid.
    """
    n, dim = query.shape
    m = targets.shape[0]
    dtype = query.dtype

    n_pad = _round_up(max(n, TILE_N), TILE_N)
    m_pad = _round_up(max(m, TILE_M), TILE_M)

    q = jnp.zeros((dim, n_pad), dtype=dtype).at[:, :n].set(query.T)
    t = jnp.zeros((dim, m_pad), dtype=dtype).at[:, :m].set(targets.T)
    if target_mask is None:
        mask = (jnp.arange(m_pad, dtype=jnp.int32) < m)[:, None]
    else:
        mask = jnp.zeros((m_pad,), dtype=bool).at[:m].set(target_mask)[:, None]

    grid = (n_pad // TILE_N,)
    kernel = functools.partial(
        _nn_kernel, dim=dim, tile_m=TILE_M, m_tiles=m_pad // TILE_M
    )

    min_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((dim, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, mask)

    return min_out[0, :n], idx_out[0, :n]
