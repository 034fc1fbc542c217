"""Layout-optimized fused 1-NN kernel (round-2 fused-iteration work).

Replaces the same reference components as :mod:`icp_tpu.ops.nn` (k-d tree
``include/algo/kdtree.h:20-159``, brute-force scan
``lib/icp/impl/trimmed.cpp:95-109``) — see that module for the distance/tie
semantics contract.  This kernel exists because the measured XLA path runs
the bench-shape correspondence at ~7% of VPU peak: the monolithic
(min, argmin) variadic reduce over the M lanes pays cross-lane work per
element.  The round-1 kernel (:mod:`icp_tpu.ops.pallas_nn`) lost to XLA for
a different reason: its target slices ``t_ref[d, sl][:, None]`` relayout
lane-major data onto sublanes every block — a cross-lane shuffle per element.

This version picks the layout so that **no relayout and no per-block
cross-lane reduction happens at all**:

* queries sit on *sublanes* — passed as ``(n_pad, 1)`` per-coordinate
  columns, block ``(TILE_N, 1)``, broadcast across lanes (free);
* targets sit on *lanes* — passed as ``(1, m_pad)`` per-coordinate rows,
  block ``(1, TILE_M=128)``, broadcast across sublanes (free);
* the running minimum is carried **per lane**: a ``(TILE_N, 128)`` carry
  where lane ``l`` holds the best over all target blocks at lane position
  ``l`` (targets ``m ≡ l  (mod 128)``).  Each target block costs only
  elementwise ops: D fused subtract-square accumulates + compare + selects.
* one cross-lane reduction per query *tile* (not per block) folds the 128
  lane-candidates into the final (sq, idx).

Ties resolve to the lowest global target index, bit-matching
``ops.nn.nearest_neighbors``: within a lane, strict improvement keeps the
earliest block (smallest m for that lane); across lanes, the final fold
takes the smallest index among value-ties explicitly (lane position does not
order global indices, so an argmin-by-first-occurrence would be wrong).

The kernel can additionally carry the **matched target coordinates**
through the same selects (``return_coords=True``).  The trimmed iterate then
needs no gather at all: the one-hot ``(B, N, M) x (B, M, D)`` contraction in
``fit_rigid_indexed`` (O(B·N·M·D) MXU work) is replaced by O(B·N·D) carried
outputs, and the rigid fit runs on them directly (``fit_rigid``).

Measured on the real chip at the bench shape (B, N, M) = (1024, 1024, 1024)
f32 (scripts/nn_layout_probe.py, BASELINE.md "Fused-iteration kernel"):
**exact everywhere — bit-equal sq, idx, and coordinates — but slower than
XLA**: NN 41.7 ms vs jnp 28.5 ms; with coordinate carry 49.1 ms; full
fused iterate 52.7 ms vs the default 32.1 ms.  Together with the round-1
kernel (62.7 ms, opposite layout) and an XLA-only two-stage variant
(53.5 ms), every hand-scheduled alternative loses to XLA's single fused
subtract-square-variadic-reduce — the op is compute-bound at its practical
speed-of-light, not HBM-bound, so cross-op fusion has nothing left to save.
This module stays as the measured-and-shelved record (VERDICT round-1
item 1: "recorded either way"); the iterate win that *did* materialize is
the radix-select trim (48.1 -> 35.8 ms, ops/select.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cloud import round_up as _round_up

Array = jax.Array

LANES = 128
DEFAULT_TILE_N = 512


def _fused_nn_kernel(
    *refs,
    dim: int,
    m_tiles: int,
    return_coords: bool,
):
    """One query tile vs all target blocks; carries live per lane."""
    q_refs = refs[:dim]  # dim x (TILE_N, 1)
    t_refs = refs[dim : 2 * dim]  # dim x (1, m_pad)
    tmask_ref = refs[2 * dim]  # (1, m_pad) int32 (1 = valid)
    out_refs = refs[2 * dim + 1 :]  # min, idx [, coords...]

    tile_n = q_refs[0].shape[0]
    inf = jnp.asarray(jnp.inf, dtype=out_refs[0].dtype)

    def body(j, carry):
        best, best_idx, *best_coords = carry
        sl = pl.ds(j * LANES, LANES)
        t = [t_refs[d][:, sl] for d in range(dim)]  # (1, LANES) each
        acc = None
        for d in range(dim):
            diff = q_refs[d][:, :] - t[d]  # (TILE_N, LANES) dual broadcast
            sq = diff * diff
            acc = sq if acc is None else acc + sq
        acc = jnp.where(tmask_ref[:, sl] != 0, acc, inf)
        # strict '<' keeps the earliest block: smallest m within this lane
        better = acc < best
        idx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, LANES), 1) + j * LANES
        out = [
            jnp.where(better, acc, best),
            jnp.where(better, idx, best_idx),
        ]
        if return_coords:
            out.extend(
                jnp.where(better, t[d], best_coords[d]) for d in range(dim)
            )
        return tuple(out)

    init = [
        jnp.full((tile_n, LANES), inf, dtype=out_refs[0].dtype),
        jnp.zeros((tile_n, LANES), dtype=jnp.int32),
    ]
    if return_coords:
        init.extend(
            jnp.zeros((tile_n, LANES), dtype=out_refs[0].dtype) for _ in range(dim)
        )
    carry = jax.lax.fori_loop(0, m_tiles, body, tuple(init))
    best, best_idx = carry[0], carry[1]

    # One cross-lane fold per tile.  Among value-ties the smallest global
    # index wins — lane order does not order m, so pick explicitly.
    min_val = jnp.min(best, axis=1, keepdims=True)  # (TILE_N, 1)
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    tied_idx = jnp.where(best == min_val, best_idx, big)
    win_idx = jnp.min(tied_idx, axis=1, keepdims=True)  # (TILE_N, 1)
    out_refs[0][:, :] = min_val
    out_refs[1][:, :] = win_idx
    if return_coords:
        onehot = (tied_idx == win_idx).astype(best.dtype)
        # exactly one lane matches; sum extracts its carried coordinate
        for d in range(dim):
            out_refs[2 + d][:, :] = jnp.sum(
                carry[2 + d] * onehot, axis=1, keepdims=True
            )


@functools.partial(
    jax.jit, static_argnames=("return_coords", "tile_n", "interpret")
)
def fused_nearest_neighbors(
    query: Array,
    targets: Array,
    target_mask: Array | None = None,
    *,
    return_coords: bool = False,
    tile_n: int = DEFAULT_TILE_N,
    interpret: bool = False,
):
    """Exact masked 1-NN ``(N, D) x (M, D) -> (sq (N,), idx (N,) [, coords (N, D)])``.

    Unbatched core; batch with ``jax.vmap``.  Bit-matches
    ``ops.nn.nearest_neighbors`` (same fp ops per pair, same tie rule);
    exactness is pinned by ``tests/test_fused_nn.py``.
    """
    n, dim = query.shape
    m = targets.shape[0]
    dtype = query.dtype

    tile_n = min(tile_n, _round_up(max(n, 8), 8))
    n_pad = _round_up(max(n, tile_n), tile_n)
    m_pad = _round_up(max(m, LANES), LANES)

    qcols = [
        jnp.zeros((n_pad, 1), dtype=dtype).at[:n, 0].set(query[:, d])
        for d in range(dim)
    ]
    trows = [
        jnp.zeros((1, m_pad), dtype=dtype).at[0, :m].set(targets[:, d])
        for d in range(dim)
    ]
    if target_mask is None:
        mask = (jnp.arange(m_pad, dtype=jnp.int32) < m).astype(jnp.int32)[None, :]
    else:
        mask = (
            jnp.zeros((m_pad,), dtype=jnp.int32)
            .at[:m]
            .set(target_mask.astype(jnp.int32))[None, :]
        )

    grid = (n_pad // tile_n,)
    kernel = functools.partial(
        _fused_nn_kernel,
        dim=dim,
        m_tiles=m_pad // LANES,
        return_coords=return_coords,
    )

    q_specs = [
        pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(dim)
    ]
    t_specs = [
        pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in range(dim)
    ]
    mask_spec = pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    n_out = 2 + (dim if return_coords else 0)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=q_specs + t_specs + [mask_spec],
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), dtype)]
        + [jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)]
        + [jax.ShapeDtypeStruct((n_pad, 1), dtype)] * (dim if return_coords else 0),
        interpret=interpret,
    )(*qcols, *trows, mask)

    sq = outs[0][:n, 0]
    idx = outs[1][:n, 0]
    if not return_coords:
        return sq, idx
    coords = jnp.stack([outs[2 + d][:n, 0] for d in range(dim)], axis=-1)
    return sq, idx, coords
