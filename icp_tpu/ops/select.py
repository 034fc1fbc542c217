"""Exact k-smallest selection without sorting or O(N^2) rank matrices.

The trim step of ``trimmed``/``feature_aware`` needs the 0/1 weight vector
selecting the ``keep`` smallest match costs with the reference's stable tie
order (``std::sort`` + resize, ``lib/icp/impl/trimmed.cpp:55-58``; ties at
the cut broken toward the lower source index, the documented within-spec rule
of :func:`icp_tpu.methods.trimmed.stable_ranks`).

Round-1 measured both portable selections on the TPU VPU: argsort-of-argsort
(sorting networks, slow) and the O(N^2) compare-count rank matrix (wins at
N <= 4096 but is a full second pass of the same block shape as the distance
matrix).  This module adds the asymptotically right tool: a **bitwise radix
binary search** for the keep-th smallest value.  IEEE-754 floats are
order-isomorphic to their sign-adjusted integer bit patterns, so 32 (64 for
f64) unrolled compare+count passes over (..., N) find the exact threshold
value ``tau``; one cumulative sum then picks the lowest-index entries among
the ties at ``tau``.  Total work O(32 N) instead of O(N^2) / O(N log^2 N),
all branch-free VPU ops — and cheap enough to run inside a Pallas kernel.

The selected set is **bit-identical** to ``stable_ranks(costs) < keep``
(property-tested across ties/inf/empty cases in ``tests/test_select.py``):
selection is combinatorial, not numeric, so this is also safe for the fp64
parity path.

Caveats: NaN costs are unsupported (the reference's ``std::sort`` has UB on
NaN anyway); -0.0 is canonicalized to +0.0 so the bit order matches float
comparison semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_UINT = {jnp.dtype(jnp.float32): jnp.uint32, jnp.dtype(jnp.float64): jnp.uint64}


def _order_preserving_bits(x: Array) -> Array:
    """Map floats to unsigned ints such that ``x < y  <=>  bits(x) < bits(y)``.

    Standard radix-sort transform: positive floats get the sign bit set,
    negative floats are bitwise-inverted.  Requires -0.0 canonicalized away
    (done by the caller) and no NaNs.
    """
    udtype = _UINT[x.dtype]
    nbits = jnp.iinfo(udtype).bits
    ub = jax.lax.bitcast_convert_type(x, udtype)
    sign = udtype(1) << (nbits - 1)
    negative = (ub & sign) != 0
    return jnp.where(negative, ~ub, ub | sign)


def kth_smallest(values: Array, k: Array) -> Array:
    """Per-row k-th smallest (1-indexed, counting duplicates) of ``values``.

    ``values``: (..., N) float32/float64, NaN-free.  ``k``: (...,) integer,
    1 <= k.  If k exceeds N the maximum representable value is returned
    (every entry then compares strictly smaller).  Exact — returns the very
    bits of the selected element.
    """
    values = jnp.where(values == 0, jnp.zeros((), dtype=values.dtype), values)
    u = _order_preserving_bits(values)
    udtype = u.dtype
    nbits = jnp.iinfo(udtype).bits
    one = jnp.asarray(1, dtype=udtype)
    k = jnp.asarray(k)

    # Invariant: count(u < lo) < k.  Descending over bits, accept a bit when
    # rejecting it would violate the invariant; the final lo is exactly the
    # bit pattern of the k-th smallest element.
    lo = jnp.zeros(values.shape[:-1], dtype=udtype)
    for bit in range(nbits - 1, -1, -1):
        cand = lo | (one << bit)
        cnt = jnp.sum(u < cand[..., None], axis=-1)
        lo = jnp.where(cnt >= k, lo, cand)
    return lo  # bit pattern in the order-preserving domain


def _bits_to_float(b: Array, dtype) -> Array:
    """Inverse of :func:`_order_preserving_bits`."""
    udtype = b.dtype
    nbits = jnp.iinfo(udtype).bits
    sign = jnp.asarray(1, dtype=udtype) << (nbits - 1)
    positive = (b & sign) != 0
    ub = jnp.where(positive, b & ~sign, ~b)
    return jax.lax.bitcast_convert_type(ub, dtype)


def kth_smallest_value(values: Array, k: Array) -> Array:
    """Per-row k-th smallest (1-indexed) as a float — ``sort(v)[..., k-1]``
    without the sort.

    Exact: returns the very bits of the selected element (modulo -0.0
    canonicalized to +0.0).  ``k > N`` returns +inf (the bit search's
    all-ones pattern would otherwise decode to NaN).  The robust methods'
    per-iteration median is this with ``k = count // 2 + 1`` (masked slots
    pushed to +inf), at O(32 N) branch-free VPU work instead of an
    O(N log^2 N) sorting network.
    """
    out = _bits_to_float(kth_smallest(values, k), values.dtype)
    overrun = jnp.asarray(k) > values.shape[-1]
    return jnp.where(overrun, jnp.asarray(jnp.inf, dtype=values.dtype), out)


def select_smallest_weights(costs: Array, keep: Array, dtype=None) -> Array:
    """0/1 weights marking the ``keep`` smallest entries per row, stable ties.

    Equals ``(stable_ranks(costs) < keep)`` exactly: entries strictly below
    the keep-th smallest value are all selected; among entries equal to it,
    the lowest indices fill the remaining quota (a stable sort's tie order).
    """
    if dtype is None:
        dtype = costs.dtype
    costs = jnp.where(costs == 0, jnp.zeros((), dtype=costs.dtype), costs)
    u = _order_preserving_bits(costs)
    tau = kth_smallest(costs, keep)[..., None]
    less = u < tau
    n_less = jnp.sum(less, axis=-1, keepdims=True)
    need = jnp.asarray(keep)[..., None] - n_less
    eq = u == tau
    before = jnp.cumsum(eq.astype(jnp.int32), axis=-1) - eq.astype(jnp.int32)
    return (less | (eq & (before < need))).astype(dtype)
