"""Radix-select vs stable-rank trim selection: exact set equality.

The radix path (``ops/select.py``) must reproduce ``stable_ranks < keep``
bit-for-bit — selection is combinatorial, so these are equality tests, not
tolerance tests.  Adversarial cases target the tie and padding semantics the
reference's sort-and-resize trim defines (``lib/icp/impl/trimmed.cpp:55-58``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icp_tpu.methods.trimmed import stable_ranks, trim_weights
from icp_tpu.ops.select import kth_smallest, select_smallest_weights


def rank_weights(costs, keep):
    ranks = stable_ranks(jnp.asarray(costs))
    return (ranks < jnp.asarray(keep)[..., None]).astype(jnp.float32)


def assert_same_selection(costs, keep):
    got = select_smallest_weights(jnp.asarray(costs), jnp.asarray(keep), jnp.float32)
    want = rank_weights(costs, keep)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 7, 64, 257])
def test_random_unique(seed, n):
    rng = np.random.default_rng(seed)
    costs = rng.uniform(0, 100, (4, n)).astype(np.float32)
    keep = rng.integers(1, n + 1, (4,))
    assert_same_selection(costs, keep)


def test_massive_ties():
    rng = np.random.default_rng(3)
    # Quantized costs: long runs of exact duplicates straddling the cut.
    costs = (rng.integers(0, 5, (8, 96)) * 0.25).astype(np.float32)
    for keep in [1, 2, 47, 48, 49, 95, 96]:
        assert_same_selection(costs, np.full((8,), keep))


def test_inf_padding_ranks_last():
    costs = np.array([[3.0, np.inf, 1.0, np.inf, 2.0, np.inf]], dtype=np.float32)
    for keep in [1, 2, 3, 4, 5, 6]:
        assert_same_selection(costs, np.array([keep]))


def test_all_inf():
    costs = np.full((2, 5), np.inf, dtype=np.float32)
    assert_same_selection(costs, np.array([1, 3]))


def test_zeros_and_negative_zero():
    # -0.0 must behave as +0.0 (float compare semantics, not bit order).
    costs = np.array([[0.0, -0.0, 0.0, 1.0, -0.0]], dtype=np.float32)
    for keep in [1, 2, 3, 4, 5]:
        assert_same_selection(costs, np.array([keep]))


def test_negative_costs():
    # Not produced by the ICP methods, but the op is documented total-order.
    rng = np.random.default_rng(4)
    costs = rng.uniform(-50, 50, (3, 33)).astype(np.float32)
    costs[0, :7] = -7.25
    for keep in [1, 5, 17, 33]:
        assert_same_selection(costs, np.full((3,), keep))


def test_float64_exact():
    rng = np.random.default_rng(5)
    costs = rng.uniform(0, 1, (4, 129)).astype(np.float64)
    costs[:, ::3] = costs[:, 1::3][:, : costs[:, ::3].shape[1]]  # inject ties
    keep = np.array([1, 43, 86, 129])
    got = select_smallest_weights(jnp.asarray(costs), jnp.asarray(keep), jnp.float64)
    want = (stable_ranks(jnp.asarray(costs)) < jnp.asarray(keep)[..., None]).astype(
        jnp.float64
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kth_smallest_matches_sort():
    rng = np.random.default_rng(6)
    vals = rng.uniform(0, 10, (5, 77)).astype(np.float32)
    vals[:, 10:20] = vals[:, :10]  # duplicates
    k = np.array([1, 5, 38, 76, 77])
    tau_bits = kth_smallest(jnp.asarray(vals), jnp.asarray(k))
    srt = np.sort(vals, axis=-1)
    expect = srt[np.arange(5), k - 1]
    from icp_tpu.ops.select import _order_preserving_bits

    expect_bits = _order_preserving_bits(jnp.asarray(expect))
    np.testing.assert_array_equal(np.asarray(tau_bits), np.asarray(expect_bits))


def test_kth_exceeds_n():
    vals = jnp.asarray(np.array([[1.0, 2.0]], dtype=np.float32))
    w = select_smallest_weights(vals, jnp.asarray([5]), jnp.float32)
    np.testing.assert_array_equal(np.asarray(w), [[1.0, 1.0]])


def test_trim_weights_radix_mode_equals_rank_mode():
    rng = np.random.default_rng(7)
    costs = rng.uniform(0, 4, (6, 128)).astype(np.float32)
    costs[:, 100:] = np.inf  # padded slots
    count = jnp.asarray(np.full((6,), 100, dtype=np.int32))
    for rate in [0.1, 0.5, 0.9, 1.0]:
        w_rank = trim_weights(costs, count, rate, jnp.float32, selector="rank")
        w_radix = trim_weights(costs, count, rate, jnp.float32, selector="radix")
        np.testing.assert_array_equal(np.asarray(w_rank), np.asarray(w_radix))


def test_jit_and_vmap():
    rng = np.random.default_rng(8)
    costs = jnp.asarray(rng.uniform(0, 1, (4, 64)).astype(np.float32))
    keep = jnp.asarray([1, 16, 32, 64])
    direct = select_smallest_weights(costs, keep, jnp.float32)
    jitted = jax.jit(lambda c, k: select_smallest_weights(c, k, jnp.float32))(
        costs, keep
    )
    vmapped = jax.vmap(lambda c, k: select_smallest_weights(c, k, jnp.float32))(
        costs, keep
    )
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(jitted))
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(vmapped))


def test_kth_smallest_value_matches_sort():
    """kth_smallest_value == sort(v)[k-1] bitwise, incl. negatives/inf/f64
    (it backs the robust methods' per-iteration masked median)."""
    from icp_tpu.ops.select import kth_smallest_value

    rng = np.random.default_rng(11)
    for dtype in (np.float32, np.float64):
        vals = rng.normal(0, 5, (5, 97)).astype(dtype)
        vals[:, 90:] = np.inf  # masked-slot convention
        vals[0, :3] = [0.0, -0.0, 2.0]  # -0.0 canonicalization
        v = jnp.asarray(vals)
        ref = np.sort(vals, axis=-1)
        for k in (1, 2, 48, 90, 97):
            got = np.asarray(kth_smallest_value(v, jnp.asarray(k)))
            np.testing.assert_array_equal(got, ref[:, k - 1])


def test_masked_median_radix_equals_sort_path():
    from icp_tpu.methods.robust import masked_median

    rng = np.random.default_rng(12)
    vals = jnp.asarray(rng.uniform(0, 9, (7, 64)))
    mask = jnp.asarray(rng.uniform(size=(7, 64)) > 0.3)
    got = np.asarray(masked_median(vals, mask))
    big = jnp.asarray(np.inf, dtype=vals.dtype)
    v = np.sort(np.asarray(jnp.where(mask, vals, big)), axis=-1)
    count = np.asarray(jnp.sum(mask, axis=-1))
    expect = v[np.arange(7), np.maximum(count // 2, 0)]
    np.testing.assert_array_equal(got, expect)


def test_kth_smallest_value_k_exceeds_n_is_inf():
    from icp_tpu.ops.select import kth_smallest_value

    v = jnp.asarray(np.array([[1.0, 2.0, 3.0]], dtype=np.float32))
    got = np.asarray(kth_smallest_value(v, jnp.asarray(5)))
    assert np.all(np.isinf(got)) and np.all(got > 0)
