"""Correspondence-kernel exactness tests.

Mirrors the reference k-d tree test (``tests/test.cpp:39-81``): 1000
seeded uniform random 3D points, every point queried, brute-force NN as the
oracle, exact index match required.
"""

import jax.numpy as jnp
import numpy as np

from icp_tpu.cloud import from_points
from icp_tpu.ops.nn import masked_min_with_index, nearest_neighbors, pairwise_sq_dists

from oracle import brute_nn


def test_nn_exact_1000_points(rng):
    pts = rng.uniform(-100.0, 100.0, size=(1000, 3))
    sq, idx = nearest_neighbors(jnp.asarray(pts), jnp.asarray(pts), None)
    dists, brute_idx = brute_nn(pts, pts)
    np.testing.assert_array_equal(np.asarray(idx), brute_idx)
    np.testing.assert_allclose(np.sqrt(np.asarray(sq)), dists, rtol=1e-12)


def test_nn_2d_query_vs_targets(rng):
    q = rng.normal(size=(257, 2)) * 10
    t = rng.normal(size=(129, 2)) * 10
    sq, idx = nearest_neighbors(jnp.asarray(q), jnp.asarray(t), None)
    _, brute_idx = brute_nn(q, t)
    np.testing.assert_array_equal(np.asarray(idx), brute_idx)


def test_nn_respects_target_mask(rng):
    q = rng.normal(size=(64, 2))
    cloud = from_points(rng.normal(size=(50, 2)), capacity=64, dtype=np.float64)
    # the 14 padding slots are zeros at the origin; masking must exclude them
    sq, idx = nearest_neighbors(jnp.asarray(q), cloud.points, cloud.mask)
    assert int(jnp.max(idx)) < 50
    _, brute_idx = brute_nn(q, np.asarray(cloud.points[:50]))
    np.testing.assert_array_equal(np.asarray(idx), brute_idx)


def test_nn_tie_breaks_to_lower_index():
    t = jnp.asarray([[1.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    q = jnp.asarray([[1.0, 0.0]])
    _, idx = nearest_neighbors(q, t, None)
    assert int(idx[0]) == 0


def test_nn_batched(rng):
    q = rng.normal(size=(3, 31, 2))
    t = rng.normal(size=(3, 17, 2))
    sq, idx = nearest_neighbors(jnp.asarray(q), jnp.asarray(t), None)
    for b in range(3):
        _, brute_idx = brute_nn(q[b], t[b])
        np.testing.assert_array_equal(np.asarray(idx[b]), brute_idx)


def test_pairwise_sq_dists(rng):
    a = rng.normal(size=(5, 3))
    b = rng.normal(size=(7, 3))
    d2 = pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b))
    expected = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, expected, atol=1e-12)


def test_masked_min_with_index_combiner():
    # partial results from 3 "shards", per-row
    vals = jnp.asarray([[3.0, 1.0, 2.0], [5.0, 5.0, 9.0]])
    idxs = jnp.asarray([[10, 20, 30], [40, 41, 42]])
    v, i = masked_min_with_index(vals, idxs, axis=1)
    np.testing.assert_allclose(v, [1.0, 5.0])
    np.testing.assert_array_equal(i, [20, 40])  # tie -> first shard
