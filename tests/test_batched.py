"""Batched multi-pair registration — the framework's DP axis.

The reference registers one pair per process; here a leading batch dimension
registers whole fleets of scan pairs in one compiled program.  These tests
pin the batched-vs-single equivalence contract for methods and ops (the
driver-level equivalence lives in ``test_driver.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np

import icp_tpu as icp
from icp_tpu.ops.nn import nearest_neighbors


def _random_batch(rng, batch, n, m, dim=2):
    a = rng.uniform(-30, 30, (batch, n, dim))
    b = rng.uniform(-30, 30, (batch, m, dim))
    return a, b


def test_batched_nn_matches_per_pair(rng):
    a, b = _random_batch(rng, 5, 33, 41)
    sq_b, idx_b = nearest_neighbors(jnp.asarray(a), jnp.asarray(b))
    for k in range(5):
        sq, idx = nearest_neighbors(jnp.asarray(a[k]), jnp.asarray(b[k]))
        np.testing.assert_array_equal(np.asarray(idx_b[k]), np.asarray(idx))
        np.testing.assert_allclose(np.asarray(sq_b[k]), np.asarray(sq))


def test_batched_method_iterate_matches_single(rng):
    batch = 6
    a_pts = rng.uniform(-30, 30, (batch, 24, 2))
    b_pts = rng.uniform(-30, 30, (batch, 28, 2))
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.8))

    a_clouds = [icp.from_points(a_pts[k], capacity=24, dtype=np.float64) for k in range(batch)]
    b_clouds = [icp.from_points(b_pts[k], capacity=28, dtype=np.float64) for k in range(batch)]
    a_batch, b_batch = icp.stack(a_clouds), icp.stack(b_clouds)

    state = method.init(a_batch, b_batch, icp.identity(2, (batch,), dtype=np.float64))
    for _ in range(4):
        state = method.iterate(state)

    for k in range(batch):
        s = method.init(a_clouds[k], b_clouds[k], icp.identity(2, dtype=np.float64))
        for _ in range(4):
            s = method.iterate(s)
        np.testing.assert_allclose(
            np.asarray(state.transform.rotation[k]),
            np.asarray(s.transform.rotation),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(state.transform.translation[k]),
            np.asarray(s.transform.translation),
            atol=1e-10,
        )


def test_vmap_over_converge(rng):
    """`converge` composes with an outer vmap (alternative batching route) —
    while_loop under vmap runs all lanes to the collective fixpoint but
    per-lane freezing keeps the results exact."""
    batch = 3
    a_pts = rng.uniform(-20, 20, (batch, 16, 2)).astype(np.float64)
    shift = rng.uniform(-3, 3, (batch, 1, 2))
    b_pts = a_pts + shift

    # ``trimmed`` tracks correspondences across iterations (``vanilla``'s
    # fixed-matches quirk cannot recover multi-unit shifts by design).
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-4, translation_tolerance=1e-4)

    def one(a, b):
        cloud_a = icp.PointCloud(a, jnp.asarray(16, dtype=jnp.int32))
        cloud_b = icp.PointCloud(b, jnp.asarray(16, dtype=jnp.int32))
        result, _ = icp.converge(method, cloud_a, cloud_b, icp.identity(2, dtype=jnp.float64), cfg)
        return result.transform.translation

    got = jax.vmap(one)(jnp.asarray(a_pts), jnp.asarray(b_pts))
    np.testing.assert_allclose(np.asarray(got), shift[:, 0, :], atol=0.3)
