"""Exactness pins for the layout-optimized fused NN kernel (ops/fused_nn.py).

Mirrors the reference's brute-force-oracle NN exactness strategy
(``tests/test.cpp:39-81``) via the jnp path, which is itself oracle-pinned
in test_nn.py.  On CPU the kernel runs in interpret mode; indices must match
exactly (tie rule included), values to 1e-6 rtol (XLA:CPU FMA-contracts the
subtract-square-accumulate chain, interpret mode does not — same precedent
as test_io_tools.test_pallas_nn_interpret_matches_jnp).  On-chip bit
equality of values is verified by scripts/nn_layout_probe.py and recorded
in BASELINE.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icp_tpu.ops.fused_nn import fused_nearest_neighbors
from icp_tpu.ops.nn import nearest_neighbors


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize(
    "n,m,dim",
    [(7, 5, 2), (64, 129, 2), (953, 959, 2), (200, 300, 3), (1024, 700, 3)],
)
def test_matches_jnp_path(rng, n, m, dim):
    q = jnp.asarray(rng.uniform(-50, 50, (n, dim)), dtype=jnp.float32)
    t = jnp.asarray(rng.uniform(-50, 50, (m, dim)), dtype=jnp.float32)
    mask = jnp.asarray(rng.uniform(size=m) > 0.1)
    sq_r, idx_r = nearest_neighbors(q, t, mask)
    sq_f, idx_f = fused_nearest_neighbors(q, t, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(sq_f), np.asarray(sq_r), rtol=1e-6)


def test_coords_are_exact_gathers(rng):
    q = jnp.asarray(rng.uniform(-5, 5, (100, 2)), dtype=jnp.float32)
    t = jnp.asarray(rng.uniform(-5, 5, (130, 2)), dtype=jnp.float32)
    sq, idx, coords = fused_nearest_neighbors(q, t, return_coords=True, interpret=True)
    gathered = jnp.take_along_axis(t, idx[:, None], axis=0)
    # carried coordinates are copies of target rows — bit-exact, no tolerance
    np.testing.assert_array_equal(np.asarray(coords), np.asarray(gathered))


def test_tie_break_lowest_global_index(rng):
    base = rng.uniform(-5, 5, (64, 2)).astype(np.float32)
    t = jnp.asarray(np.tile(base, (16, 1)))  # every point duplicated 16x
    q = jnp.asarray(base)
    _, idx_r = nearest_neighbors(q, t, None)
    _, idx_f = fused_nearest_neighbors(q, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_r))
    assert int(jnp.max(idx_f)) < 64  # first copy wins


def test_all_targets_masked(rng):
    q = jnp.asarray(rng.uniform(-1, 1, (4, 2)), dtype=jnp.float32)
    t = jnp.asarray(rng.uniform(-1, 1, (10, 2)), dtype=jnp.float32)
    mask = jnp.zeros((10,), dtype=bool)
    sq_r, idx_r = nearest_neighbors(q, t, mask)
    sq_f, idx_f = fused_nearest_neighbors(q, t, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(sq_f), np.asarray(sq_r))  # all inf
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_r))


def test_vmap_batched(rng):
    qb = jnp.asarray(rng.uniform(-5, 5, (3, 50, 2)), dtype=jnp.float32)
    tb = jnp.asarray(rng.uniform(-5, 5, (3, 70, 2)), dtype=jnp.float32)
    mb = jnp.asarray(rng.uniform(size=(3, 70)) > 0.2)
    sq_r, idx_r = jax.vmap(lambda a, b, m: nearest_neighbors(a, b, m))(qb, tb, mb)
    sq_f, idx_f = jax.vmap(
        lambda a, b, m: fused_nearest_neighbors(a, b, m, interpret=True)
    )(qb, tb, mb)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(sq_f), np.asarray(sq_r), rtol=1e-6)
