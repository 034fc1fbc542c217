"""Grid-accelerated radius-gated exact NN (`ops/grid_nn.py`).

Exactness is the whole contract: wherever the true NN lies within
``cell_size``, the grid answer must equal the brute-force
`ops.nn.nearest_neighbors` answer BITWISE (same squared distance, same
lowest-index tie winner).  These tests pin that against random clouds,
duplicates (ties), masks, 2D/3D, jit, and the overflow flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_tpu.ops.grid_nn import build_grid, grid_nearest_neighbors
from icp_tpu.ops.nn import nearest_neighbors


def _check_exact(query, targets, mask, cell, cap, expect_overflow=False):
    grid = build_grid(jnp.asarray(targets), None if mask is None else jnp.asarray(mask), cell)
    sq_g, idx_g, overflow = grid_nearest_neighbors(jnp.asarray(query), grid, cap)
    assert bool(overflow) == expect_overflow
    if expect_overflow:
        return
    sq_b, idx_b = nearest_neighbors(
        jnp.asarray(query), jnp.asarray(targets),
        None if mask is None else jnp.asarray(mask),
    )
    sq_b = np.asarray(sq_b)
    idx_b = np.asarray(idx_b)
    inside = sq_b <= cell * cell
    np.testing.assert_array_equal(np.asarray(sq_g)[inside], sq_b[inside])
    np.testing.assert_array_equal(np.asarray(idx_g)[inside], idx_b[inside])
    # Outside the radius: the gate semantics (inf, 0).
    assert np.all(np.isinf(np.asarray(sq_g)[~inside]))
    assert np.all(np.asarray(idx_g)[~inside] == 0)


@pytest.mark.parametrize("dim", [2, 3])
def test_matches_brute_force_random(rng, dim):
    query = rng.uniform(-10, 10, (257, dim))
    targets = rng.uniform(-10, 10, (511, dim))
    _check_exact(query, targets, None, cell=2.0, cap=64)


@pytest.mark.parametrize("dim", [2, 3])
def test_masked_targets_excluded(rng, dim):
    query = rng.uniform(-5, 5, (100, dim))
    targets = rng.uniform(-5, 5, (300, dim))
    mask = rng.random(300) > 0.4
    _check_exact(query, targets, mask, cell=1.5, cap=64)


def test_tie_breaks_to_lowest_index(rng):
    base = rng.uniform(-3, 3, (40, 3))
    targets = np.concatenate([base, base, base])  # exact duplicates
    query = base.copy()  # every query has 3 tied winners
    _check_exact(query, targets, None, cell=1.0, cap=160)


def test_sparse_far_queries_return_gate(rng):
    targets = rng.uniform(-1, 1, (64, 3))
    query = rng.uniform(50, 60, (16, 3))  # nothing within the radius
    grid = build_grid(jnp.asarray(targets), None, 1.0)
    sq, idx, overflow = grid_nearest_neighbors(jnp.asarray(query), grid, 64)
    assert not bool(overflow)
    assert np.all(np.isinf(np.asarray(sq)))
    assert np.all(np.asarray(idx) == 0)


def test_overflow_flag_fires(rng):
    # Cluster at a CELL CENTER (0.5^D) so all 100 points share one cell.
    targets = np.full((100, 3), 0.5) + rng.normal(0, 0.01, (100, 3))
    query = np.full((4, 3), 0.5)
    _check_exact(query, targets, None, cell=1.0, cap=32, expect_overflow=True)
    # And with enough capacity the same data is exact.
    _check_exact(query, targets, None, cell=1.0, cap=128)


def test_jit_and_fp32(rng):
    """fp32 under jit: the gated answers agree with the jitted brute force
    to fp32 fusion tolerance (XLA may fuse the subtract-square-accumulate
    chains with FMA differently across programs, so exact bit-identity is a
    same-compilation-mode property; fp64 bit-identity is pinned above)."""
    query = rng.uniform(-8, 8, (128, 3)).astype(np.float32)
    targets = rng.uniform(-8, 8, (400, 3)).astype(np.float32)
    grid = build_grid(jnp.asarray(targets), None, 1.0)
    sq_g, idx_g, overflow = jax.jit(
        lambda q, g: grid_nearest_neighbors(q, g, 32)
    )(jnp.asarray(query), grid)
    assert not bool(overflow)
    sq_b, idx_b = jax.jit(nearest_neighbors)(jnp.asarray(query), jnp.asarray(targets))
    sq_b = np.asarray(sq_b)
    # Compare away from the gate boundary (fusion-level fp32 differences
    # can flip inside/outside within ~1e-6 of the threshold).
    inside = sq_b <= 1.0 - 1e-4
    np.testing.assert_allclose(
        np.asarray(sq_g)[inside], sq_b[inside], rtol=1e-6, atol=1e-6
    )
    agree = np.asarray(idx_g)[inside] == np.asarray(idx_b)[inside]
    assert agree.mean() > 0.99  # fp32 near-ties may pick either twin


def test_seq3d_scan_pair_exact():
    """Real data: one seq3d sweep pair at max_distance=1.0 — the gated grid
    answer equals the gated brute-force answer everywhere."""
    import os

    import icp_tpu as icp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a = icp.read_ply(os.path.join(repo, "ex_data", "seq3d", "sweep_000.ply"))
    b = icp.read_ply(os.path.join(repo, "ex_data", "seq3d", "sweep_001.ply"))
    query = jnp.asarray(a.astype(np.float32))
    targets = jnp.asarray(b.astype(np.float32))
    grid = build_grid(targets, None, 1.0)
    sq_g, idx_g, overflow = grid_nearest_neighbors(query, grid, 128)
    assert not bool(overflow)
    sq_b, idx_b = nearest_neighbors(query, targets)
    inside = np.asarray(sq_b) <= 1.0
    assert inside.mean() > 0.9  # consecutive sweeps mostly overlap
    np.testing.assert_array_equal(np.asarray(sq_g)[inside], np.asarray(sq_b)[inside])
    np.testing.assert_array_equal(np.asarray(idx_g)[inside], np.asarray(idx_b)[inside])
