"""NDT method family (net-new — no reference counterpart).

Covers the voxel-Gaussian map builder against a NumPy per-cell oracle,
lookup semantics (hits, misses, masked points, overflow), the overlapping
half-cell-shifted grids, and the method itself: transform recovery (2D/3D),
batched-vs-single equality, driver convergence, precompute reuse, and the
safeguarded line search.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy_free_rotations import rot_zyx

import icp_tpu as icp
from icp_tpu import cloud, geometry
from icp_tpu.ops.ndt import (
    build_ndt_map,
    build_overlapping_ndt_maps,
    lookup_cells,
)

DRIVER = icp.DriverConfig(
    max_iterations=60,
    angle_tolerance=1e-4,
    translation_tolerance=1e-4,
)


def room_cloud_2d(rng, n_per_wall=200, noise=0.01):
    """Points along the walls of a room — the structured workload NDT
    models (uniform volumetric clutter has no normal structure)."""
    ts = np.linspace(0.0, 1.0, n_per_wall)
    segs = [
        ((-5, -4), (5, -4)),
        ((5, -4), (5, 4)),
        ((5, 4), (-5, 4)),
        ((-5, 4), (-5, -4)),
        ((-1, -1), (2, -1)),
        ((2, -1), (2, 2)),
    ]
    walls = [
        np.stack([x0 + (x1 - x0) * ts, y0 + (y1 - y0) * ts], axis=-1)
        for (x0, y0), (x1, y1) in segs
    ]
    pts = np.concatenate(walls)
    return pts + rng.normal(0, noise, pts.shape)


def room_cloud_3d(rng, n=400, noise=0.01):
    a = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), np.zeros(n)], -1)
    b = np.stack([rng.uniform(-4, 4, n), np.full(n, -4.0), rng.uniform(0, 3, n)], -1)
    c = np.stack([np.full(n, 4.0), rng.uniform(-4, 4, n), rng.uniform(0, 3, n)], -1)
    pts = np.concatenate([a, b, c])
    return pts + rng.normal(0, noise, pts.shape)


def numpy_cell_stats(pts, cell_size):
    """Oracle: dict cell-coords -> (count, mean, cov) over all points."""
    cells = np.floor(pts / cell_size).astype(np.int64)
    out = {}
    for c in {tuple(c) for c in cells}:
        members = pts[(cells == np.asarray(c)).all(axis=1)]
        mu = members.mean(axis=0)
        d = members - mu
        out[c] = (len(members), mu, d.T @ d / len(members))
    return out


def test_build_map_stats_match_numpy(rng):
    pts = rng.uniform(-6, 6, (500, 2))
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(500, bool), 1.5, 256, min_points=1)
    oracle = numpy_cell_stats(pts, 1.5)
    got_valid = int(np.sum(np.asarray(ndt.valid)))
    assert got_valid == len(oracle)
    # Match each oracle cell to a slot via its mean's containing cell.
    means = np.asarray(ndt.means)
    counts = np.asarray(ndt.counts)
    valid = np.asarray(ndt.valid)
    for c, (cnt, mu, _cov) in oracle.items():
        hits = [
            i
            for i in range(means.shape[0])
            if valid[i] and tuple(np.floor(means[i] / 1.5).astype(np.int64)) == c
        ]
        assert len(hits) == 1
        i = hits[0]
        assert counts[i] == cnt
        np.testing.assert_allclose(means[i], mu, atol=1e-9)


def test_build_map_covariance_matches_numpy(rng):
    # One well-populated cell: covariance (pre-regularization) should agree
    # through the inverse for a well-conditioned cluster.
    pts = rng.normal(0, 0.2, (64, 2)) + 0.75  # inside cell (0, 0) of size 1.5
    ndt = build_ndt_map(
        jnp.asarray(pts), jnp.ones(64, bool), 1.5, 8, min_points=1,
        min_eigenvalue_ratio=1e-12,
    )
    valid = np.asarray(ndt.valid)
    assert valid.sum() >= 1
    i = int(np.argmax(np.asarray(ndt.counts)))
    mu = pts.mean(axis=0)
    d = pts - mu
    cov = d.T @ d / len(pts)
    np.testing.assert_allclose(
        np.asarray(ndt.inv_covs)[i], np.linalg.inv(cov), rtol=1e-6
    )


def test_build_map_covariance_far_from_origin_f32(rng):
    # Regression: the uncentered E[xx^T] - mu mu^T form cancels
    # catastrophically in f32 for cells far from the origin (~300 m with
    # 0.5 m cells: the p^2 rounding error ~1e-2 rivals the true within-cell
    # variance).  The builder accumulates second moments in a per-cell-
    # anchored frame, so the f32 map must agree with the f64 NumPy oracle
    # to f32-roundoff of the VARIANCE, not of the squared coordinates.
    center = np.asarray([300.2, -297.4])
    pts64 = center + rng.normal(0, 0.05, (128, 2))
    pts32 = jnp.asarray(pts64, jnp.float32)
    ndt = build_ndt_map(
        pts32, jnp.ones(128, bool), 0.5, 16, min_points=1,
        min_eigenvalue_ratio=1e-12,
    )
    counts = np.asarray(ndt.counts)
    valid = np.asarray(ndt.valid)
    cells64 = np.floor(pts64 / 0.5).astype(np.int64)
    # Check the best-populated cell's covariance against the f64 centered
    # oracle over the SAME membership (f32 binning may disagree with f64
    # binning for boundary points, so recompute membership in f32).
    cells32 = np.floor(np.asarray(pts32, np.float64) / 0.5).astype(np.int64)
    i = int(np.argmax(np.where(valid, counts, 0)))
    mu_i = np.asarray(ndt.means)[i]
    cell_i = tuple(np.floor(mu_i / 0.5).astype(np.int64))
    members = np.asarray(pts32, np.float64)[(cells32 == np.asarray(cell_i)).all(axis=1)]
    assert len(members) == int(counts[i]) >= 8
    d = members - members.mean(axis=0)
    oracle_cov = d.T @ d / len(members)
    got_cov = np.asarray(ndt.covs)[i]
    # Variance scale ~2.5e-3; uncentered-form error would be ~1e-2 (x4 the
    # signal); the anchored form lands within ~1e-5 absolute.
    np.testing.assert_allclose(got_cov, oracle_cov, atol=5e-5)
    rel_err = np.abs(got_cov - oracle_cov).max() / np.abs(oracle_cov).max()
    assert rel_err < 0.02, rel_err


def test_build_map_min_points_gates_cells(rng):
    # 10 points in one cell, 2 in another.
    pts = np.concatenate([rng.uniform(0.1, 0.9, (10, 2)), rng.uniform(5.1, 5.4, (2, 2))])
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(12, bool), 1.0, 8, min_points=4)
    assert int(np.sum(np.asarray(ndt.valid))) == 1
    assert int(np.asarray(ndt.counts)[np.asarray(ndt.valid)][0]) == 10


def test_build_map_masked_points_excluded(rng):
    pts = rng.uniform(0, 1, (20, 2))
    mask = jnp.arange(20) < 12
    ndt = build_ndt_map(jnp.asarray(pts), mask, 2.0, 8, min_points=1)
    assert int(np.asarray(ndt.counts).sum()) == 12
    oracle_mu = pts[:12].mean(axis=0)
    i = int(np.argmax(np.asarray(ndt.counts)))
    np.testing.assert_allclose(np.asarray(ndt.means)[i], oracle_mu, atol=1e-9)


def test_build_map_overflow_flag(rng):
    # 30 points in 30 distinct cells but capacity 4.
    pts = np.stack([np.arange(30, dtype=np.float64) * 2.0, np.zeros(30)], -1)
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(30, bool), 1.0, 4, min_points=1)
    assert bool(np.asarray(ndt.overflowed))
    ok = build_ndt_map(jnp.asarray(pts), jnp.ones(30, bool), 1.0, 32, min_points=1)
    assert not bool(np.asarray(ok.overflowed))


def test_lookup_hits_and_misses(rng):
    pts = rng.uniform(0, 1, (32, 2))  # all in cell (0, 0) at size 2
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(32, bool), 2.0, 8, min_points=1)
    q = jnp.asarray([[0.5, 0.5], [10.0, 10.0], [-0.1, 0.5]])
    means, inv_covs, hit, _ = lookup_cells(q, ndt)
    assert np.asarray(hit).tolist() == [True, False, False]
    np.testing.assert_allclose(np.asarray(means)[0], pts.mean(axis=0), atol=1e-9)


def test_overlapping_grids_shift_membership(rng):
    # A point at x=0.9 (cell size 1): grid offset 0 bins it to cell 0,
    # grid offset 0.5 bins it to cell 1 — the half-shift changes membership.
    pts = np.asarray([[0.9, 0.9]] * 8) + rng.normal(0, 0.01, (8, 2))
    maps = build_overlapping_ndt_maps(jnp.asarray(pts), jnp.ones(8, bool), 1.0, 8, min_points=1)
    assert maps.keys.shape[0] == 4  # 2^D grids
    offs = np.asarray(maps.offset)
    assert {tuple(o) for o in offs} == {(0.0, 0.0), (0.0, 0.5), (0.5, 0.0), (0.5, 0.5)}
    for g in range(4):
        grid = jax.tree.map(lambda x: x[g], maps)
        _, _, hit, _ = lookup_cells(jnp.asarray(pts), grid)
        assert bool(np.all(np.asarray(hit)))


def test_regularized_inverse_conditions_thin_cells(rng):
    # Collinear points: raw covariance is singular; the regularized inverse
    # must be finite with eigenvalue ratio bounded by 1/min_ratio.
    x = np.linspace(0.0, 0.9, 16)
    pts = np.stack([x, np.full(16, 0.5)], -1)
    ndt = build_ndt_map(
        jnp.asarray(pts), jnp.ones(16, bool), 1.0, 4, min_points=1,
        min_eigenvalue_ratio=1e-2,
    )
    i = int(np.argmax(np.asarray(ndt.counts)))
    ic = np.asarray(ndt.inv_covs)[i]
    assert np.all(np.isfinite(ic))
    w = np.linalg.eigvalsh(ic)
    assert w.max() / w.min() <= 1e2 * (1 + 1e-6)


@pytest.mark.parametrize("dim", [2, 3])
def test_ndt_recovers_transform(rng, dim):
    if dim == 2:
        a_pts = room_cloud_2d(rng)
        true = geometry.from_angle_2d(np.float64(0.12), np.array([0.4, -0.3]))
        cfg = icp.Config()
    else:
        a_pts = room_cloud_3d(rng)
        r = rot_zyx(0.05, -0.04, 0.1)
        true = geometry.RigidTransform(jnp.asarray(r), jnp.asarray([0.3, -0.2, 0.15]))
        cfg = icp.Config(cells=512)
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))

    method = icp.from_method("ndt", dim, cfg)
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    result, _ = icp.converge(method, src, tgt, geometry.identity(dim, dtype=src.dtype), DRIVER)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(true.translation), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), np.asarray(true.rotation), atol=5e-3
    )


def test_ndt_batched_matches_single(rng):
    a_pts = room_cloud_2d(rng, n_per_wall=100)
    angles = [0.05, 0.1, -0.08]
    singles = []
    srcs, tgts = [], []
    method = icp.from_method("ndt", 2)
    for ang in angles:
        true = geometry.from_angle_2d(np.float64(ang), np.array([0.2, -0.1]))
        b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
        src = cloud.from_points(jnp.asarray(a_pts))
        tgt = cloud.from_points(jnp.asarray(b_pts))
        srcs.append(src)
        tgts.append(tgt)
        res, _ = icp.converge(method, src, tgt, geometry.identity(2, dtype=src.dtype), DRIVER)
        singles.append(res)
    batch_src = cloud.stack(srcs)
    batch_tgt = cloud.stack(tgts)
    res_b, _ = icp.converge(
        method,
        batch_src,
        batch_tgt,
        geometry.identity(2, batch_shape=(3,), dtype=batch_src.dtype),
        DRIVER,
    )
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(res_b.transform.translation)[i],
            np.asarray(singles[i].transform.translation),
            atol=1e-9,
        )
        assert int(np.asarray(res_b.iteration_count)[i]) == int(
            np.asarray(singles[i].iteration_count)
        )


def test_ndt_precompute_reuse_matches_init(rng):
    a_pts = room_cloud_2d(rng, n_per_wall=100)
    true = geometry.from_angle_2d(np.float64(0.1), np.array([0.2, -0.1]))
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    method = icp.from_method("ndt", 2)
    maps_b = method.precompute(tgt)
    reuse = method.with_precomputed(None, maps_b)
    guess = geometry.identity(2, dtype=src.dtype)
    st0 = method.init(src, tgt, guess)
    st1 = reuse.init(src, tgt, guess)
    np.testing.assert_array_equal(np.asarray(st0.match_cost), np.asarray(st1.match_cost))
    r0, _ = icp.converge(method, src, tgt, guess, DRIVER)
    r1, _ = icp.converge(reuse, src, tgt, guess, DRIVER)
    np.testing.assert_array_equal(
        np.asarray(r0.transform.translation), np.asarray(r1.transform.translation)
    )


def test_ndt_line_search_never_worse(rng):
    """With line_search on, the scored objective is non-increasing across
    iterations under fixed maps (zero-step safeguard)."""
    a_pts = room_cloud_2d(rng, n_per_wall=100)
    true = geometry.from_angle_2d(np.float64(0.2), np.array([0.5, -0.4]))
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    method = icp.from_method("ndt", 2)
    st = method.init(src, tgt, geometry.identity(2, dtype=src.dtype))
    prev = float(method.cost(st))
    for _ in range(15):
        st = method.iterate(st)
        cur = float(method.cost(st))
        assert cur <= prev + 1e-12
        prev = cur


def test_ndt_no_overlap_single_grid_converges(rng):
    a_pts = room_cloud_2d(rng)
    true = geometry.from_angle_2d(np.float64(0.08), np.array([0.2, -0.15]))
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    method = icp.from_method("ndt", 2, icp.Config(overlap=0))
    st = method.init(src, tgt, geometry.identity(2, dtype=src.dtype))
    assert st.maps.keys.shape[0] == 1
    result, _ = icp.converge(method, src, tgt, geometry.identity(2, dtype=src.dtype), DRIVER)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(true.translation), atol=1e-2
    )


def test_ndt_points_outside_map_are_harmless(rng):
    """Source points falling in no occupied cell contribute deficit 1 and
    zero gradient — no NaNs, and the aligned subset still converges."""
    a_pts = room_cloud_2d(rng, n_per_wall=100)
    outliers = rng.uniform(50, 60, (50, 2))
    a_all = np.concatenate([a_pts, outliers])
    true = geometry.from_angle_2d(np.float64(0.1), np.array([0.3, -0.2]))
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    src = cloud.from_points(jnp.asarray(a_all))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    method = icp.from_method("ndt", 2)
    result, fstate = icp.converge(method, src, tgt, geometry.identity(2, dtype=src.dtype), DRIVER)
    assert np.all(np.isfinite(np.asarray(result.transform.translation)))
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(true.translation), atol=5e-3
    )
    # The state records the miss as the full deficit.
    cost = np.asarray(fstate.match_cost)
    n_real = a_all.shape[0]
    assert np.all(cost[a_pts.shape[0]:n_real] == 1.0)


def test_ndt_registered_both_dims():
    assert icp.is_method_registered("ndt", 2)
    assert icp.is_method_registered("ndt", 3)
    assert "ndt" in icp.registered_methods(2)
    state_has_no_matches = icp.from_method("ndt", 2)
    a = cloud.from_points(jnp.asarray(np.zeros((4, 2))))
    st = state_has_no_matches.init(a, a, geometry.identity(2, dtype=a.dtype))
    from icp_tpu.methods import get_matches

    assert get_matches(st) is None


def test_lookup_dense_matches_sorted(rng):
    """lookup_cells_dense is the MXU formulation of lookup_cells: hits,
    indices, and selected statistics identical (misses return zero stats
    instead of an arbitrary slot's — callers weight both by hit)."""
    from icp_tpu.ops.ndt import lookup_cells_dense

    pts = rng.uniform(-6, 6, (400, 2))
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(400, bool), 1.5, 128, min_points=2)
    q = jnp.asarray(rng.uniform(-8, 8, (200, 2)))
    m_s, ic_s, hit_s, idx_s = lookup_cells(q, ndt)
    m_d, ic_d, hit_d, idx_d = lookup_cells_dense(q, ndt)
    np.testing.assert_array_equal(np.asarray(hit_s), np.asarray(hit_d))
    h = np.asarray(hit_s)
    np.testing.assert_array_equal(np.asarray(idx_s)[h], np.asarray(idx_d)[h])
    np.testing.assert_array_equal(np.asarray(m_s)[h], np.asarray(m_d)[h])
    np.testing.assert_array_equal(np.asarray(ic_s)[h], np.asarray(ic_d)[h])
    assert np.all(np.asarray(m_d)[~h] == 0.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_ndt_dense_and_sorted_converge_identically(rng, dim):
    """The two lookups select identical statistics (op-level test above);
    the surrounding XLA fusion differs (matmul-fed vs gather-fed einsums
    may associate reductions differently), so assert tight numerical
    agreement rather than bitwise, plus recovery of truth.  (A looser
    3e-3 version of this test masked a real bug once — the mid-table
    sentinel that broke searchsorted ordering — keep this tolerance
    TIGHT.)"""
    if dim == 2:
        a_pts = room_cloud_2d(rng, n_per_wall=100)
        true = geometry.from_angle_2d(np.float64(0.1), np.array([0.3, -0.2]))
    else:
        a_pts = room_cloud_3d(rng, n=300)
        r = rot_zyx(0.04, -0.03, 0.08)
        true = geometry.RigidTransform(jnp.asarray(r), jnp.asarray([0.2, -0.1, 0.1]))
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    guess = geometry.identity(dim, dtype=src.dtype)
    cells = 512 if dim == 3 else 256
    res = {}
    for lk in ("dense", "sorted"):
        method = icp.from_method("ndt", dim, icp.Config(lookup=lk, cells=cells))
        res[lk], _ = icp.converge(method, src, tgt, guess, DRIVER)
    np.testing.assert_allclose(
        np.asarray(res["dense"].transform.translation),
        np.asarray(res["sorted"].transform.translation),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(res["dense"].transform.rotation),
        np.asarray(res["sorted"].transform.rotation),
        atol=1e-9,
    )
    for lk in ("dense", "sorted"):
        np.testing.assert_allclose(
            np.asarray(res[lk].transform.translation),
            np.asarray(true.translation),
            atol=5e-3,
        )


def test_ndt_lookup_config_validated():
    with pytest.raises(ValueError):
        icp.from_method("ndt", 2, icp.Config(lookup="hash"))


def test_invalid_mid_table_cell_keeps_keys_sorted(rng):
    """Regression: an underpopulated cell in the MIDDLE of the key range
    must keep its real key — a sentinel there broke searchsorted's
    ascending-order contract and silently lost every later cell's matches
    (caught on queen.ply: 187 vs 3480 hits)."""
    # Cells along x: 0 (dense), 1 (two points -> invalid), 2 (dense).
    pts = np.concatenate([
        rng.uniform(0.05, 0.95, (20, 1)),
        rng.uniform(1.05, 1.45, (2, 1)),
        rng.uniform(2.05, 2.95, (20, 1)),
    ])
    pts = np.concatenate([pts, np.full_like(pts, 0.5)], axis=1)
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(42, bool), 1.0, 8, min_points=4)
    keys = np.asarray(ndt.keys).astype(np.int64)
    assert np.all(np.diff(keys) >= 0), keys
    q = jnp.asarray([[0.5, 0.5], [1.2, 0.5], [2.5, 0.5]])
    from icp_tpu.ops.ndt import lookup_cells_dense

    _, _, hit_s, idx_s = lookup_cells(q, ndt)
    _, _, hit_d, idx_d = lookup_cells_dense(q, ndt)
    assert np.asarray(hit_s).tolist() == [True, False, True]
    np.testing.assert_array_equal(np.asarray(hit_s), np.asarray(hit_d))
    np.testing.assert_array_equal(np.asarray(idx_s)[[0, 2]], np.asarray(idx_d)[[0, 2]])


def test_ndt_covs_field_inverts(rng):
    """NdtMap.covs is the regularized forward covariance: covs @ inv_covs
    = I on valid cells (the D2D variant consumes the forward form)."""
    pts = rng.uniform(-6, 6, (400, 2))
    ndt = build_ndt_map(jnp.asarray(pts), jnp.ones(400, bool), 1.5, 128, min_points=4)
    v = np.asarray(ndt.valid)
    prod = np.einsum("vij,vjk->vik", np.asarray(ndt.covs)[v], np.asarray(ndt.inv_covs)[v])
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(2), prod.shape), atol=1e-8)


@pytest.mark.parametrize("dim", [2, 3])
def test_ndt_d2d_recovers_transform(rng, dim):
    """D2D: source Gaussians vs target Gaussians recover the transform."""
    if dim == 2:
        a_pts = room_cloud_2d(rng)
        true = geometry.from_angle_2d(np.float64(0.1), np.array([0.35, -0.25]))
        cfg = icp.Config(variant="d2d")
    else:
        a_pts = room_cloud_3d(rng)
        r = rot_zyx(0.05, -0.04, 0.08)
        true = geometry.RigidTransform(jnp.asarray(r), jnp.asarray([0.25, -0.2, 0.1]))
        cfg = icp.Config(variant="d2d", cells=512)
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    method = icp.from_method("ndt", dim, cfg)
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    result, _ = icp.converge(method, src, tgt, geometry.identity(dim, dtype=src.dtype), DRIVER)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), np.asarray(true.translation), atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), np.asarray(true.rotation), atol=1e-2
    )


def test_ndt_d2d_precompute_reuse(rng):
    a_pts = room_cloud_2d(rng, n_per_wall=100)
    true = geometry.from_angle_2d(np.float64(0.08), np.array([0.2, -0.1]))
    b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
    src = cloud.from_points(jnp.asarray(a_pts))
    tgt = cloud.from_points(jnp.asarray(b_pts))
    method = icp.from_method("ndt", 2, icp.Config(variant="d2d"))
    maps_a = method.precompute(src)
    maps_b = method.precompute(tgt)
    reuse = method.with_precomputed(maps_a, maps_b)
    guess = geometry.identity(2, dtype=src.dtype)
    r0, _ = icp.converge(method, src, tgt, guess, DRIVER)
    r1, _ = icp.converge(reuse, src, tgt, guess, DRIVER)
    np.testing.assert_array_equal(
        np.asarray(r0.transform.translation), np.asarray(r1.transform.translation)
    )
    with pytest.raises(ValueError):
        method.with_precomputed(None, maps_b)


def test_ndt_d2d_batched_matches_single(rng):
    a_pts = room_cloud_2d(rng, n_per_wall=100)
    method = icp.from_method("ndt", 2, icp.Config(variant="d2d"))
    singles, srcs, tgts = [], [], []
    for ang in (0.05, -0.07):
        true = geometry.from_angle_2d(np.float64(ang), np.array([0.15, -0.1]))
        b_pts = np.asarray(geometry.apply(true, jnp.asarray(a_pts)))
        src = cloud.from_points(jnp.asarray(a_pts))
        tgt = cloud.from_points(jnp.asarray(b_pts))
        srcs.append(src); tgts.append(tgt)
        res, _ = icp.converge(method, src, tgt, geometry.identity(2, dtype=src.dtype), DRIVER)
        singles.append(res)
    res_b, _ = icp.converge(
        method, cloud.stack(srcs), cloud.stack(tgts),
        geometry.identity(2, batch_shape=(2,), dtype=srcs[0].dtype), DRIVER,
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(res_b.transform.translation)[i],
            np.asarray(singles[i].transform.translation),
            atol=1e-9,
        )


def test_ndt_variant_validated():
    with pytest.raises(ValueError):
        icp.from_method("ndt", 2, icp.Config(variant="p2p"))


@pytest.mark.parametrize("dim", [2, 3])
def test_inverse_small_spd_matches_numpy(rng, dim):
    """Closed-form adjugate inverse (the D2D hot path — jnp.linalg.inv's
    batched LU measured 60x slower on TPU) matches numpy on SPD input."""
    from icp_tpu.ops.ndt import inverse_small_spd

    a = rng.normal(size=(200, dim, dim))
    spd = np.einsum("nij,nkj->nik", a, a) + 0.1 * np.eye(dim)
    got = np.asarray(inverse_small_spd(jnp.asarray(spd)))
    np.testing.assert_allclose(got, np.linalg.inv(spd), rtol=1e-10, atol=1e-12)
    with pytest.raises(ValueError):
        inverse_small_spd(jnp.eye(4))
