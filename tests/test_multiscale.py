"""Multiscale (coarse-to-fine) registration tests."""

import os

import jax.numpy as jnp
import numpy as np

import icp_tpu as icp
from icp_tpu.multiscale import converge_multiscale, decimate


def test_decimate_counts():
    c = icp.from_points(np.random.default_rng(0).uniform(-5, 5, (100, 2)), capacity=104)
    d = decimate(c, 4)
    assert d.capacity == 26
    assert int(d.count) == 25  # ceil(100/4)
    np.testing.assert_allclose(np.asarray(d.points[0]), np.asarray(c.points[0]))


def test_multiscale_matches_tolerances(rng):
    """Multiscale reaches the same tolerances; final refinement is full-res."""
    a_pts = rng.uniform(-30, 30, (800, 2))
    ang = 0.25
    c, s = np.cos(ang), np.sin(ang)
    b_pts = a_pts @ np.array([[c, s], [-s, c]]) + [2.0, -1.0]
    a = icp.from_points(a_pts, capacity=800, dtype=np.float64)
    b = icp.from_points(b_pts, capacity=800, dtype=np.float64)

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5)

    r_full, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)
    r_ms, _ = converge_multiscale(
        method, a, b, icp.identity(2, dtype=np.float64), cfg, factors=(8, 2)
    )
    # Same pose up to the tolerance scale.
    np.testing.assert_allclose(
        np.asarray(r_ms.transform.translation),
        np.asarray(r_full.transform.translation),
        atol=1e-3,
    )
    # Full-res refinement needs fewer iterations than from-identity.
    assert int(r_ms.iteration_count) <= int(r_full.iteration_count)


def test_multiscale_batched(rng):
    import jax.numpy as jnp

    batch = 3
    a_pts = rng.uniform(-20, 20, (batch, 256, 2)).astype(np.float32)
    shift = rng.uniform(-1, 1, (batch, 1, 2)).astype(np.float32)
    b_pts = a_pts + shift
    a = icp.PointCloud(jnp.asarray(a_pts), jnp.full((batch,), 256, jnp.int32))
    b = icp.PointCloud(jnp.asarray(b_pts), jnp.full((batch,), 256, jnp.int32))
    method = icp.from_method("robust", 2)
    cfg = icp.DriverConfig(max_iterations=40, angle_tolerance=1e-4, translation_tolerance=1e-4)
    r, _ = converge_multiscale(
        method, a, b, icp.identity(2, (batch,), dtype=jnp.float32), cfg, factors=(4,)
    )
    np.testing.assert_allclose(
        np.asarray(r.transform.translation), shift[:, 0], atol=0.05
    )


def test_multiscale_3d_well_conditioned(rng):
    """3D pyramid on dense structured data matches the full run.

    (On sparse or heavily decimated 3D geometry the coarse level can settle
    in a DIFFERENT local basin than the from-identity run — a documented
    caveat in icp_tpu/multiscale.py; multiscale is an accelerator for
    well-conditioned problems, not a robustness feature.)
    """
    # Non-periodic structure (periodic surfaces alias under decimation).
    a_pts = rng.uniform(-6, 6, (1200, 3)) * np.array([1.0, 0.7, 0.4])
    from scipy_free_rotations import rot_zyx

    rot = rot_zyx(0.05, 0.04, 0.08)
    b_pts = a_pts @ rot.T + [0.3, -0.2, 0.1]
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    method = icp.from_method("trimmed", 3, icp.Config(max_distance=5.0))
    cfg = icp.DriverConfig(max_iterations=80, angle_tolerance=1e-5, translation_tolerance=1e-5)

    r_full, _ = icp.converge(method, a, b, icp.identity(3, dtype=np.float64), cfg)
    r_ms, _ = converge_multiscale(
        method, a, b, icp.identity(3, dtype=np.float64), cfg, factors=(4,)
    )
    np.testing.assert_allclose(
        np.asarray(r_ms.transform.translation),
        np.asarray(r_full.transform.translation),
        atol=5e-3,
    )


def test_ndt_multiscale_widens_basin_and_cuts_fine_iterations():
    """NDT coarse-to-fine (VERDICT round-3 item 5): the cell-size schedule
    is primarily a BASIN feature for NDT — at cell_size 0.5 the Gaussians
    only see half a cell, so the hard perturbation fleet (+-0.15 rad /
    +-0.6 m) lands outside the score surface's attraction region and
    single-scale NDT diverges on most lanes (measured here: 2/8 within
    5 cm of the trimmed reference pose; at the bench's B=256 fleet:
    25/256).  The 8x->2x->1x schedule recovers 8/8 (188/256 at bench
    scale) AND enters the fine level inside its quadratic region (1 fine
    iteration vs up to 11)."""
    import jax
    import jax.tree as jtree

    from icp_tpu.multiscale import converge_ndt_multiscale

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a_pts = icp.io.parse_lidar_scan_array(f"{repo}/ex_data/scan1/first.csv")
    b_pts = icp.io.parse_lidar_scan_array(f"{repo}/ex_data/scan1/second.csv")
    a1 = icp.from_points(a_pts, capacity=1024, dtype=np.float64)
    b1 = icp.from_points(b_pts, capacity=1024, dtype=np.float64)
    B = 8
    a = jtree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), a1)
    b = jtree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), b1)
    rng = np.random.default_rng(1)
    guess = icp.geometry.from_angle_2d(
        jnp.asarray(rng.uniform(-0.15, 0.15, B)),
        jnp.asarray(rng.uniform(-0.6, 0.6, (B, 2))),
    )
    cfg = icp.DriverConfig(
        max_iterations=50, angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    ncfg = icp.Config(cell_size=1.0, cells=1024)

    # Reference pose: trimmed from identity (the bundled pair's motion).
    tm = icp.from_method("trimmed", 2)
    ref_res, _ = icp.converge(tm, a1, b1, icp.identity(2, dtype=np.float64), cfg)
    ref = np.asarray(ref_res.transform.translation)

    single_fn = icp.make_converge_fn(icp.from_method("ndt", 2, ncfg), cfg)
    single, _ = single_fn(a, b, guess)
    d_single = np.linalg.norm(np.asarray(single.transform.translation) - ref, axis=-1)

    ms = jax.jit(
        lambda a_, b_, g_: converge_ndt_multiscale(
            a_, b_, g_, cfg, dim=2, ndt_config=ncfg,
            scales=(8.0, 2.0), coarse_max_iterations=6,
        )[0]
    )
    multi = ms(a, b, guess)
    d_multi = np.linalg.norm(np.asarray(multi.transform.translation) - ref, axis=-1)

    assert int((d_single < 0.05).sum()) <= 3, d_single  # the narrow basin
    assert int((d_multi < 0.05).sum()) == 8, d_multi  # the schedule recovers
    # Fine level starts inside the quadratic region.
    assert int(np.asarray(multi.iteration_count).max()) <= 3
    # Where the single-scale solve DID converge, both agree.
    both = (d_single < 0.05) & (d_multi < 0.05)
    if both.any():
        np.testing.assert_allclose(
            np.asarray(multi.transform.translation)[both],
            np.asarray(single.transform.translation)[both],
            atol=0.02,
        )


def test_ndt_multiscale_coarse_init_recovers_extreme_starts():
    """``coarse_init=True``: the schedule widens the basin but cannot
    recover arbitrarily bad starts (a coarse Gaussian still only sees a
    few cells); the global initializer can.  Extreme fleet here:
    ±π rad / ±3 m — far outside even the 8x level's attraction region —
    diverges under the plain schedule and fully recovers under
    ``coarse_init`` (bench-scale hard fleet: 188/256 → 256/256, the
    ``scan1_ndt_multiscale_coarse_*`` row)."""
    import jax
    import jax.tree as jtree

    from icp_tpu.multiscale import converge_ndt_multiscale

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a_pts = icp.io.parse_lidar_scan_array(f"{repo}/ex_data/scan1/first.csv")
    b_pts = icp.io.parse_lidar_scan_array(f"{repo}/ex_data/scan1/second.csv")
    a1 = icp.from_points(a_pts, capacity=1024, dtype=np.float64)
    b1 = icp.from_points(b_pts, capacity=1024, dtype=np.float64)
    B = 6
    a = jtree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), a1)
    b = jtree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), b1)
    rng = np.random.default_rng(7)
    guess = icp.geometry.from_angle_2d(
        jnp.asarray(rng.uniform(-np.pi, np.pi, B)),
        jnp.asarray(rng.uniform(-3.0, 3.0, (B, 2))),
    )
    cfg = icp.DriverConfig(
        max_iterations=50, angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    ncfg = icp.Config(cell_size=1.0, cells=1024)
    tm = icp.from_method("trimmed", 2)
    ref_res, _ = icp.converge(tm, a1, b1, icp.identity(2, dtype=np.float64), cfg)
    ref = np.asarray(ref_res.transform.translation)

    def lanes(result):
        d = np.linalg.norm(np.asarray(result.transform.translation) - ref, axis=-1)
        return int((d < 0.05).sum())

    common = dict(dim=2, ndt_config=ncfg, scales=(8.0, 2.0),
                  coarse_max_iterations=6)
    plain = converge_ndt_multiscale(a, b, guess, cfg, **common)[0]
    seeded = converge_ndt_multiscale(
        a, b, guess, cfg, coarse_init=True, **common
    )[0]
    assert lanes(plain) < B, "extreme fleet unexpectedly inside the basin"
    assert lanes(seeded) == B, np.asarray(seeded.transform.translation)


def test_ndt_multiscale_identity_guess_and_cell_size_floor():
    """Two more pins on the bundled scan1 pair (true motion ~0.47 m):

    * from identity at cell 1.0 both paths recover the pose and AGREE; the
      schedule's fine level needs 1 iteration where single-scale needs 10
      (the iteration-count lever the bench row measures);
    * the schedule cannot rescue a fine level whose cells are too small
      for the data: at cell 0.5 this sparse analogue leaves most cells
      under min_points, the score surface is flat (cost ~0.99 = all
      misses), and single-scale NDT cannot even pull a 6 cm offset —
      documented floor, not a bug (use the plain cost to detect it)."""
    from icp_tpu import geometry
    from icp_tpu.multiscale import converge_ndt_multiscale

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    a1 = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{repo}/ex_data/scan1/first.csv"),
        capacity=1024, dtype=np.float64,
    )
    b1 = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{repo}/ex_data/scan1/second.csv"),
        capacity=1024, dtype=np.float64,
    )
    cfg = icp.DriverConfig(
        max_iterations=50, angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    ncfg = icp.Config(cell_size=1.0, cells=1024)
    tm = icp.from_method("trimmed", 2)
    g0 = icp.identity(2, dtype=np.float64)
    ref_res, _ = icp.converge(tm, a1, b1, g0, cfg)
    ref = np.asarray(ref_res.transform.translation)

    ndt = icp.from_method("ndt", 2, ncfg)
    single, _ = icp.converge(ndt, a1, b1, g0, cfg)
    multi, _ = converge_ndt_multiscale(
        a1, b1, g0, cfg, dim=2, ndt_config=ncfg, scales=(4.0,),
        coarse_max_iterations=6,
    )
    d_single = np.linalg.norm(np.asarray(single.transform.translation) - ref)
    d_multi = np.linalg.norm(np.asarray(multi.transform.translation) - ref)
    assert d_single < 0.02 and d_multi < 0.02, (d_single, d_multi)
    np.testing.assert_allclose(
        np.asarray(multi.transform.translation),
        np.asarray(single.transform.translation),
        atol=0.02,
    )
    assert int(multi.iteration_count) <= 2 < int(single.iteration_count)

    # The documented cell-size floor: cells too small for the data leave
    # no gradient, whatever the schedule does above them.
    tiny = icp.from_method("ndt", 2, icp.Config(cell_size=0.5, cells=1024))
    near = geometry.from_angle_2d(
        jnp.asarray(0.02), jnp.asarray(ref + np.asarray([0.05, -0.04]))
    )
    stalled, _ = icp.converge(tiny, a1, b1, near, cfg)
    assert float(stalled.cost) > 0.9  # ~every point misses an occupied cell
    assert (
        np.linalg.norm(np.asarray(stalled.transform.translation) - ref) > 0.03
    )
