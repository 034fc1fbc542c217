"""Scan Context place recognition (net-new — no reference counterpart).

Covers descriptor construction (2D occupancy / 3D max-height oracle),
rotation behavior (column roll, ring-key invariance, yaw recovery),
retrieval (true revisits found, non-revisits rejected), the drift
scenario pose-radius search cannot solve, and the yaw seeds feeding
register_loop_closures.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import cloud, geometry, pose_graph
from icp_tpu.ops.descriptor import (
    descriptor_distances,
    find_loop_candidates_descriptor,
    ring_key,
    scan_context,
    yaw_seeds,
)


def distinctive_scan_2d(rng, n=360):
    """A structured 'place' with a random radial profile (random harmonic
    mix + random wall bumps), sensor at origin — angularly anisotropic so
    yaw is observable, and genuinely different per rng (a fixed harmonic
    family would make every 'place' a near-rotation of every other)."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radius = rng.uniform(6.0, 9.0) * np.ones(n)
    for _ in range(4):
        k = rng.integers(1, 9)
        radius += rng.uniform(0.3, 1.8) * np.sin(k * ang + rng.uniform(0, 2 * np.pi))
    # A few hard discontinuities (doorways / pillars).
    for _ in range(3):
        a0 = rng.uniform(0, 2 * np.pi)
        w = rng.uniform(0.2, 0.6)
        gap = ((ang - a0 + np.pi) % (2 * np.pi) - np.pi)
        radius = np.where(np.abs(gap) < w, radius * rng.uniform(0.4, 0.7), radius)
    pts = np.stack([radius * np.cos(ang), radius * np.sin(ang)], -1)
    return pts + rng.normal(0, 0.02, pts.shape)


def test_scan_context_2d_occupancy_oracle(rng):
    pts = rng.uniform(-5, 5, (300, 2))
    desc = scan_context(jnp.asarray(pts), jnp.ones(300, bool), rings=8, sectors=12, max_radius=10.0)
    assert desc.shape == (8, 12)
    # NumPy oracle of the bilinear sector splat (sensor-frame: origin
    # center, the default).
    rel = pts
    r = np.linalg.norm(rel, axis=1)
    th = np.arctan2(rel[:, 1], rel[:, 0])
    ring = np.floor(r / 10.0 * 8).astype(int)
    sec_f = (th + np.pi) / (2 * np.pi) * 12 - 0.5
    s0 = np.floor(sec_f).astype(int)
    w1 = sec_f - s0
    oracle = np.zeros((8, 12))
    for k in range(300):
        if ring[k] < 8:
            oracle[ring[k], s0[k] % 12] += 1.0 - w1[k]
            oracle[ring[k], (s0[k] + 1) % 12] += w1[k]
    np.testing.assert_allclose(np.asarray(desc), oracle, atol=1e-9)
    # centroid mode binned differently (shifted frame) but same mass.
    desc_c = scan_context(
        jnp.asarray(pts), jnp.ones(300, bool), rings=8, sectors=12,
        max_radius=10.0, center="centroid",
    )
    assert abs(float(jnp.sum(desc_c)) - float(jnp.sum(desc))) < 5.0


def test_scan_context_3d_max_height(rng):
    # Two points in one xy-bin at different heights: the bin stores max z
    # (sensor frame, origin center — the original Scan Context).
    pts = np.array([[2.0, 2.0, 0.5], [2.05, 2.02, 2.0], [-3.0, 0.5, 1.0]])
    desc = scan_context(jnp.asarray(pts), jnp.ones(3, bool), rings=4, sectors=4, max_radius=8.0)
    vals = sorted(np.asarray(desc)[np.asarray(desc) != 0.0].tolist())
    assert len(vals) == 2
    np.testing.assert_allclose(vals, [1.0, 2.0], atol=1e-6)


def test_ring_key_rotation_invariant(rng):
    pts = distinctive_scan_2d(rng)
    rot = geometry.from_angle_2d(np.float64(0.7), np.zeros(2))
    pts_r = np.asarray(geometry.apply(rot, jnp.asarray(pts)))
    d0 = scan_context(jnp.asarray(pts), jnp.ones(len(pts), bool), max_radius=12.0)
    d1 = scan_context(jnp.asarray(pts_r), jnp.ones(len(pts), bool), max_radius=12.0)
    # Binary occupancy is invariant up to sector-boundary flips (a rotation
    # can split one occupied sector's points across two): allow a few
    # flipped sectors per ring (each flip moves the mean by 1/60).
    np.testing.assert_allclose(
        np.asarray(ring_key(d0)), np.asarray(ring_key(d1)), atol=0.12
    )


def test_rotated_scan_matches_with_yaw(rng):
    """A rotated copy of the same place: near-zero descriptor distance and
    the recovered shift equals the rotation within one sector."""
    sectors = 60
    pts = distinctive_scan_2d(rng)
    true_yaw = 0.9
    rot = geometry.from_angle_2d(np.float64(true_yaw), np.zeros(2))
    pts_r = np.asarray(geometry.apply(rot, jnp.asarray(pts)))
    descs = scan_context(
        jnp.asarray(np.stack([pts, pts_r])),
        jnp.ones((2, len(pts)), bool),
        sectors=sectors,
        max_radius=12.0,
    )
    dist, shift = descriptor_distances(descs)
    assert float(dist[0, 1]) < 0.15, float(dist[0, 1])
    # A fresh random place is far by comparison.
    other = distinctive_scan_2d(np.random.default_rng(99))
    descs3 = scan_context(
        jnp.asarray(np.stack([pts, pts_r, other])),
        jnp.ones((3, len(pts)), bool),
        sectors=sectors,
        max_radius=12.0,
    )
    dist3, _ = descriptor_distances(descs3)
    assert float(dist3[0, 2]) > 2 * float(dist3[0, 1])
    # Shift-to-yaw convention is pinned by test_yaw_seeds_convention below;
    # here just check the magnitude matches within one sector bin.
    got = float(shift[0, 1]) * 2 * np.pi / sectors

    def wrap_err(y):
        return min(abs(y - true_yaw + k * 2 * np.pi) for k in (-1, 0, 1))

    assert min(wrap_err(got), wrap_err(-got)) <= 2 * np.pi / sectors + 1e-9


def test_yaw_seeds_convention(rng):
    """The yaw seed must bring the source scan (j) into the target frame
    (i): applying the seed to scan j's points should land near scan i's."""
    pts_i = distinctive_scan_2d(rng)
    true = geometry.from_angle_2d(np.float64(0.8), np.array([0.0, 0.0]))
    pts_j = np.asarray(geometry.apply(true, jnp.asarray(pts_i)))
    stack = cloud.PointCloud(
        jnp.asarray(np.stack([pts_i, pts_j])),
        jnp.full((2,), len(pts_i), dtype=jnp.int32),
    )
    descs = scan_context(stack.points, stack.mask, max_radius=12.0)
    pairs, yaw = find_loop_candidates_descriptor(descs, 0.3, min_separation=1)
    assert pairs.shape[0] >= 1 and tuple(np.asarray(pairs)[0]) == (0, 1)
    seeds = yaw_seeds(stack, pairs, yaw)
    moved = np.asarray(
        geometry.apply(
            geometry.RigidTransform(seeds.rotation[0], seeds.translation[0]),
            jnp.asarray(pts_j),
        )
    )
    # Mean NN error after seeding should be far smaller than before.
    def mean_nn(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(axis=1)).mean())

    assert mean_nn(moved, pts_i) < 0.35 * mean_nn(pts_j, pts_i)


def test_descriptor_beats_radius_under_drift(rng):
    """The headline scenario: a revisit whose DRIFTED pose estimate is far
    from the first visit.  Pose-radius search cannot propose the pair;
    descriptor search finds it."""
    place_a = distinctive_scan_2d(rng)
    scans = [place_a]
    for k in range(1, 11):
        scans.append(distinctive_scan_2d(np.random.default_rng(1000 + k)))
    scans.append(place_a + rng.normal(0, 0.02, place_a.shape))  # the revisit
    t = len(scans)
    stack = cloud.PointCloud(
        jnp.asarray(np.stack(scans)), jnp.full((t,), len(place_a), dtype=jnp.int32)
    )
    # Drifted pose estimates: the revisit believed 10 m from the start.
    poses = geometry.from_angle_2d(
        jnp.zeros((t,)), jnp.asarray(np.linspace(0, 10, t))[:, None] * jnp.asarray([[1.0, 0.0]])
    )
    radius_cands = pose_graph.find_loop_candidates(poses, radius=2.5, min_separation=5)
    radius_pairs = {tuple(p) for p in np.asarray(radius_cands).reshape(-1, 2)}
    assert (0, t - 1) not in radius_pairs  # drift defeats the radius search

    descs = scan_context(stack.points, stack.mask, max_radius=12.0)
    pairs, _ = find_loop_candidates_descriptor(descs, 0.25, min_separation=5)
    desc_pairs = {tuple(p) for p in np.asarray(pairs).reshape(-1, 2)}
    assert (0, t - 1) in desc_pairs
    # And no false positive among the distinct places.
    for i, j in desc_pairs:
        assert {i, j} == {0, t - 1}, (i, j)


def test_min_separation_and_max_candidates(rng):
    pts = distinctive_scan_2d(rng)
    stack = np.stack([pts + rng.normal(0, 0.01, pts.shape) for _ in range(6)])
    descs = scan_context(jnp.asarray(stack), jnp.ones((6, len(pts)), bool), max_radius=12.0)
    pairs, _ = find_loop_candidates_descriptor(descs, 0.5, min_separation=4)
    arr = np.asarray(pairs).reshape(-1, 2)
    assert len(arr) > 0
    assert np.all(arr[:, 1] - arr[:, 0] >= 4)
    pairs2, yaw2 = find_loop_candidates_descriptor(descs, 0.5, min_separation=1, max_candidates=3)
    assert np.asarray(pairs2).shape[0] <= 3
    assert np.asarray(yaw2).shape[0] == np.asarray(pairs2).shape[0]


def test_scan_context_requires_max_radius(rng):
    with pytest.raises(ValueError):
        scan_context(jnp.zeros((4, 2)), jnp.ones(4, bool))


def test_run_slam_descriptor_detector(rng):
    """End-to-end: a noisy loop whose revisit the descriptor detector must
    find and close; the optimized end pose beats raw odometry."""
    import math

    from icp_tpu import slam

    world = distinctive_scan_2d(rng, n=400) * 2.5  # one anisotropic place
    t_steps, radius_m = 14, 1.5
    scans = []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius_m * math.cos(phi), radius_m * math.sin(phi), 0.4 * math.sin(phi)
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.08, pts.shape)  # enough noise to drift
        scans.append(pts)
    stack = cloud.PointCloud(
        jnp.asarray(np.stack(scans)), jnp.full((t_steps,), world.shape[0], dtype=jnp.int32)
    )
    cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    result = slam.run_slam(
        stack, method, cfg,
        loop_detector="descriptor",
        descriptor_range=30.0,
        descriptor_max_distance=0.2,
        loop_min_separation=8,
        loop_weight=100.0,
    )
    assert result.loop_edges.shape[0] >= 1
    # The revisit edge spans (near-)start to (near-)end.
    edges = np.asarray(result.loop_edges)
    assert np.any((edges[:, 0] <= 2) & (edges[:, 1] >= t_steps - 3)), edges
    # True end pose == identity (the loop closes where it started).
    end_err_opt = float(np.linalg.norm(np.asarray(result.poses.translation)[-1]))
    end_err_odo = float(
        np.linalg.norm(np.asarray(result.trajectory.poses.translation)[-1])
    )
    assert end_err_opt < max(0.5 * end_err_odo, 0.02), (end_err_opt, end_err_odo)


def test_run_slam_descriptor_requires_range(rng):
    from icp_tpu import slam

    stack = cloud.PointCloud(jnp.zeros((3, 8, 2)), jnp.full((3,), 8, dtype=jnp.int32))
    cfg = icp.DriverConfig(max_iterations=5)
    method = icp.from_method("trimmed", 2)
    with pytest.raises(ValueError):
        slam.run_slam(stack, method, cfg, loop_detector="descriptor")
    with pytest.raises(ValueError):
        slam.run_slam(stack, method, cfg, loop_detector="magic")


def test_online_slam_descriptor_detector(rng):
    """OnlineSlam with appearance retrieval: descriptors captured at
    keyframe promotion, candidates from Scan Context distance, closures
    yaw-seeded — the live end pose snaps back on the revisit."""
    import math

    from icp_tpu import slam

    world = distinctive_scan_2d(rng, n=400) * 2.5
    t_steps, radius_m = 20, 1.5
    scans = []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius_m * math.cos(phi), radius_m * math.sin(phi), 0.4 * math.sin(phi)
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.08, pts.shape)
        scans.append(
            cloud.from_points(jnp.asarray(pts), capacity=world.shape[0])
        )
    cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, cfg,
        translation_threshold=0.2, angle_threshold=0.1,
        loop_every=4,
        loop_detector="descriptor", descriptor_range=30.0,
        descriptor_max_distance=0.2,
        loop_min_separation=8,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    updates = [online.add_scan(s) for s in scans]
    online.finalize()
    assert updates[-1].num_closures >= 0  # stream completed
    assert len(online._loop_edges) >= 1, "descriptor detector found no closure"
    end_err = float(
        np.linalg.norm(np.asarray(online.keyframe_poses.translation)[-1])
        - 0.0
    )
    # True end keyframe pose ~ identity (loop returns to start).
    assert abs(end_err) < 0.1, end_err


def test_online_slam_descriptor_requires_range():
    from icp_tpu import slam

    method = icp.from_method("trimmed", 2)
    cfg = icp.DriverConfig(max_iterations=5)
    with pytest.raises(ValueError):
        slam.OnlineSlam(method, cfg, loop_detector="descriptor")
    with pytest.raises(ValueError):
        slam.OnlineSlam(method, cfg, loop_detector="nope")


def _keyframe_map(rng, t_steps=12):
    """A keyframe database around the distinctive world with known poses.

    Returns (keyframe clouds stack, world poses, the world array)."""
    import math

    from icp_tpu import slam  # noqa: F401  (parity with other tests)

    world = distinctive_scan_2d(rng, n=400) * 2.5
    clouds, poses_r, poses_t = [], [], []
    for k in range(t_steps):
        phi = 2 * math.pi * k / t_steps
        px, py = 1.5 * math.cos(phi), 1.5 * math.sin(phi)
        th = 0.5 * math.sin(phi)
        c, s = np.cos(th), np.sin(th)
        rm = np.array([[c, -s], [s, c]])
        pts = (world - [px, py]) @ rm  # sensor-frame scan
        pts += rng.normal(0, 0.02, pts.shape)
        clouds.append(pts)
        # World pose maps scan-local -> world: pts = (w - p) @ Rm gives
        # w = pts @ Rm.T + p, i.e. per point w = Rm @ pt + p in the column
        # convention geometry.apply uses — rotation Rm, translation p
        # (verified numerically below at a non-identity keyframe).
        poses_r.append(rm)
        poses_t.append(np.array([px, py]))
    stack = cloud.PointCloud(
        jnp.asarray(np.stack(clouds)), jnp.full((t_steps,), world.shape[0], dtype=jnp.int32)
    )
    poses = geometry.RigidTransform(
        jnp.asarray(np.stack(poses_r)), jnp.asarray(np.stack(poses_t))
    )
    # Sanity: applying pose k to scan k must reproduce the world points
    # (k=3 has a non-identity rotation, so the convention is actually
    # exercised).
    w3 = np.asarray(
        geometry.apply(
            geometry.RigidTransform(poses.rotation[3], poses.translation[3]),
            stack.points[3],
        )
    )
    assert np.abs(w3 - world).max() < 0.2
    return stack, poses, world


def test_relocalize_recovers_world_pose(rng):
    """Kidnapped-robot recovery: a new scan from a known (but unprovided)
    pose is localized in the keyframe map via descriptor retrieval +
    yaw-seeded registration."""
    import math

    from icp_tpu import slam

    kfs, poses, world = _keyframe_map(rng)
    # A query scan from a pose BETWEEN keyframes, heading rotated 1.1
    # rad — large enough that a wrong-sign yaw seed leaves ICP's basin
    # (the 0.7 rad version passed even with the direction inverted).
    px, py, th = 1.3 * math.cos(0.4), 1.3 * math.sin(0.4), 1.1
    c, s = np.cos(th), np.sin(th)
    rm = np.array([[c, -s], [s, c]])
    q = (world - [px, py]) @ rm + rng.normal(0, 0.02, world.shape)
    scan = cloud.from_points(jnp.asarray(q), capacity=world.shape[0])

    cfg = icp.DriverConfig(max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    res = slam.relocalize(
        scan, kfs, poses, method, cfg,
        descriptor_range=45.0, max_distance=0.4, top_k=3,
    )
    assert res is not None
    got_t = np.asarray(res.pose.translation)
    np.testing.assert_allclose(got_t, [px, py], atol=0.05)
    got_r = np.asarray(res.pose.rotation)
    np.testing.assert_allclose(got_r, rm, atol=0.05)


def test_relocalize_rejects_unknown_place(rng):
    from icp_tpu import slam

    kfs, poses, world = _keyframe_map(rng)
    elsewhere = distinctive_scan_2d(np.random.default_rng(4242)) * 2.5
    pad = np.zeros((world.shape[0] - elsewhere.shape[0], 2))
    q = np.concatenate([elsewhere, pad])
    scan = cloud.PointCloud(
        jnp.asarray(q), jnp.asarray(elsewhere.shape[0], dtype=jnp.int32)
    )
    cfg = icp.DriverConfig(max_iterations=30)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    res = slam.relocalize(
        scan, kfs, poses, method, cfg,
        descriptor_range=45.0, max_distance=0.15, top_k=3,
    )
    assert res is None


def test_relocalize_precomputed_db_matches(rng):
    from icp_tpu import slam
    from icp_tpu.ops.descriptor import scan_context as sc

    kfs, poses, world = _keyframe_map(rng)
    q = world + rng.normal(0, 0.02, world.shape)  # at the origin, yaw 0
    scan = cloud.from_points(jnp.asarray(q), capacity=world.shape[0])
    cfg = icp.DriverConfig(max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    db = sc(kfs.points, kfs.mask, max_radius=45.0)
    r1 = slam.relocalize(
        scan, kfs, poses, method, cfg, descriptor_range=45.0,
        max_distance=0.45, keyframe_descriptors=db,
    )
    r2 = slam.relocalize(
        scan, kfs, poses, method, cfg, descriptor_range=45.0, max_distance=0.45
    )
    assert r1 is not None and r2 is not None
    assert r1.keyframe == r2.keyframe
    np.testing.assert_array_equal(
        np.asarray(r1.pose.translation), np.asarray(r2.pose.translation)
    )
    np.testing.assert_allclose(np.asarray(r1.pose.translation), [0, 0], atol=0.05)


def test_scan_context_3d_retrieval(rng):
    """3D max-height descriptors: a yaw-rotated copy of the same 3D place
    matches closely; a different 3D place does not."""
    def place_3d(r):
        base = distinctive_scan_2d(r, n=300)
        z = r.uniform(0.0, 3.0, (300, 1))
        return np.concatenate([base, z], axis=1)

    pts = place_3d(rng)
    th = 0.8
    c, s = np.cos(th), np.sin(th)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    pts_r = pts @ rz.T
    other = place_3d(np.random.default_rng(77))
    descs = scan_context(
        jnp.asarray(np.stack([pts, pts_r, other])),
        jnp.ones((3, 300), bool),
        max_radius=12.0,
    )
    dist, _ = descriptor_distances(descs)
    assert float(dist[0, 1]) < 0.35, float(dist[0, 1])
    assert float(dist[0, 2]) > 1.5 * float(dist[0, 1])


def test_online_slam_relocalize(rng):
    """OnlineSlam's descriptor database doubles as a relocalization index:
    a kidnapped scan is recovered against the streamed keyframe map."""
    import math

    from icp_tpu import slam

    world = distinctive_scan_2d(rng, n=400) * 2.5
    cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, cfg,
        translation_threshold=0.2, angle_threshold=0.1,
        loop_detector="descriptor", descriptor_range=30.0,
        loop_min_separation=8,
    )
    for k in range(10):
        phi = math.pi * k / 9
        px, py = 1.2 * math.cos(phi), 1.2 * math.sin(phi)
        pts = world - [px, py] + rng.normal(0, 0.03, world.shape)
        online.add_scan(cloud.from_points(jnp.asarray(pts), capacity=world.shape[0]))

    # Kidnapped scan: known pose, yaw 0.9, never streamed.
    p_true = np.array([0.5, 0.3])
    th = 0.9
    c, s = np.cos(th), np.sin(th)
    rm = np.array([[c, -s], [s, c]])
    q = (world - p_true) @ rm + rng.normal(0, 0.03, world.shape)
    res = online.relocalize(
        cloud.from_points(jnp.asarray(q), capacity=world.shape[0]),
        max_distance=0.45,
    )
    assert res is not None
    # Poses live in the MAP frame (anchored at scan 0, world (1.2, 0)).
    np.testing.assert_allclose(
        np.asarray(res.pose.translation), p_true - np.array([1.2, 0.0]), atol=0.05
    )

    # radius-mode sessions have no descriptor index.
    radius_mode = slam.OnlineSlam(method, cfg)
    with pytest.raises(ValueError):
        radius_mode.relocalize(cloud.from_points(jnp.asarray(q), capacity=world.shape[0]))


def test_incremental_retrieval_matches_all_pairs_fresh_slice(rng):
    """find_loop_candidates_descriptor_incremental(descs, new_start) must
    return EXACTLY the all-pairs candidates whose newer member is
    >= new_start — same pairs, same yaw seeds (descriptors are immutable,
    so that slice is the only thing a new retrieval can add; VERDICT
    round-3 item 4 / ADVICE round-3)."""
    from icp_tpu.ops.descriptor import (
        find_loop_candidates_descriptor_incremental,
        scan_context,
    )

    world = rng.uniform(-20, 20, (120, 2))
    descs = []
    for k in range(24):
        # Two laps over the same 12 poses: genuine revisit pairs.
        phi = 2 * np.pi * (k % 12) / 12
        c, s = np.cos(phi + np.pi / 2), np.sin(phi + np.pi / 2)
        pts = (world - [4 * np.cos(phi), 4 * np.sin(phi)]) @ np.array(
            [[c, -s], [s, c]]
        )
        pts = pts + rng.normal(0, 0.02, pts.shape)
        descs.append(
            scan_context(
                jnp.asarray(pts), jnp.ones(pts.shape[0], bool), max_radius=40.0
            )
        )
    descs = jnp.stack(descs)

    full_pairs, full_yaw = find_loop_candidates_descriptor(
        descs, 0.3, min_separation=6
    )
    for new_start in (0, 12, 17, 23, 24):
        inc_pairs, inc_yaw = find_loop_candidates_descriptor_incremental(
            descs, new_start, 0.3, min_separation=6
        )
        keep = np.asarray(full_pairs)[:, 1] >= new_start
        want = {tuple(p) for p in np.asarray(full_pairs)[keep].tolist()}
        got = {tuple(p) for p in np.asarray(inc_pairs).tolist()}
        assert got == want, (new_start, got ^ want)
        yaw_by_pair = {
            tuple(p): y
            for p, y in zip(np.asarray(full_pairs).tolist(), np.asarray(full_yaw))
        }
        for p, y in zip(np.asarray(inc_pairs).tolist(), np.asarray(inc_yaw)):
            np.testing.assert_allclose(y, yaw_by_pair[tuple(p)], atol=1e-12)


def test_incremental_retrieval_budget_and_bounds(rng):
    from icp_tpu.ops.descriptor import (
        find_loop_candidates_descriptor_incremental,
        scan_context,
    )

    pts = rng.uniform(-5, 5, (16, 64, 2))
    descs = scan_context(
        jnp.asarray(pts), jnp.ones(pts.shape[:2], bool), max_radius=10.0
    )
    pairs, yaw = find_loop_candidates_descriptor_incremental(
        descs, 16, 0.5, min_separation=1
    )
    assert pairs.shape == (0, 2) and yaw.shape == (0,)  # nothing new
    pairs, _ = find_loop_candidates_descriptor_incremental(
        descs, 8, 1.1, min_separation=1, max_candidates=3
    )
    assert pairs.shape[0] <= 3
    assert bool((np.asarray(pairs)[:, 1] >= 8).all())
    import pytest

    with pytest.raises(ValueError, match="new_start"):
        find_loop_candidates_descriptor_incremental(descs, 17, 0.5)
