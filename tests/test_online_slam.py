"""Online SLAM loop (`slam.OnlineSlam`): streaming odometry + periodic
robust loop closure with live re-anchoring.

Net-new production surface (the reference registers one pair per process);
the offline pipeline is `slam.run_slam` — these tests pin that the online
loop reaches comparable quality scan by scan, corrects the LIVE pose when a
closure lands (not just the trajectory at shutdown), and survives an
injected wrong closure through the robust kernel.
"""

import math

import jax.numpy as jnp
import numpy as np

import icp_tpu as icp
from icp_tpu import geometry, slam


def _circle_scans(rng, t_steps=49, radius=4.0, n_world=150, noise=0.02):
    # 49 steps = 7.5 deg/scan: inside point-to-point ICP's basin (the
    # OnlineSlam docstring's front-end limit; 15 deg/scan is not).
    world = rng.uniform(-30, 30, (n_world, 2))
    scans, gt = [], []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        gt.append((px, py))
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        scans.append(
            icp.from_points(pts + rng.normal(0, noise, pts.shape),
                            capacity=152, dtype=np.float64)
        )
    return scans, np.asarray(gt)


def _cfg():
    return icp.DriverConfig(
        max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5
    )


def test_online_slam_closes_loop_live(rng):
    """Streaming around the circle: the revisit closure fires DURING the
    stream and the live pose snaps back toward ground truth immediately."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, _cfg(),
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    updates = [online.add_scan(s) for s in scans]
    assert updates[0].is_keyframe
    assert any(u.refined for u in updates)  # refinement ran mid-stream
    assert updates[-1].num_closures >= 1

    # The true trajectory returns to the origin (scan-0 frame): the LIVE
    # end pose must be close after online closure (measured 0.005 m).
    end_err = float(np.linalg.norm(np.asarray(updates[-1].pose.translation)))
    assert end_err < 0.05, end_err


def test_online_slam_reanchors_live_pose(rng):
    """When a refinement corrects the current keyframe, the live pose moves
    WITH it (pose = corrected_kf ∘ scan-relative offset)."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, _cfg(),
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    prev_pose = None
    for s in scans:
        u = online.add_scan(s)
        if u.refined and prev_pose is not None:
            # The keyframe trajectory changed this step; the live pose is
            # anchored to the refined keyframe, not the stale one.
            kf = online.keyframe_poses
            last_kf = geometry.RigidTransform(kf.rotation[-1], kf.translation[-1])
            rel = geometry.compose(geometry.inverse(last_kf), u.pose)
            # The scan-relative offset stays bounded by the keyframe gap.
            assert float(jnp.linalg.norm(rel.translation)) < 1.0
        prev_pose = u.pose


def test_online_slam_rejects_injected_wrong_closure(rng):
    """A wrong closure slipped into the accepted set (plausible cost, wrong
    basin) is down-weighted by the robust solve: the online trajectory
    stays near the clean run instead of bending to the bad edge."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    def run(inject):
        online = slam.OnlineSlam(
            method, _cfg(),
            translation_threshold=0.4, angle_threshold=0.15,
            loop_every=4, loop_radius=1.5, loop_min_separation=10,
            robust="gnc_gm", robust_scale="auto",
            odometry_weight=100.0, loop_weight=100.0,
        )
        injected = False
        for t, s in enumerate(scans):
            u = online.add_scan(s)
            if inject and not injected and len(online._kf_clouds) >= 12:
                # Fabricate a closure claiming keyframe 10 meets keyframe 1
                # offset 1.5 m from the truth-consistent relative pose.
                ps = online.keyframe_poses
                a, b = 10, 1
                rel = geometry.compose(
                    geometry.inverse(
                        geometry.RigidTransform(ps.rotation[a], ps.translation[a])
                    ),
                    geometry.RigidTransform(ps.rotation[b], ps.translation[b]),
                )
                online._loop_edges.append((a, b))
                online._loop_meas.append(
                    geometry.RigidTransform(
                        rel.rotation, rel.translation + jnp.asarray([1.5, 0.0])
                    )
                )
                injected = True
        return online

    clean = run(inject=False)
    poisoned = run(inject=True)
    t_clean = np.asarray(clean.keyframe_poses.translation)
    t_bad = np.asarray(poisoned.keyframe_poses.translation)
    n = min(len(t_clean), len(t_bad))
    dev = float(np.max(np.linalg.norm(t_clean[:n] - t_bad[:n], axis=-1)))
    assert dev < 0.3, dev  # the injected edge did not bend the trajectory
    end_bad = float(np.linalg.norm(t_bad[-1]))
    assert end_bad < 0.05, end_bad  # the loop still closes correctly


def test_online_slam_3d_seq3d():
    """3D online SLAM end to end on the bundled seq3d sweeps: GICP keyframe
    odometry streamed scan by scan, SE(3) robust closures at finalize()
    (the revisit lands in the final keyframes, after the last periodic
    refine boundary — the flush is what registers it).  Measured: keyframe
    end error 0.158 m (raw) -> 0.002 m."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seq = os.path.join(repo, "ex_data", "seq3d")
    paths = sorted(glob.glob(os.path.join(seq, "sweep_*.ply")))
    clouds = [
        icp.from_points(icp.read_ply(p), capacity="bucket", dtype=np.float32)
        for p in paths
    ]
    cap = max(c.capacity for c in clouds)
    clouds = [icp.pad_to(c, cap) for c in clouds]
    with open(os.path.join(seq, "groundtruth.json")) as f:
        gt = json.load(f)
    rot = np.asarray(gt["rotations"])
    tr = np.asarray(gt["translations"])
    gt_t0 = np.einsum("ij,tj->ti", rot[0].T, tr - tr[0])

    method = icp.from_method(
        "gicp", 3, icp.Config(dim=3, neighbors=10, normal_neighbors=10)
    )
    cfg = icp.DriverConfig(
        max_iterations=60, angle_tolerance=1e-5, translation_tolerance=1e-5
    )
    online = slam.OnlineSlam(
        method, cfg, translation_threshold=0.5, angle_threshold=0.2,
        loop_every=8, loop_radius=2.0, loop_min_separation=50,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    ups = [online.add_scan(s) for s in clouds]
    assert len(ups) == len(clouds)
    raw_end = float(
        np.linalg.norm(np.asarray(online.keyframe_poses.translation[-1]) - gt_t0[-1])
    )
    assert online.finalize()  # the flush registers the end-of-loop revisit
    assert len(online._loop_edges) >= 1
    end_err = float(
        np.linalg.norm(np.asarray(online.keyframe_poses.translation[-1]) - gt_t0[-1])
    )
    assert raw_end > 0.05  # real accumulated drift
    assert end_err < 0.02, (raw_end, end_err)


def test_online_slam_closure_information(rng):
    """closure_information=True composes with the online loop: the circle
    stream still closes with anisotropic closure edges."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, _cfg(),
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
        closure_information=True,
    )
    updates = [online.add_scan(s) for s in scans]
    online.finalize()
    assert len(online._loop_edges) >= 1
    end_err = float(
        np.linalg.norm(np.asarray(online.keyframe_poses.translation[-1]))
    )
    assert end_err < 0.1, end_err
    assert len(updates) == len(scans)


# -- pipelined mode (VERDICT round-3 item 2) --------------------------------


def test_online_slam_pipelined_bitwise_matches_serial_every_scan_keyframe(rng):
    """When every scan promotes (negative threshold) the serial path
    registers each scan against the PREVIOUS scan from identity — exactly
    the pipelined scan-to-scan chain — so pipelined add_scan must
    reproduce the serial path BITWISE: poses, promotion flags, and the
    accepted-cost history (pinning that the fused device step's
    registration, pose composition, and device-median anomaly check
    compute exactly the serial host math)."""
    scans, _ = _circle_scans(rng, t_steps=17)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    kw = dict(
        translation_threshold=-1.0, angle_threshold=1e9,
        loop_every=999, loop_radius=1.5, loop_min_separation=10,
    )
    serial = slam.OnlineSlam(method, _cfg(), **kw)
    piped = slam.OnlineSlam(method, _cfg(), pipelined=True, **kw)
    s_updates = [serial.add_scan(s) for s in scans]
    p_updates = [piped.add_scan(s) for s in scans] + [piped.flush()]
    p_updates = [u for u in p_updates if u is not None]
    assert len(p_updates) == len(s_updates)
    for t, (su, pu) in enumerate(zip(s_updates, p_updates)):
        assert su.is_keyframe == pu.is_keyframe, t
        np.testing.assert_array_equal(
            np.asarray(su.pose.translation), np.asarray(pu.pose.translation)
        )
        np.testing.assert_array_equal(
            np.asarray(su.pose.rotation), np.asarray(pu.pose.rotation)
        )
    # The device cost ring buffer replayed the host history exactly.
    np.testing.assert_array_equal(piped._cost_hist_np(), serial._cost_hist_np())


def test_online_slam_pipelined_anomaly_retry_matches_serial(rng):
    """A garbage scan mid-stream triggers the cost-anomaly coarse retry; the
    device-side lax.cond retry (including the np.median-compatible masked
    median over the cost ring) must reproduce the serial host retry
    bitwise (every scan promotes, so serial's scan-to-keyframe equals the
    pipelined scan-to-scan chain exactly)."""
    # Slow linear drift: every scan registers cleanly against scan 0 (no
    # promotion at huge thresholds), so the running cost median is the
    # sensor noise level and the scrambled scan's cost is a clean anomaly.
    world = rng.uniform(-10, 10, (150, 2))
    scans = []
    for k in range(13):
        pts = world - np.asarray([0.08 * k, 0.0])
        scans.append(
            icp.from_points(pts + rng.normal(0, 0.01, pts.shape),
                            capacity=152, dtype=np.float64)
        )
    pts = np.asarray(scans[8].points)
    scrambled = rng.uniform(-30, 30, pts.shape)
    scans[8] = icp.from_points(scrambled, capacity=pts.shape[0], dtype=np.float64)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    kw = dict(
        translation_threshold=-1.0, angle_threshold=1e9,
        loop_every=999, loop_radius=1.5, loop_min_separation=10,
    )
    serial = slam.OnlineSlam(method, _cfg(), **kw)
    piped = slam.OnlineSlam(method, _cfg(), pipelined=True, **kw)
    s_updates = [serial.add_scan(s) for s in scans]
    p_updates = [piped.add_scan(s) for s in scans] + [piped.flush()]
    p_updates = [u for u in p_updates if u is not None]
    # The scenario is real: the garbage scan's accepted cost is anomalous
    # against the running median (the retry fired but could not rescue a
    # scan with no structure — both paths must agree on that too).
    hist = serial._cost_hist_np()
    assert hist.max() > 5 * np.median(hist)
    for su, pu in zip(s_updates, p_updates):
        np.testing.assert_array_equal(
            np.asarray(su.pose.translation), np.asarray(pu.pose.translation)
        )
    np.testing.assert_array_equal(piped._cost_hist_np(), serial._cost_hist_np())


def test_online_slam_pipelined_closes_loop_live(rng):
    """Full pipelined SLAM on the circle: deferred promotion + the exact
    left-composed refine correction must not cost closure quality — same
    contract as test_online_slam_closes_loop_live (end error < 0.05 m).

    Stream density: deferred promotion adds one scan to the worst-case
    keyframe gap, so the pipelined front-end needs the per-scan motion
    HALVED relative to the serial basin limit (measured: the 49-step
    circle at threshold 0.4 promotes every scan serially — 7.5 deg
    effective gap — but pipelined the effective gap is two scans = 15 deg,
    exactly the documented does-not-stream regime; at 97 steps both run
    inside the basin).  Documented in the OnlineSlam pipelined-mode note.
    """
    scans, gt = _circle_scans(rng, t_steps=97)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, _cfg(), pipelined=True,
        translation_threshold=0.25, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    updates = [online.add_scan(s) for s in scans] + [online.flush()]
    updates = [u for u in updates if u is not None]
    assert len(updates) == len(scans)
    assert updates[0].is_keyframe
    assert any(u.refined for u in updates)  # refinement ran mid-stream
    assert updates[-1].num_closures >= 1
    end_err = float(np.linalg.norm(np.asarray(updates[-1].pose.translation)))
    assert end_err < 0.05, end_err


def test_online_slam_pipelined_checkpoint_resume_bit_identical(rng):
    """state_dict flushes the in-flight scan (a checkpoint is a pipeline
    DRAIN — the promotion decided for the drained scan applies from the
    next dispatch, not one later), and the restored session continues the
    stream to an end state bit-identical to an uninterrupted run that
    drained at the same boundary."""
    scans, _ = _circle_scans(rng, t_steps=25)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cut = 11

    def fresh():
        return slam.OnlineSlam(
            method, _cfg(), pipelined=True,
            translation_threshold=0.4, angle_threshold=0.15,
            loop_every=4, loop_radius=1.5, loop_min_separation=10,
            robust="gnc_gm", robust_scale="auto",
            odometry_weight=100.0, loop_weight=100.0,
        )

    full = fresh()
    for t, s in enumerate(scans):
        full.add_scan(s)
        if t == cut - 1:
            full.flush()  # same drain boundary as the checkpointed run
    full.flush()

    first = fresh()
    for s in scans[:cut]:
        first.add_scan(s)
    state = first.state_dict()  # flushes the pending scan

    resumed = fresh()
    resumed.load_state(state)
    # The checkpoint boundary consumed every scan fed so far (flush), so the
    # resumed stream continues from scan `cut`.
    for s in scans[cut:]:
        resumed.add_scan(s)
    resumed.flush()

    np.testing.assert_array_equal(
        np.asarray(full.keyframe_poses.translation),
        np.asarray(resumed.keyframe_poses.translation),
    )
    np.testing.assert_array_equal(full._cost_hist_np(), resumed._cost_hist_np())
    assert full._loop_edges == resumed._loop_edges


def test_online_slam_pipelined_descriptor_mode(rng):
    """The two round-4 features compose: pipelined streaming with the
    Scan Context loop detector (incremental retrieval) still finds the
    revisit and closes the loop on a distinctive world."""
    import math

    world = np.concatenate(
        [rng.uniform(-4, 4, (30, 2)) + c for c in rng.uniform(-25, 25, (8, 2))]
    )
    scans = []
    t_steps, radius = 49, 6.0
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        scans.append(
            icp.from_points(pts + rng.normal(0, 0.02, pts.shape),
                            capacity=256, dtype=np.float64)
        )
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, _cfg(), pipelined=True,
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_detector="descriptor", descriptor_range=60.0,
        descriptor_max_distance=0.4, loop_min_separation=10,
        robust="gnc_gm", odometry_weight=100.0, loop_weight=100.0,
    )
    for s in scans:
        online.add_scan(s)
    online.flush()
    online.finalize()
    assert len(online._loop_edges) >= 1
    assert online._desc_queried == len(online._kf_descs)
    end_err = float(np.linalg.norm(np.asarray(online._pose.translation)))
    assert end_err < 0.1, end_err


def test_online_slam_async_refine_matches_sync_quality(rng):
    """async_refine=True removes the graph solve from the add_scan critical
    path: _refine dispatches and returns; the correction lands at the
    first add_scan after the device result is ready, via the exact
    left-compose handoff (C ∘ X for every pose chained after the
    snapshot).  finalize() force-applies, so end-of-stream state is
    complete.  Application TIMING is nondeterministic (device readiness),
    so the pin is quality equivalence, not bitwise: same closure
    acceptance behavior and an end pose within the sync run's tolerance."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    def run(async_refine):
        online = slam.OnlineSlam(
            method, _cfg(),
            translation_threshold=0.4, angle_threshold=0.15,
            loop_every=4, loop_radius=1.5, loop_min_separation=10,
            robust="gnc_gm", robust_scale="auto",
            odometry_weight=100.0, loop_weight=100.0,
            async_refine=async_refine,
        )
        any_refined = False
        for s in scans:
            u = online.add_scan(s)
            any_refined = any_refined or u.refined
        fin = online.finalize()
        return online, any_refined or fin

    sync_run, _ = run(False)
    async_run, any_refined = run(True)
    assert async_run._async_solve is None  # finalize force-applied
    assert any_refined  # a correction landed (mid-stream or at finalize —
    # on this circle the closure-bearing refine fires near the stream's
    # end, so its async application can fall to the finalize force-apply)
    assert len(async_run._loop_edges) >= 1
    # The trajectory returns to the origin for both.
    end_sync = float(np.linalg.norm(np.asarray(sync_run._pose.translation)))
    end_async = float(np.linalg.norm(np.asarray(async_run._pose.translation)))
    assert end_sync < 0.05, end_sync
    assert end_async < 0.05, end_async
    # Keyframe trajectories agree closely (not bitwise: application timing
    # shifts WHICH add_scan carries each correction).
    ks = np.asarray(sync_run.keyframe_poses.translation)
    ka = np.asarray(async_run.keyframe_poses.translation)
    n = min(len(ks), len(ka))
    assert float(np.max(np.linalg.norm(ks[:n] - ka[:n], axis=-1))) < 0.1


def test_online_slam_async_refine_pipelined(rng):
    """async_refine composes with pipelined mode: the in-flight scan gets
    the async correction through the existing _correction handoff."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    online = slam.OnlineSlam(
        method, _cfg(),
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
        pipelined=True, async_refine=True,
    )
    for s in scans:
        online.add_scan(s)
    online.flush()
    online.finalize()
    assert online._async_solve is None
    assert len(online._loop_edges) >= 1
    end = float(np.linalg.norm(np.asarray(online._pose.translation)))
    assert end < 0.05, end


def test_online_slam_bucket_prefetch_inert(rng):
    """prefetch_buckets=True background-compiles upcoming solver bucket
    shapes (dummy identity inputs, zero edge weights) without touching
    session state: the streamed results are BITWISE identical to the
    prefetch-off run, and the prefetched-shape set is populated."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    def run(prefetch):
        online = slam.OnlineSlam(
            method, _cfg(),
            translation_threshold=0.4, angle_threshold=0.15,
            loop_every=4, loop_radius=1.5, loop_min_separation=10,
            robust="gnc_gm", robust_scale="auto",
            odometry_weight=100.0, loop_weight=100.0,
            prefetch_buckets=prefetch,
        )
        for s in scans:
            online.add_scan(s)
        online.finalize()
        return online

    off = run(False)
    on = run(True)
    assert on._prefetched, "no bucket was prefetched"
    np.testing.assert_array_equal(
        np.asarray(off.keyframe_poses.translation),
        np.asarray(on.keyframe_poses.translation),
    )
    np.testing.assert_array_equal(
        np.asarray(off._pose.translation), np.asarray(on._pose.translation)
    )
