"""Multi-session merge (`slam.merge_sessions`): two OnlineSlam runs of the
same environment become ONE jointly-optimized, still-streaming session.

The merge is state union + a bridge odometry edge + one ordinary
(bucketed) refinement — the cross-session closures come from the same
candidate search any refinement runs.  Net-new surface (the reference
registers one pair per process); anchored either explicitly (known
rendezvous) or by global relocalization of b's first keyframe in a's
descriptor database.
"""

import math

import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import slam


def _circle_scans(rng, t_steps=49, radius=4.0, n_world=150, noise=0.02):
    """The test_online_slam world: 49 steps = 7.5 deg/scan (inside the
    point-to-point basin)."""
    world = rng.uniform(-30, 30, (n_world, 2))
    scans, gt = [], []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
        gt.append((px, py, th))
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


def _session(method, **kw):
    base = dict(
        translation_threshold=0.4, angle_threshold=0.15,
        loop_every=4, loop_radius=1.5, loop_min_separation=10,
        robust="gnc_gm", robust_scale="auto",
        odometry_weight=100.0, loop_weight=100.0,
    )
    base.update(kw)
    return slam.OnlineSlam(method, _cfg(), **base)


def test_merge_explicit_anchor_circle(rng):
    """Two half-coverage sessions of the circle, explicit anchor (session
    A's own pose estimate at the handoff scan — the realistic 'robot B
    started where robot A just was' rendezvous): the merged session finds
    cross-session closures, the joint solve lands the end-of-circle pose
    at the origin, and the merged session keeps streaming."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    a = _session(method)
    a_updates = [a.add_scan(s) for s in scans[:32]]
    b = _session(method)
    for s in scans[24:]:
        b.add_scan(s)

    # Session B's world frame is scan 24's frame; session A estimated that
    # scan's pose while streaming — that estimate IS the anchor.
    anchor = a_updates[24].pose
    k_a, k_b = len(a._kf_clouds), len(b._kf_clouds)
    merged, report = slam.merge_sessions(a, b, anchor=anchor)

    assert report.keyframes == (k_a, k_b)
    assert len(merged._kf_clouds) == k_a + k_b
    assert report.refined
    # The bridge chain link is connectivity-only (its measurement derives
    # from a's drifted last-pose estimate — at full odometry weight it
    # fights the closures: measured 0.40 vs 0.10 m ATE on the two-lap
    # merge); the real inter-session constraint is the anchor LOOP edge,
    # robust-guarded like any closure.
    assert merged._odo_weight_scale[k_a - 1] == pytest.approx(1e-3)
    assert all(w == 1.0 for i, w in enumerate(merged._odo_weight_scale) if i != k_a - 1)
    assert (0, k_a) in merged._loop_edges
    # Cross-session revisits exist by construction (B covers A's arc ends).
    assert report.new_closures >= 1, report
    # B's last scan closes the circle: the merged LIVE pose (B's, carried
    # into world_a and jointly re-anchored) returns to the scan-0 origin.
    end_err = float(np.linalg.norm(np.asarray(merged._pose.translation)))
    assert end_err < 0.12, end_err

    # The merged session is a normal OnlineSlam: it keeps accepting scans.
    u = merged.add_scan(scans[1])
    assert u is not None
    assert float(np.linalg.norm(np.asarray(u.pose.translation))) < 1.0


def test_merge_keyframe_ate_vs_ground_truth(rng):
    """Merged keyframe trajectory vs ground truth (in scan-0's frame)."""
    scans, gt = _circle_scans(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    a = _session(method)
    a_upd = [a.add_scan(s) for s in scans[:32]]
    b = _session(method)
    b_upd = [b.add_scan(s) for s in scans[24:]]
    merged, _ = slam.merge_sessions(a, b, anchor=a_upd[24].pose)

    kf_scan_idx = [i for i, u in enumerate(a_upd) if u.is_keyframe] + [
        24 + i for i, u in enumerate(b_upd) if u.is_keyframe
    ]
    # Ground truth in scan-0's frame: q = R0^T (p - p0).
    p0, th0 = gt[0, :2], gt[0, 2]
    c, s = np.cos(th0), np.sin(th0)
    r0 = np.array([[c, -s], [s, c]])
    q = (gt[kf_scan_idx, :2] - p0) @ r0
    err = np.linalg.norm(
        np.asarray(merged.keyframe_poses.translation) - q, axis=-1
    )
    assert float(err.mean()) < 0.1, err.mean()
    assert float(err.max()) < 0.25, err.max()


def _distinctive_circle(rng, t_steps=48):
    """Streaming scans around a circle inside the distinctive world
    (test_descriptor's generator) — Scan Context actually separates
    places here, unlike seq1's aliased corridors."""
    from test_descriptor import distinctive_scan_2d

    world = distinctive_scan_2d(rng, n=400) * 2.5
    scans, gt = [], []
    for k in range(t_steps):
        phi = 2 * math.pi * k / t_steps
        px, py = 1.5 * math.cos(phi), 1.5 * math.sin(phi)
        th = 0.5 * math.sin(phi)
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.02, pts.shape)
        scans.append(icp.from_points(pts, capacity=400, dtype=np.float64))
        gt.append((px, py, th))
    return scans, np.asarray(gt)


def test_merge_descriptor_anchor_recovered_by_relocalization(rng):
    """anchor=None: the inter-session transform comes from relocalizing
    b's first keyframe in a's Scan Context database (distinctive world —
    the documented requirement; aliased corridors would rightly refuse)."""
    scans, gt = _distinctive_circle(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    def sess():
        return _session(
            method, loop_detector="descriptor", descriptor_range=45.0,
            descriptor_max_distance=0.4,
        )

    a = sess()
    for s in scans[:28]:
        a.add_scan(s)
    b = sess()
    for s in scans[20:]:
        b.add_scan(s)

    merged, report = slam.merge_sessions(
        a, b, relocalize_kwargs=dict(max_distance=0.45)
    )
    # The recovered anchor is scan 20's pose in scan 0's frame (th0 = 0,
    # so just the translation offset).
    want_t = gt[20, :2] - gt[0, :2]
    np.testing.assert_allclose(
        np.asarray(report.anchor.translation), want_t, atol=0.12
    )
    assert report.new_closures >= 1, report
    # B's last scan sits just short of the full circle.
    want_end = gt[-1, :2] - gt[0, :2]
    np.testing.assert_allclose(
        np.asarray(merged._pose.translation), want_end, atol=0.15
    )


def test_merge_descriptor_saturates_past_one_budget(rng):
    """Descriptor-mode merge saturation (ADVICE round-4 item 2): before the
    round-5 fix, merge_sessions' first refinement set the retrieval cursor
    to k and later rounds surfaced NO fresh pairs, capping cross-session
    closures at one loop_max_candidates budget.  With the cursor
    re-lowered each saturation round and the tried-pair EXCLUSION spending
    the budget on fresh pairs only, a merge whose candidate budget is
    SMALLER than the available cross-session revisits must accumulate more
    closures than one budget's worth."""
    scans, gt = _distinctive_circle(rng)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))

    def sess():
        return _session(
            method, loop_detector="descriptor", descriptor_range=45.0,
            descriptor_max_distance=0.4, loop_max_candidates=3,
        )

    a = sess()
    for s in scans[:28]:
        a.add_scan(s)
    b = sess()
    for s in scans[20:]:
        b.add_scan(s)
    before = len(a._loop_edges) + len(b._loop_edges)
    merged, report = slam.merge_sessions(
        a, b, relocalize_kwargs=dict(max_distance=0.45)
    )
    # More NEW closures than one 3-candidate budget could ever deliver.
    assert report.new_closures > 3, report
    # merged = both sessions' closures + the anchor edge + the new ones.
    assert len(merged._loop_edges) == before + 1 + report.new_closures
    want_end = gt[-1, :2] - gt[0, :2]
    np.testing.assert_allclose(
        np.asarray(merged._pose.translation), want_end, atol=0.15
    )


def test_merge_3d_seq3d_split():
    """SE(3) merge: seq3d split into two half-loops (GICP front-end).  The
    anchor is session A's estimate at the handoff sweep; the joint solve
    ties B's tail back onto A through the cross closures at the loop's
    revisit.  Pins that every merge step (state surgery, anchor mapping,
    bridge + anchor edge, refinement) is dimension-generic."""
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

    def sess():
        return slam.OnlineSlam(
            method, cfg, translation_threshold=0.5, angle_threshold=0.2,
            loop_every=8, loop_radius=2.0, loop_min_separation=20,
            robust="gnc_gm", robust_scale="auto",
            odometry_weight=100.0, loop_weight=100.0,
        )

    # Overlapping coverage: B starts at sweep 40, which A also processed —
    # A's own estimate of that sweep's pose IS the anchor (the same
    # rendezvous form as the 2D test).
    a = sess()
    a_upd = [a.add_scan(s) for s in clouds[:44]]
    b = sess()
    for s in clouds[40:]:
        b.add_scan(s)

    merged, report = slam.merge_sessions(a, b, anchor=a_upd[40].pose)
    assert report.keyframes[0] + report.keyframes[1] == len(merged._kf_clouds)
    # The loop's revisit spans the session boundary: the merge refinement
    # must register at least the end-of-loop closure.
    assert len(merged._loop_edges) >= 1
    end_err = float(
        np.linalg.norm(np.asarray(merged.keyframe_poses.translation[-1]) - gt_t0[-1])
    )
    assert end_err < 0.05, end_err


def test_merge_validation_errors(rng):
    scans, _ = _circle_scans(rng, t_steps=12)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    a = _session(method)
    b = _session(method)
    with pytest.raises(ValueError, match="at least one keyframe"):
        slam.merge_sessions(a, b)
    for s in scans[:6]:
        a.add_scan(s)
    for s in scans[6:]:
        b.add_scan(s)
    # Radius-mode sessions cannot self-anchor.
    with pytest.raises(ValueError, match="descriptor"):
        slam.merge_sessions(a, b, anchor=None)
