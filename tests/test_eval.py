"""Trajectory metrics (icp_tpu.eval): Umeyama alignment, ATE, RPE.

Net-new vs the reference (no trajectory tooling there); the protocol under
test is the standard TUM benchmark evaluation (Sturm et al. 2012), so the
tests pin the defining invariances: ATE under 'umeyama' is gauge-free, RPE
is gauge-free by construction, and both recover hand-computable errors on
constructed trajectories.
"""

import numpy as np
import pytest
from scipy_free_rotations import rot_zyx

from icp_tpu import eval as tev
from icp_tpu.geometry import RigidTransform

import jax.numpy as jnp


def _traj_2d(rng, t=40):
    th = np.cumsum(rng.normal(0, 0.1, t))
    xy = np.cumsum(rng.normal(0, 0.3, (t, 2)), axis=0)
    rot = np.stack(
        [
            np.stack([np.cos(th), -np.sin(th)], -1),
            np.stack([np.sin(th), np.cos(th)], -1),
        ],
        -2,
    )
    return RigidTransform(jnp.asarray(rot), jnp.asarray(xy))


def _traj_3d(rng, t=30):
    rot = np.stack([rot_zyx(*rng.uniform(-0.4, 0.4, 3)) for _ in range(t)])
    xyz = np.cumsum(rng.normal(0, 0.3, (t, 3)), axis=0)
    return RigidTransform(jnp.asarray(rot), jnp.asarray(xyz))


def _transform_traj(traj, rot, trans, scale=1.0):
    r = np.asarray(traj.rotation)
    t = np.asarray(traj.translation)
    return RigidTransform(
        jnp.asarray(np.einsum("ij,tjk->tik", rot, r)),
        jnp.asarray(scale * t @ rot.T + trans),
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_umeyama_recovers_rigid_transform(rng, dim):
    pts = rng.normal(0, 2.0, (50, dim))
    rot = rot_zyx(0.3, -0.2, 0.5) if dim == 3 else np.array(
        [[np.cos(0.7), -np.sin(0.7)], [np.sin(0.7), np.cos(0.7)]]
    )
    trans = rng.normal(0, 5.0, dim)
    moved = pts @ rot.T + trans
    r, t, s = tev.umeyama_alignment(pts, moved)
    np.testing.assert_allclose(r, rot, atol=1e-10)
    np.testing.assert_allclose(t, trans, atol=1e-9)
    assert s == 1.0
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)


def test_umeyama_recovers_scale(rng):
    pts = rng.normal(0, 1.0, (40, 3))
    rot = rot_zyx(0.1, 0.2, -0.3)
    moved = 2.5 * pts @ rot.T + np.array([1.0, -2.0, 3.0])
    r, t, s = tev.umeyama_alignment(pts, moved, with_scale=True)
    np.testing.assert_allclose(s, 2.5, rtol=1e-10)
    np.testing.assert_allclose(pts * 0 + s * pts @ r.T + t, moved, atol=1e-9)


def test_umeyama_never_returns_reflection(rng):
    # Near-planar configuration — the classic case where the unsigned SVD
    # solution flips to a reflection.
    pts = rng.normal(0, 1.0, (30, 3))
    pts[:, 2] *= 1e-9
    mirrored = pts.copy()
    mirrored[:, 2] *= -1.0
    r, _, _ = tev.umeyama_alignment(pts, mirrored)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-9)


@pytest.mark.parametrize("dim", [2, 3])
def test_ate_gauge_invariance(rng, dim):
    gt = _traj_2d(rng) if dim == 2 else _traj_3d(rng)
    rot = rot_zyx(0.4, -0.1, 0.9) if dim == 3 else np.array(
        [[np.cos(1.1), -np.sin(1.1)], [np.sin(1.1), np.cos(1.1)]]
    )
    est = _transform_traj(gt, rot, rng.normal(0, 10.0, dim))
    res = tev.ate(est, gt)  # umeyama default
    assert res.rmse < 1e-9
    # Without alignment the same estimate scores the full offset.
    raw = tev.ate(est, gt, align="none")
    assert raw.rmse > 1.0


def test_ate_known_error(rng):
    gt = _traj_2d(rng, t=20)
    noise = np.zeros((20, 2))
    noise[10] = [0.3, 0.4]  # single 0.5 m outlier pose
    est = RigidTransform(gt.rotation, gt.translation + jnp.asarray(noise))
    res = tev.ate(est, gt, align="none")
    np.testing.assert_allclose(res.max, 0.5, atol=1e-12)
    np.testing.assert_allclose(res.mean, 0.5 / 20, atol=1e-12)
    np.testing.assert_allclose(res.rmse, np.sqrt(0.25 / 20), atol=1e-12)
    assert res.median == 0.0


def test_ate_first_frame_gauge_matches_manual(rng):
    # The scan-0-frame convention the odometry tests use: express gt in the
    # estimate's start frame by hand, compare errors.
    gt = _traj_2d(rng)
    rot = np.array([[np.cos(0.3), -np.sin(0.3)], [np.sin(0.3), np.cos(0.3)]])
    est = _transform_traj(gt, rot, np.array([5.0, -2.0]))
    res = tev.ate(est, gt, align="first")
    assert res.rmse < 1e-9  # pure gauge change -> zero error in this gauge


def test_ate_shape_mismatch_raises(rng):
    gt = _traj_2d(rng, t=10)
    est = _traj_2d(rng, t=11)
    with pytest.raises(ValueError):
        tev.ate(est, gt)
    with pytest.raises(ValueError):
        tev.ate(_traj_2d(rng, t=10), gt, align="nope")


@pytest.mark.parametrize("dim", [2, 3])
def test_rpe_gauge_free(rng, dim):
    gt = _traj_2d(rng) if dim == 2 else _traj_3d(rng)
    rot = rot_zyx(-0.2, 0.6, 0.1) if dim == 3 else np.array(
        [[np.cos(-0.8), -np.sin(-0.8)], [np.sin(-0.8), np.cos(-0.8)]]
    )
    est = _transform_traj(gt, rot, rng.normal(0, 100.0, dim))
    res = tev.rpe(est, gt, delta=1)
    assert res.trans_rmse < 1e-9
    assert res.rot_rmse_rad < 1e-9


def test_rpe_known_per_step_error(rng):
    # Straight-line gt; estimate drifts a constant 0.01 m per step along x
    # in the (identity-rotation) body frame.
    t = 25
    gt_t = np.stack([np.arange(t, dtype=float), np.zeros(t)], -1)
    eye = np.broadcast_to(np.eye(2), (t, 2, 2))
    gt = RigidTransform(jnp.asarray(eye.copy()), jnp.asarray(gt_t))
    est = RigidTransform(
        jnp.asarray(eye.copy()),
        jnp.asarray(gt_t + np.outer(np.arange(t), [0.01, 0.0])),
    )
    res = tev.rpe(est, gt, delta=1)
    np.testing.assert_allclose(res.trans_rmse, 0.01, atol=1e-12)
    np.testing.assert_allclose(res.rot_rmse_rad, 0.0, atol=1e-12)
    res5 = tev.rpe(est, gt, delta=5)
    np.testing.assert_allclose(res5.trans_rmse, 0.05, atol=1e-12)


def test_rpe_delta_validation(rng):
    gt = _traj_2d(rng, t=10)
    with pytest.raises(ValueError):
        tev.rpe(gt, gt, delta=0)
    with pytest.raises(ValueError):
        tev.rpe(gt, gt, delta=10)


def test_as_dict_round_trip(rng):
    gt = _traj_3d(rng)
    est = _transform_traj(gt, rot_zyx(0.1, 0.0, 0.0), np.zeros(3))
    d = tev.ate(est, gt).as_dict()
    assert set(d) == {"ate_rmse", "ate_mean", "ate_median", "ate_max"}
    r = tev.rpe(est, gt).as_dict()
    assert "rpe_trans_rmse" in r and r["rpe_delta"] == 1
