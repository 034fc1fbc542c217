import jax.numpy as jnp
import numpy as np

from icp_tpu.ops.rigid_fit import (
    cross_covariance,
    fit_rigid,
    rotation_from_covariance_2d,
    rotation_from_covariance_3d_quat,
    rotation_from_covariance_3d_svd,
)

from test_geometry import random_transform


def _recover(rng, dim, solver="auto", n=40, noise=0.0):
    t = random_transform(rng, dim)
    a = rng.normal(size=(n, dim)) * 5
    b = np.asarray(a) @ np.asarray(t.rotation).T + np.asarray(t.translation)
    if noise:
        b = b + rng.normal(size=b.shape) * noise
    w = jnp.ones(n)
    fit = fit_rigid(jnp.asarray(a), jnp.asarray(b), w, solver=solver)
    return t, fit


def test_recover_exact_2d(rng):
    for _ in range(10):
        t, fit = _recover(rng, 2)
        np.testing.assert_allclose(fit.rotation, t.rotation, atol=1e-10)
        np.testing.assert_allclose(fit.translation, t.translation, atol=1e-9)


def test_recover_exact_3d_svd(rng):
    for _ in range(10):
        t, fit = _recover(rng, 3, solver="svd")
        np.testing.assert_allclose(fit.rotation, t.rotation, atol=1e-10)
        np.testing.assert_allclose(fit.translation, t.translation, atol=1e-9)


def test_recover_exact_3d_quat(rng):
    for _ in range(10):
        t, fit = _recover(rng, 3, solver="quat")
        np.testing.assert_allclose(fit.rotation, t.rotation, atol=1e-7)
        np.testing.assert_allclose(fit.translation, t.translation, atol=1e-6)


def test_quat_agrees_with_svd_under_noise(rng):
    for _ in range(10):
        t = random_transform(rng, 3)
        a = rng.normal(size=(50, 3))
        b = np.asarray(a) @ np.asarray(t.rotation).T + np.asarray(t.translation)
        b += rng.normal(size=b.shape) * 0.3
        w = jnp.ones(50)
        f_svd = fit_rigid(jnp.asarray(a), jnp.asarray(b), w, solver="svd")
        f_quat = fit_rigid(jnp.asarray(a), jnp.asarray(b), w, solver="quat")
        np.testing.assert_allclose(f_quat.rotation, f_svd.rotation, atol=1e-6)
        np.testing.assert_allclose(f_quat.translation, f_svd.translation, atol=1e-6)


def test_2d_closed_form_equals_svd_det_fix(rng):
    """The closed-form SO(2) solution must equal Eigen's V @ U^T + det fix."""
    for _ in range(50):
        h = rng.normal(size=(2, 2)) * rng.uniform(0.01, 100)
        r_closed = np.asarray(rotation_from_covariance_2d(jnp.asarray(h)))
        u, _, vt = np.linalg.svd(h)
        v = vt.T
        r = v @ u.T
        if np.linalg.det(r) < 0:
            v = v.copy()
            v[:, 1] *= -1
            r = v @ u.T
        np.testing.assert_allclose(r_closed, r, atol=1e-9)


def test_3d_svd_reflection_fix(rng):
    """Covariances with negative det must still yield proper rotations."""
    for _ in range(20):
        h = rng.normal(size=(3, 3))
        for fn, tol in [
            (rotation_from_covariance_3d_svd, 1e-10),
            (rotation_from_covariance_3d_quat, 1e-6),
        ]:
            r = np.asarray(fn(jnp.asarray(h)))
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=tol)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=tol)


def test_3d_quat_equals_svd_on_reflection_heavy_cases(rng):
    """Near-degenerate/reflected covariances: both must find the same optimum."""
    for _ in range(30):
        h = rng.normal(size=(3, 3))
        h = h - 2 * np.outer(h[:, 0], rng.normal(size=3))  # push toward det<0
        r_svd = np.asarray(rotation_from_covariance_3d_svd(jnp.asarray(h)))
        r_quat = np.asarray(rotation_from_covariance_3d_quat(jnp.asarray(h)))
        # compare objective values trace(R H) — optima must match even if
        # the argmax is non-unique
        obj_svd = np.trace(r_svd @ h)
        obj_quat = np.trace(r_quat @ h)
        np.testing.assert_allclose(obj_quat, obj_svd, atol=1e-6)


def test_weighted_fit_ignores_zero_weight_outliers(rng):
    t = random_transform(rng, 2)
    a = rng.normal(size=(30, 2))
    b = np.asarray(a) @ np.asarray(t.rotation).T + np.asarray(t.translation)
    a_all = np.concatenate([a, rng.normal(size=(5, 2)) * 100])
    b_all = np.concatenate([b, rng.normal(size=(5, 2)) * 100])
    w = jnp.asarray([1.0] * 30 + [0.0] * 5)
    fit = fit_rigid(jnp.asarray(a_all), jnp.asarray(b_all), w)
    np.testing.assert_allclose(fit.rotation, t.rotation, atol=1e-9)
    np.testing.assert_allclose(fit.translation, t.translation, atol=1e-8)


def test_cross_covariance_matches_numpy(rng):
    a = rng.normal(size=(20, 3))
    b = rng.normal(size=(20, 3))
    w = rng.uniform(0, 1, size=20)
    h, ca, cb = cross_covariance(jnp.asarray(a), jnp.asarray(b), jnp.asarray(w))
    ca_np = (a * w[:, None]).sum(0) / w.sum()
    cb_np = (b * w[:, None]).sum(0) / w.sum()
    h_np = (w[:, None] * (a - ca_np)).T @ (b - cb_np)
    np.testing.assert_allclose(ca, ca_np, atol=1e-12)
    np.testing.assert_allclose(cb, cb_np, atol=1e-12)
    np.testing.assert_allclose(h, h_np, atol=1e-12)


def test_degenerate_zero_covariance():
    """Single-point / zero-H case: identity rotation (matches Eigen SVD of 0)."""
    a = jnp.asarray([[1.0, 2.0]])
    b = jnp.asarray([[5.0, 7.0]])
    fit = fit_rigid(a, b, jnp.ones(1))
    np.testing.assert_allclose(fit.rotation, np.eye(2), atol=1e-12)
    np.testing.assert_allclose(fit.translation, [4.0, 5.0], atol=1e-12)


def test_all_zero_weights_yield_identity_step():
    a = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = a + 1.0
    fit = fit_rigid(a, b, jnp.zeros(2), solver="svd")
    assert np.all(np.isfinite(np.asarray(fit.rotation)))
    np.testing.assert_allclose(fit.translation, 0.0, atol=1e-12)
