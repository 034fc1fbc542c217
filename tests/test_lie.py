"""SE(2)/SE(3) tangent map tests: roundtrips, identities, batching."""

import jax.numpy as jnp
import numpy as np

from icp_tpu import geometry, lie


def test_se2_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.uniform(-2, 2, (64, 3)))
    tf = lie.se2_exp(xi)
    np.testing.assert_allclose(np.asarray(lie.se2_log(tf)), np.asarray(xi), atol=1e-10)


def test_se2_exp_small_angle(rng):
    xi = jnp.asarray(rng.uniform(-1, 1, (16, 3)) * jnp.asarray([1.0, 1.0, 1e-9]))
    tf = lie.se2_exp(xi)
    np.testing.assert_allclose(
        np.asarray(tf.translation), np.asarray(xi[:, :2]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(tf.rotation), np.broadcast_to(np.eye(2), (16, 2, 2)), atol=1e-8
    )


def test_se3_exp_log_roundtrip(rng):
    rho = rng.uniform(-2, 2, (64, 3))
    omega_dir = rng.normal(size=(64, 3))
    omega_dir /= np.linalg.norm(omega_dir, axis=-1, keepdims=True)
    theta = rng.uniform(0, 3.0, (64, 1))  # stay below pi
    xi = jnp.asarray(np.concatenate([rho, omega_dir * theta], axis=-1))
    tf = lie.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(lie.se3_log(tf)), np.asarray(xi), atol=1e-8)


def test_se3_exp_is_rigid(rng):
    xi = jnp.asarray(rng.uniform(-1, 1, (32, 6)))
    tf = lie.se3_exp(xi)
    r = np.asarray(tf.rotation)
    np.testing.assert_allclose(
        r @ r.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-12
    )
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)


def test_so3_log_near_pi(rng):
    # Rotation by (pi - 1e-5) about a random axis.
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    theta = np.pi - 1e-5
    omega = jnp.asarray(axis * theta)
    rot = lie.so3_exp(omega)
    back = np.asarray(lie.so3_log(rot))
    np.testing.assert_allclose(back, axis * theta, atol=1e-3)


def test_exp_log_compose_consistency(rng):
    """log(exp(a) ∘ exp(b)) == BCH composition — checked via group compose."""
    a = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 6)))
    b = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 6)))
    lhs = geometry.compose(lie.se3_exp(a), lie.se3_exp(b))
    rhs = lie.se3_exp(lie.se3_log(lhs))
    np.testing.assert_allclose(np.asarray(lhs.rotation), np.asarray(rhs.rotation), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(lhs.translation), np.asarray(rhs.translation), atol=1e-9
    )
