"""Numerics hygiene — the TPU analogue of the reference's sanitizer CI.

The reference compiles with ASan/UBSan in CI (``CMakeLists.txt:14-33``).
The failure modes of a JAX library are different: jit-vs-eager divergence,
precision drift between the fp64 parity path and the fp32 device path, and
NaN leaks through ``where`` branches.  These tests pin all three.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu import geometry, lie


def _scan_pair(rng, n=60, m=70, dtype=np.float64):
    a = rng.uniform(-30, 30, (n, 2))
    ang = 0.15
    c, s = np.cos(ang), np.sin(ang)
    b = np.concatenate(
        [a @ np.array([[c, s], [-s, c]]) + [1.0, -2.0], rng.uniform(-30, 30, (m - n, 2))]
    )
    return (
        icp.from_points(a, dtype=dtype),
        icp.from_points(b, dtype=dtype),
    )


@pytest.mark.parametrize("name", ["vanilla", "trimmed", "robust"])
def test_jit_vs_eager_parity(rng, name):
    """The compiled and op-by-op execution paths must agree exactly."""
    a, b = _scan_pair(rng)
    method = icp.from_method(name, 2)
    state = method.init(a, b, icp.identity(2, dtype=np.float64))
    jit_it = jax.jit(method.iterate)
    s_eager, s_jit = state, state
    for _ in range(3):
        s_eager = method.iterate(s_eager)
        s_jit = jit_it(s_jit)
    np.testing.assert_allclose(
        np.asarray(s_eager.transform.translation),
        np.asarray(s_jit.transform.translation),
        atol=1e-12,
    )


def test_x32_vs_x64_drift_bounded(rng):
    """The fp32 fast path must land within loose tolerance of fp64 on a
    well-conditioned problem (drift here would flag kernel bugs, not fp)."""
    a64, b64 = _scan_pair(rng)
    a32 = icp.PointCloud(a64.points.astype(jnp.float32), a64.count)
    b32 = icp.PointCloud(b64.points.astype(jnp.float32), b64.count)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=30, angle_tolerance=1e-4, translation_tolerance=1e-4)
    r64, _ = icp.converge(method, a64, b64, icp.identity(2, dtype=np.float64), cfg)
    r32, _ = icp.converge(method, a32, b32, icp.identity(2, dtype=np.float32), cfg)
    np.testing.assert_allclose(
        np.asarray(r32.transform.translation),
        np.asarray(r64.transform.translation),
        atol=1e-3,
    )


def test_no_nan_through_degenerate_paths(rng):
    """Degenerate inputs must produce finite outputs, also under jit."""
    checks = []
    # Single-point clouds, coincident points, zero-size valid sets.
    a = icp.from_points(np.zeros((1, 2)), dtype=np.float64)
    b = icp.from_points(np.zeros((1, 2)), dtype=np.float64)
    for name in ["vanilla", "trimmed", "robust"]:
        method = icp.from_method(name, 2)
        state = jax.jit(method.iterate)(method.init(a, b, icp.identity(2, dtype=np.float64)))
        checks.append(np.isfinite(np.asarray(state.transform.rotation)).all())
        checks.append(np.isfinite(np.asarray(state.transform.translation)).all())
    # Lie maps at identity / zero twist.
    checks.append(np.isfinite(np.asarray(lie.se3_log(icp.identity(3, dtype=np.float64)))).all())
    checks.append(
        np.isfinite(np.asarray(lie.se3_exp(jnp.zeros(6, dtype=jnp.float64)).rotation)).all()
    )
    assert all(bool(c) for c in checks)


def test_gradients_finite_through_registration_step(rng):
    """Autodiff through one ICP step stays finite (enables learned
    front-ends / calibration on top of the engine)."""
    a, b = _scan_pair(rng, n=24, m=24)
    method = icp.from_method("robust", 2)

    def loss(translation_guess):
        guess = geometry.RigidTransform(jnp.eye(2, dtype=jnp.float64), translation_guess)
        state = method.init(a, b, guess)
        state = method.iterate(state)
        return jnp.sum(state.transform.translation ** 2)

    g = jax.grad(loss)(jnp.zeros(2, dtype=jnp.float64))
    assert bool(jnp.isfinite(g).all())
