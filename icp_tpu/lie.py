"""SE(2)/SE(3) tangent-space maps (exp/log) for the pose-graph back-end.

The reference has no trajectory or graph optimization at all (SURVEY §5) —
this is net-new capability.  Everything is batched, branch-free (Taylor
guards via ``jnp.where``), and differentiable, so Gauss-Newton Jacobians
come from ``jax.jacfwd`` over these maps.

Conventions: tangent vectors are ``(..., 3)`` for SE(2) as ``(rho_x, rho_y,
theta)`` and ``(..., 6)`` for SE(3) as ``(rho, omega)``; ``exp`` right-
composes into group elements ``x -> R x + t``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import HIGHEST, RigidTransform

Array = jax.Array

_EPS = 1e-8


def _small_cut(dtype) -> float:
    """Dtype-aware small-angle cutoff for the Taylor branches.

    ``eps**0.25`` (the Sophus rule): below this, ``(1 - cos t)/t**2``-style
    expressions lose more than half their bits to cancellation, and in
    float32 the naive branch NaNs under ``jacfwd`` (measured: the SE(3)
    pose-graph solve on float32 odometry edges — theta ~ 1e-4, exactly the
    1e-4 fixed cutoff's blind spot — produced NaN Jacobians while every
    float64 test stayed green).  float32 -> ~1.9e-2, float64 -> ~1.2e-4.
    """
    return float(jnp.finfo(dtype).eps) ** 0.25


def _general_cut(dtype) -> float:
    """Threshold on |sin(theta)| below which log falls back to the
    Taylor/near-pi branches (keeps evaluated-but-unselected denominators
    well away from the cancellation zone in both precisions)."""
    return max(1e-6, float(jnp.finfo(dtype).eps) ** 0.5)


def _safe_norm(v: Array) -> Array:
    """Tiny-regularized Euclidean norm: finite gradient at v = 0 (the exact
    value shifts by ~1e-154 in fp64, far below any tolerance here)."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + jnp.finfo(v.dtype).tiny)


def _sinc(theta: Array) -> Array:
    """sin(theta)/theta with the theta->0 limit."""
    small = jnp.abs(theta) < _small_cut(theta.dtype)
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)


def _cosc(theta: Array) -> Array:
    """(1 - cos(theta))/theta with the theta->0 limit."""
    small = jnp.abs(theta) < _small_cut(theta.dtype)
    safe = jnp.where(small, 1.0, theta)
    return jnp.where(small, theta / 2.0, (1.0 - jnp.cos(safe)) / safe)


def se2_exp(xi: Array) -> RigidTransform:
    """Exponential map R^3 -> SE(2)."""
    rho = xi[..., :2]
    theta = xi[..., 2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    a = _sinc(theta)
    b = _cosc(theta)
    v = jnp.stack(
        [jnp.stack([a, -b], axis=-1), jnp.stack([b, a], axis=-1)], axis=-2
    )
    t = jnp.einsum("...ij,...j->...i", v, rho, precision=HIGHEST)
    return RigidTransform(rot, t)


def se2_log(transform: RigidTransform) -> Array:
    """Log map SE(2) -> R^3 (theta in (-pi, pi])."""
    theta = jnp.arctan2(
        transform.rotation[..., 1, 0], transform.rotation[..., 0, 0]
    )
    a = _sinc(theta)
    b = _cosc(theta)
    # V^{-1} = 1/(a^2+b^2) * [[a, b], [-b, a]]
    denom = a * a + b * b
    vinv = (
        jnp.stack(
            [jnp.stack([a, b], axis=-1), jnp.stack([-b, a], axis=-1)], axis=-2
        )
        / denom[..., None, None]
    )
    rho = jnp.einsum("...ij,...j->...i", vinv, transform.translation, precision=HIGHEST)
    return jnp.concatenate([rho, theta[..., None]], axis=-1)


def _hat3(omega: Array) -> Array:
    """so(3) hat operator ``(..., 3) -> (..., 3, 3)``."""
    o0, o1, o2 = omega[..., 0], omega[..., 1], omega[..., 2]
    z = jnp.zeros_like(o0)
    return jnp.stack(
        [
            jnp.stack([z, -o2, o1], axis=-1),
            jnp.stack([o2, z, -o0], axis=-1),
            jnp.stack([-o1, o0, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega: Array) -> Array:
    """Rodrigues: ``(..., 3) -> (..., 3, 3)``."""
    theta = _safe_norm(omega)
    k = _hat3(omega)
    k2 = jnp.matmul(k, k, precision=HIGHEST)
    a = _sinc(theta)
    small = jnp.abs(theta) < _small_cut(omega.dtype)
    safe = jnp.where(small, 1.0, theta)
    b = jnp.where(
        small, 0.5 - theta * theta / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def so3_log(rot: Array) -> Array:
    """Inverse Rodrigues ``(..., 3, 3) -> (..., 3)``; robust to theta -> 0
    AND differentiation-safe (Gauss-Newton Jacobians flow through this).

    theta comes from ``atan2(|skew|, (trace-1)/2)`` rather than ``arccos``
    (whose derivative blows up at ±1), the skew norm is tiny-regularized so
    ``sqrt`` never sees an exact 0, and every branch of each ``where`` is
    finite for all inputs (the both-branches-evaluated NaN-leak rule).
    Near theta = pi the axis is recovered from the diagonal; accuracy there
    is ~sqrt(eps), adequate for pose-graph increments which are far from pi.
    """
    dtype = rot.dtype
    tiny = jnp.finfo(dtype).tiny
    trace = jnp.trace(rot, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    skew = 0.5 * jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sqrt(jnp.sum(skew * skew, axis=-1) + tiny)  # == |sin(theta)|
    theta = jnp.arctan2(sin_theta, cos_theta)

    # General case: omega = theta / sin(theta) * skew (also exact as
    # theta -> 0 where the factor -> 1).
    general = sin_theta > _general_cut(dtype)
    safe_sin = jnp.where(general, sin_theta, 1.0)
    factor = jnp.where(general, theta / safe_sin, 1.0)
    omega_general = skew * factor[..., None]

    # theta ~ pi (sin small, cos < 0): |axis_i| from the diagonal, signs
    # from the skew part.
    diag = jnp.stack([rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1)
    denom = jnp.maximum(1.0 - cos_theta[..., None], _general_cut(dtype))
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_theta[..., None]) / denom, 0.0, None) + tiny)
    sign = jnp.where(skew >= 0, 1.0, -1.0)
    omega_pi = theta[..., None] * axis_abs * sign

    near_pi = (~general) & (cos_theta < 0.0)
    return jnp.where(near_pi[..., None], omega_pi, omega_general)


def se3_exp(xi: Array) -> RigidTransform:
    """Exponential map R^6 -> SE(3) with ``xi = (rho, omega)``."""
    rho, omega = xi[..., :3], xi[..., 3:]
    theta = _safe_norm(omega)
    k = _hat3(omega)
    k2 = jnp.matmul(k, k, precision=HIGHEST)
    rot = so3_exp(omega)
    small = jnp.abs(theta) < _small_cut(xi.dtype)
    safe = jnp.where(small, 1.0, theta)
    b = jnp.where(
        small, 0.5 - theta * theta / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe)
    )
    c = jnp.where(
        small, 1.0 / 6.0 - theta * theta / 120.0, (safe - jnp.sin(safe)) / (safe**3)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    v = eye + b[..., None, None] * k + c[..., None, None] * k2
    t = jnp.einsum("...ij,...j->...i", v, rho, precision=HIGHEST)
    return RigidTransform(rot, t)


def se3_log(transform: RigidTransform) -> Array:
    """Log map SE(3) -> R^6."""
    omega = so3_log(transform.rotation)
    theta = _safe_norm(omega)
    k = _hat3(omega)
    k2 = jnp.matmul(k, k, precision=HIGHEST)
    small = jnp.abs(theta) < _small_cut(omega.dtype)
    safe = jnp.where(small, 1.0, theta)
    # V^{-1} = I - K/2 + (1/theta^2)(1 - A/(2B)) K^2
    a = _sinc(theta)
    b = jnp.where(
        small, 0.5 - theta * theta / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe)
    )
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        (1.0 - a / (2.0 * b)) / (safe * safe),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    vinv = eye - 0.5 * k + coef[..., None, None] * k2
    rho = jnp.einsum("...ij,...j->...i", vinv, transform.translation, precision=HIGHEST)
    return jnp.concatenate([rho, omega], axis=-1)


def exp(xi: Array, dim: int) -> RigidTransform:
    return se2_exp(xi) if dim == 2 else se3_exp(xi)


def log(transform: RigidTransform) -> Array:
    return se2_log(transform) if transform.dim == 2 else se3_log(transform)


def dof(dim: int) -> int:
    return 3 if dim == 2 else 6
