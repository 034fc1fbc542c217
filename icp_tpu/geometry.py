"""Rigid-body transforms and point-cloud geometry as JAX pytrees.

TPU-native replacement for the reference's Eigen-based geometry layer
(``include/icp/geo.h:16-37`` in cornellev/icp):

* ``RBTransform<Dim>`` (an ``Eigen::Transform<double, Dim, Isometry>``) becomes
  :class:`RigidTransform`, a pytree of a rotation matrix ``(..., D, D)`` and a
  translation vector ``(..., D)``.  Arbitrary leading batch dimensions are
  supported everywhere, so a single transform and a ``(B,)`` batch of
  transforms flow through the same code under ``vmap``/``jit``.
* ``PointCloud<Dim>`` (a ``Dim x N`` column-major Eigen matrix) becomes a
  points-as-**rows** array ``(..., N, D)`` plus a validity mask ``(..., N)``.
  XLA requires static shapes, so the reference's "drop +/-inf rows" filtering
  (``common/parse_scan.cpp:37-39``) becomes masking: clouds are padded to a
  fixed N and invalid slots carry ``mask == False``.
* ``get_centroid`` (``geo.h:33-37``, a row-wise mean) becomes the
  mask-weighted :func:`masked_centroid`.

All functions are pure, dtype-polymorphic (fp32 fast path on TPU, fp64 parity
path on CPU with ``jax_enable_x64``), and shape-polymorphic over batch dims.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

Array = jax.Array

# All pose-math contractions are tiny (D = 2/3, or an N-length reduction
# with a D-wide output), so they are bandwidth-bound — but on TPU the MXU's
# default matmul precision rounds inputs to bfloat16, which visibly drifts
# composed rotations off the orthonormal manifold (measured: |col|^2 up to
# 1.024 after ~24 f32 compositions) and shifts converged poses by
# centimeters.  Full precision costs nothing here; the framework's real
# FLOPs live in the per-coordinate distance computation, which the VPU
# already does in f32.
HIGHEST = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidTransform:
    """An SE(D) rigid-body transform ``x -> R @ x + t``.

    Mirrors ``icp::RBTransform<Dim>`` (``include/icp/geo.h:21-24``).  The
    rotation is stored as a full ``(..., D, D)`` matrix (not a quaternion or
    angle) so that composition and application are plain batched matmuls that
    map directly onto the TPU's compute units and stay exact under parity
    testing against the Eigen implementation.
    """

    rotation: Array  # (..., D, D)
    translation: Array  # (..., D)

    @property
    def dim(self) -> int:
        return self.rotation.shape[-1]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.translation.shape[:-1]

    @property
    def dtype(self):
        return self.rotation.dtype

    def __matmul__(self, other: "RigidTransform") -> "RigidTransform":
        return compose(self, other)


def identity(
    dim: int, batch_shape: tuple[int, ...] = (), dtype: Any = jnp.float32
) -> RigidTransform:
    """The identity transform, analogous to ``RBTransform::Identity()``."""
    rot = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (*batch_shape, dim, dim))
    trans = jnp.zeros((*batch_shape, dim), dtype=dtype)
    return RigidTransform(rot, trans)


def compose(outer: RigidTransform, inner: RigidTransform) -> RigidTransform:
    """``outer ∘ inner`` — apply ``inner`` first.

    Matches Eigen's ``step * transform`` left-composition used in every
    method's update (e.g. ``lib/icp/impl/vanilla.cpp:65``):
    ``R = R_outer @ R_inner``, ``t = R_outer @ t_inner + t_outer``.
    """
    rot = jnp.matmul(outer.rotation, inner.rotation, precision=HIGHEST)
    trans = (
        jnp.einsum(
            "...ij,...j->...i", outer.rotation, inner.translation,
            precision=HIGHEST,
        )
        + outer.translation
    )
    return RigidTransform(rot, trans)


def project_rotation(rotation: Array) -> Array:
    """Nearest SO(D) matrix in Frobenius norm (batched polar factor).

    Long-running compose chains drift off the rotation manifold — in f32
    the drift is MULTIPLICATIVE scale loss, because :func:`inverse` uses
    the transpose (``det(Rᵀ) = det(R)``, so a scale error never cancels, it
    compounds through every ``inverse``/``compose`` round trip).  Measured
    on the f32 seq2loop online-SLAM stream: keyframe rotation determinants
    decayed to 2.6e-4 (and captured odometry-measurement rotations to 7e-8)
    after ~16 refine/re-anchor cycles, at which point the pose-graph
    linearization returns NaN Jacobians.  Streaming surfaces re-project at
    the keyframe boundary (:class:`icp_tpu.slam.OnlineSlam`); one-shot
    registration pipelines never chain long enough to need it.

    SVD polar with the same det-sign convention as the rigid fit (flip the
    last singular direction, ``lib/icp/impl/vanilla.cpp:50-59``) so the
    result stays a proper rotation even for badly-degraded inputs.
    """
    u, _, vt = jnp.linalg.svd(rotation)
    det = jnp.linalg.det(jnp.matmul(u, vt, precision=HIGHEST))
    u = u.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return jnp.matmul(u, vt, precision=HIGHEST)


def renormalize(transform: RigidTransform) -> RigidTransform:
    """Re-project a transform's rotation onto SO(D) (see
    :func:`project_rotation`); the translation passes through."""
    return RigidTransform(project_rotation(transform.rotation), transform.translation)


def apply(transform: RigidTransform, points: Array) -> Array:
    """Apply a transform to points ``(..., N, D) -> (..., N, D)``.

    The reference's ``transform * cloud`` (points as columns) becomes
    ``points @ R^T + t`` for points as rows.
    """
    return (
        jnp.einsum(
            "...nd,...ed->...ne", points, transform.rotation, precision=HIGHEST
        )
        + transform.translation[..., None, :]
    )


def inverse(transform: RigidTransform) -> RigidTransform:
    """Inverse transform: ``R^T, -R^T t``."""
    rot_t = jnp.swapaxes(transform.rotation, -1, -2)
    trans = -jnp.einsum(
        "...ij,...j->...i", rot_t, transform.translation, precision=HIGHEST
    )
    return RigidTransform(rot_t, trans)


def from_angle_2d(angle: Array, translation: Array | None = None) -> RigidTransform:
    """SE(2) transform from a rotation angle (radians) and optional translation."""
    angle = jnp.asarray(angle)
    c, s = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )
    if translation is None:
        translation = jnp.zeros((*angle.shape, 2), dtype=rot.dtype)
    return RigidTransform(rot, jnp.asarray(translation, dtype=rot.dtype))


def rotation_angle_2d(rotation: Array) -> Array:
    """Smallest signed rotation angle of a 2D rotation matrix.

    Equivalent to ``Eigen::Rotation2Dd(R).smallestAngle()`` used by the
    driver's transform-tolerance criterion (``include/icp/driver.h:196-198``):
    ``atan2(R[1,0], R[0,0])`` which already lies in ``(-pi, pi]``.
    """
    return jnp.arctan2(rotation[..., 1, 0], rotation[..., 0, 0])


def rotation_angle_3d(rotation: Array) -> Array:
    """Axis-angle rotation magnitude of a 3D rotation matrix, in ``[0, pi]``.

    Equivalent to ``Eigen::AngleAxisd(R).angle()`` used by the driver's 3D
    transform-tolerance criterion (``include/icp/driver.h:200-204``).
    Computed as ``atan2(|skew(R)|, (trace - 1)/2)`` — the sin/cos pair —
    which, like Eigen's quaternion-based path, keeps full precision for
    tiny angles where the plain ``acos`` form loses half the significant
    digits (acos'(1) is singular).
    """
    trace = jnp.trace(rotation, axis1=-2, axis2=-1)
    cos_angle = (trace - 1.0) / 2.0
    skew = 0.5 * jnp.stack(
        [
            rotation[..., 2, 1] - rotation[..., 1, 2],
            rotation[..., 0, 2] - rotation[..., 2, 0],
            rotation[..., 1, 0] - rotation[..., 0, 1],
        ],
        axis=-1,
    )
    sin_angle = jnp.linalg.norm(skew, axis=-1)
    return jnp.arctan2(sin_angle, cos_angle)


def rotation_angle(rotation: Array) -> Array:
    """Dispatch to the 2D/3D rotation-angle extraction by trailing shape."""
    dim = rotation.shape[-1]
    if dim == 2:
        return rotation_angle_2d(rotation)
    if dim == 3:
        return rotation_angle_3d(rotation)
    raise ValueError(f"unsupported dimension {dim}")


def masked_centroid(points: Array, mask: Array | None = None) -> Array:
    """Mask-weighted centroid ``(..., N, D) -> (..., D)``.

    Replaces ``icp::get_centroid`` (``include/icp/geo.h:33-37``); with a full
    mask it reduces to the reference's row-wise mean.
    """
    if mask is None:
        return jnp.mean(points, axis=-2)
    w = mask.astype(points.dtype)
    total = jnp.sum(w, axis=-1)
    sums = jnp.einsum("...nd,...n->...d", points, w, precision=HIGHEST)
    return sums / jnp.maximum(total, 1.0)[..., None]


def weighted_centroid(points: Array, weights: Array) -> Array:
    """Weighted centroid with real-valued weights ``(..., N)``.

    Degenerate all-zero weights yield the origin instead of NaN — a conscious
    deviation from the reference's empty-selection division by zero
    (``lib/icp/impl/trimmed_3d.cpp:97-113`` feeds 3x0 matrices to Eigen).
    """
    total = jnp.sum(weights, axis=-1)
    sums = jnp.einsum("...nd,...n->...d", points, weights, precision=HIGHEST)
    return sums / jnp.maximum(total, jnp.finfo(points.dtype).tiny)[..., None]
