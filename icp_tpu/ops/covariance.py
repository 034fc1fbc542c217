"""Registration certainty: scan-matching information matrices.

A converged registration is not equally certain in every direction — the
aperture problem that shapes method choice on corridor data
(``docs/datasets.md``) also shapes how much a POSE GRAPH should trust each
closure edge: a corridor-to-corridor closure pins the lateral offset
tightly while saying almost nothing about the along-corridor translation.
A scalar edge weight cannot express that; the information MATRIX can
(:class:`icp_tpu.pose_graph.PoseGraph.sqrt_information`).

Formulation (the point-to-line/plane form of Censi, "An accurate
closed-form estimate of ICP's covariance", ICRA 2007; see also "On the
Covariance of ICP-based Scan-matching Techniques", PAPERS.md): the
constraint a surface point contributes is along its NORMAL — tangential
residual components vanish under re-association (points slide along the
surface), which is exactly why the fixed-correspondence point-to-point
``J^T J`` is the WRONG estimate here: its translation block is ``n·I`` for
any geometry (every point resists a rigid translation until it re-matches),
hiding the aperture.  Projecting residuals on normals,

    H = (1/sigma^2) * sum_i w_i * u_i u_i^T,
    u_i = [ n_i , p_i x n_i ]           (dof-vector)

which holds in BOTH dimensions under the :mod:`icp_tpu.lie`
right-perturbation (local-frame tangent ``(rho[, omega])``): the rotation
block is ``n^T (dR p) = p x n`` — in 2D the scalar cross product, in 3D the
vector one.  The shared rotation factor of the converged pose cancels
exactly (``J = R J0`` and ``R^T R = I``), so ``H`` is pose-independent in
the local frame — the frame the pose-graph residuals live in.

``sigma`` is the per-point range noise; leave at 1.0 for a relative trust
shape and normalize by point count before mixing with scalar edge weights
(see :func:`icp_tpu.pose_graph.graph_from_trajectory`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import geometry

Array = jax.Array


def scan_matching_information(
    points: Array,
    normals: Array,
    mask: Array | None = None,
    sigma: float = 1.0,
) -> Array:
    """Normal-projected GN information ``(..., dof, dof)`` (module doc).

    ``points (..., N, D)`` in the scan's local frame, ``normals`` unit
    surface normals per point (e.g.
    :func:`icp_tpu.methods.point_to_plane.estimate_normals`), ``mask``
    validity.  Batched over leading axes.
    """
    dim = points.shape[-1]
    w = (
        jnp.ones(points.shape[:-1], dtype=points.dtype)
        if mask is None
        else mask.astype(points.dtype)
    )
    if dim == 2:
        cross = points[..., 0] * normals[..., 1] - points[..., 1] * normals[..., 0]
        u = jnp.concatenate([normals, cross[..., None]], axis=-1)  # (..., N, 3)
    else:
        cross = jnp.cross(points, normals)
        u = jnp.concatenate([normals, cross], axis=-1)  # (..., N, 6)
    h = jnp.einsum("...ni,...nj,...n->...ij", u, u, w, precision=geometry.HIGHEST)
    return h / (sigma * sigma)


def cloud_information(cloud, k: int = 10, sigma: float = 1.0) -> Array:
    """:func:`scan_matching_information` of a :class:`PointCloud`, with
    normals estimated by the same masked k-NN PCA the point-to-plane method
    uses, normalized by the valid point count (so the result is a
    per-point-average trust SHAPE that composes with scalar edge weights
    instead of multiplying totals by N)."""
    from ..methods.point_to_plane import estimate_normals

    normals = estimate_normals(cloud.points, cloud.mask, k)
    h = scan_matching_information(cloud.points, normals, cloud.mask, sigma)
    n = jnp.maximum(cloud.count.astype(h.dtype), 1.0)
    return h / n[..., None, None]


def sqrt_information(information: Array, eps: float = 1e-6) -> Array:
    """Whitener ``L^T`` with ``info = L L^T`` (batched Cholesky).

    The pose graph whitens residuals as ``r_w = L^T r`` so that
    ``||r_w||^2 = r^T info r``.  ``eps`` (relative to the mean diagonal)
    regularizes rank-deficient information — e.g. a pure two-wall corridor
    constrains only 2 of 3 dof — so the factorization exists; near-null
    directions contribute ~eps of the average constraint.
    """
    dof = information.shape[-1]
    scale = jnp.mean(
        jnp.diagonal(information, axis1=-2, axis2=-1), axis=-1, keepdims=True
    )
    reg = information + (eps * scale[..., None]) * jnp.eye(
        dof, dtype=information.dtype
    )
    chol = jnp.linalg.cholesky(reg)
    return jnp.swapaxes(chol, -1, -2)
