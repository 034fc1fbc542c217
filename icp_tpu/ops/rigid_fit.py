"""Weighted rigid-transform estimation (Kabsch / Umeyama, point-to-point).

Replaces the per-method SVD blocks of the reference — the 2x2 Jacobi SVD in
the 2D methods (``lib/icp/impl/vanilla.cpp:50-59``, ``trimmed.cpp:75-87``,
``feature_aware.cpp:104-120``) and the 3x3 dynamic JacobiSVD in
``best_fit_transform`` (``lib/icp/impl/vanilla_3d.cpp:47-69``,
``trimmed_3d.cpp:53-75``) — with batched, branch-free closed forms:

* **2D:** the det-fixed ``R = V U^T`` of a 2x2 SVD is exactly the rotation
  maximizing ``trace(R H)`` over SO(2), whose closed form is
  ``theta* = atan2(H01 - H10, H00 + H11)``.  No SVD needed at all.
* **3D:** two paths.  ``solver="svd"`` uses batched ``jnp.linalg.svd`` with
  the reference's reflection fix (flip the last column of V when
  ``det(V U^T) < 0``) — the parity path.  ``solver="quat"`` is the
  speed-of-light TPU path: Horn's quaternion method, finding the dominant
  eigenvector of a symmetric 4x4 via a fixed-sweep batched Jacobi
  eigensolver (pure vectorized ops, no LAPACK).  Both maximize the same
  objective over SO(3) and agree wherever the optimum is unique.

Weights generalize every selection mechanism in the reference: full weights
reproduce ``vanilla``; rank-based 0/1 weights reproduce the sort-and-trim of
``trimmed``/``feature_aware`` (``trimmed.cpp:55-66``); distance-gate weights
reproduce ``trimmed_3d`` (``trimmed_3d.cpp:97-102``).  Weighted sums keep all
shapes static for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import HIGHEST, RigidTransform, weighted_centroid

Array = jax.Array


def cross_covariance(
    source: Array, target: Array, weights: Array
) -> tuple[Array, Array, Array]:
    """Weighted centered cross-covariance ``H = sum_i w_i (a_i - a̅)(b_i - b̅)^T``.

    Returns ``(H, source_centroid, target_centroid)``.  Matches the matrix
    form ``(A.colwise() - a̅) * (B.colwise() - b̅)^T`` of the reference
    (``trimmed.cpp:72-74``) expressed as one einsum, which XLA maps to a
    (D x N)(N x D) matmul.
    """
    ca = weighted_centroid(source, weights)
    cb = weighted_centroid(target, weights)
    a_c = source - ca[..., None, :]
    b_c = target - cb[..., None, :]
    h = jnp.einsum(
        "...ni,...nj,...n->...ij", a_c, b_c, weights, precision=HIGHEST
    )
    return h, ca, cb


def rotation_from_covariance_2d(h: Array) -> Array:
    """Optimal proper rotation for a 2x2 cross-covariance, closed form.

    Equivalent to the reference's SVD + reflection fix
    (``vanilla.cpp:50-59``): both compute ``argmax_{R in SO(2)} trace(R H)``.
    ``trace(R(θ) H) = cosθ (H00+H11) + sinθ (H01-H10)``, maximized at
    ``θ = atan2(H01 - H10, H00 + H11)``.  A zero matrix yields θ = 0
    (identity), matching Eigen's SVD of a zero matrix.
    """
    sin_num = h[..., 0, 1] - h[..., 1, 0]
    cos_num = h[..., 0, 0] + h[..., 1, 1]
    norm = jnp.sqrt(sin_num * sin_num + cos_num * cos_num)
    safe = norm > 0
    inv = jnp.where(safe, 1.0 / jnp.where(safe, norm, 1.0), 1.0)
    c = jnp.where(safe, cos_num * inv, 1.0)
    s = jnp.where(safe, sin_num * inv, 0.0)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotation_from_covariance_3d_svd(h: Array) -> Array:
    """``R = V U^T`` with the reference's reflection fix (flip last V column).

    Mirrors ``best_fit_transform`` (``vanilla_3d.cpp:53-63``).  Batched over
    leading dims; fp64-capable for parity runs.
    """
    u, _, vt = jnp.linalg.svd(h, full_matrices=True)
    v = jnp.swapaxes(vt, -1, -2)
    r = jnp.matmul(v, jnp.swapaxes(u, -1, -2), precision=HIGHEST)
    det = jnp.linalg.det(r)
    flip = jnp.where(det < 0, -1.0, 1.0).astype(h.dtype)
    v_fixed = v.at[..., :, -1].multiply(flip[..., None])
    return jnp.matmul(v_fixed, jnp.swapaxes(u, -1, -2), precision=HIGHEST)


def _jacobi_eigh_sym(a: Array, sweeps: int = 8) -> tuple[Array, Array]:
    """Eigendecomposition of small symmetric matrices by cyclic Jacobi.

    Branch-free, fully batched, fixed iteration count — built for (..., 4, 4)
    quaternion matrices on the VPU where a LAPACK-style solver would be
    serial.  Returns ``(eigenvalues, eigenvectors)`` with eigenvectors in
    columns.  8 cyclic sweeps drive off-diagonals of a 4x4 below fp32 noise
    (quadratic convergence after the first sweeps).
    """
    n = a.shape[-1]
    dtype = a.dtype
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), a.shape)
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def rotate(carry, _):
        a_k, v_k = carry
        for p, q in pairs:
            apq = a_k[..., p, q]
            app = a_k[..., p, p]
            aqq = a_k[..., q, q]
            # Stable Givens: theta = 0.5 * atan2(2 apq, app - aqq)
            theta = 0.5 * jnp.arctan2(2.0 * apq, app - aqq)
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            # Apply G^T A G and V G with G = I except [[c,-s],[s,c]] at (p,q).
            rp = c[..., None] * a_k[..., p, :] + s[..., None] * a_k[..., q, :]
            rq = -s[..., None] * a_k[..., p, :] + c[..., None] * a_k[..., q, :]
            a_k = a_k.at[..., p, :].set(rp).at[..., q, :].set(rq)
            cp = c[..., None] * a_k[..., :, p] + s[..., None] * a_k[..., :, q]
            cq = -s[..., None] * a_k[..., :, p] + c[..., None] * a_k[..., :, q]
            a_k = a_k.at[..., :, p].set(cp).at[..., :, q].set(cq)
            vp = c[..., None] * v_k[..., :, p] + s[..., None] * v_k[..., :, q]
            vq = -s[..., None] * v_k[..., :, p] + c[..., None] * v_k[..., :, q]
            v_k = v_k.at[..., :, p].set(vp).at[..., :, q].set(vq)
        return (a_k, v_k), None

    (a_final, v_final), _ = jax.lax.scan(rotate, (a, eye), None, length=sweeps)
    eigvals = jnp.diagonal(a_final, axis1=-2, axis2=-1)
    return eigvals, v_final


def rotation_from_covariance_3d_quat(h: Array) -> Array:
    """Horn's closed-form absolute orientation: dominant eigenvector of K(H).

    The optimal proper rotation maximizing ``trace(R H)`` corresponds to the
    unit quaternion maximizing ``q^T K q`` with the standard symmetric 4x4
    ``K`` assembled from ``H``.  This is the TPU fast path: pure VPU math,
    no LAPACK, vmap/batch friendly.
    """
    hxx, hxy, hxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    hyx, hyy, hyz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    hzx, hzy, hzz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]
    tr = hxx + hyy + hzz
    k = jnp.stack(
        [
            jnp.stack([tr, hyz - hzy, hzx - hxz, hxy - hyx], axis=-1),
            jnp.stack([hyz - hzy, hxx - hyy - hzz, hxy + hyx, hzx + hxz], axis=-1),
            jnp.stack([hzx - hxz, hxy + hyx, hyy - hxx - hzz, hyz + hzy], axis=-1),
            jnp.stack([hxy - hyx, hzx + hxz, hyz + hzy, hzz - hxx - hyy], axis=-1),
        ],
        axis=-2,
    )
    eigvals, eigvecs = _jacobi_eigh_sym(k)
    best = jnp.argmax(eigvals, axis=-1)
    q = jnp.take_along_axis(eigvecs, best[..., None, None].repeat(4, axis=-2), axis=-1)[..., 0]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # With H = sum a b^T (source rows x target rows), the dominant
    # eigenvector of this K directly parameterizes the source->target
    # rotation matching R = V U^T (verified against the SVD path in tests).
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def _rotation_from_h(h: Array, solver: str) -> Array:
    dim = h.shape[-1]
    if dim == 2:
        return rotation_from_covariance_2d(h)
    if dim == 3:
        if solver == "auto":
            solver = "svd" if h.dtype == jnp.float64 else "quat"
        if solver == "svd":
            return rotation_from_covariance_3d_svd(h)
        if solver == "quat":
            return rotation_from_covariance_3d_quat(h)
        raise ValueError(f"unknown solver {solver!r}")
    raise ValueError(f"unsupported dimension {dim}")


def fit_rigid_indexed(
    source: Array,
    target_points: Array,
    indices: Array,
    weights: Array,
    solver: str = "auto",
    gather: str = "auto",
) -> RigidTransform:
    """``fit_rigid(source, target_points[indices], weights)`` without the
    per-point gather.

    The matched-target terms of the weighted Kabsch are sums, so the gather
    can be absorbed into matmuls against a one-hot selection matrix:
    ``sum_i w_i b_{j(i)} = (w^T 1[j]) B`` and
    ``sum_i w_i a_i b_{j(i)}^T = ((A \\odot w)^T 1[j]) B`` — MXU work instead
    of the TPU's slow dynamic-gather path (measured 3.9x faster at
    (256, 1024, 1024)).  The one-hot path reassociates the sums, so
    ``gather="auto"`` keeps the exact gather ordering for float64 (the
    bit-parity mode) and takes the matmul path otherwise; force with
    ``"onehot"`` / ``"take"``.
    """
    dtype = source.dtype
    if gather == "auto":
        gather = "take" if dtype == jnp.float64 else "onehot"
    if gather == "take":
        # Exact gather + the centered-sum ordering of ``fit_rigid`` — the
        # fp64 parity path stays bit-identical to the pre-existing behavior.
        matched = jnp.take_along_axis(target_points, indices[..., None], axis=-2)
        return fit_rigid(source, matched, weights, solver=solver)
    if gather != "onehot":
        raise ValueError(f"unknown gather mode {gather!r}")
    sw = jnp.sum(weights, axis=-1)
    sw_safe = jnp.maximum(sw, jnp.finfo(dtype).tiny)
    swa = jnp.einsum("...nd,...n->...d", source, weights, precision=HIGHEST)
    m = target_points.shape[-2]
    iota = jnp.arange(m, dtype=indices.dtype)
    oh = (indices[..., None] == iota).astype(dtype)  # (..., N, M)
    # Precision per contraction: ``woh`` stays at the MXU default, which is
    # bit-exact for the 0/1 trim weights of vanilla/trimmed/feature_aware;
    # robust's real-valued IRLS weights see only bf16 rounding of the
    # weight itself there (~0.4% relative — well inside the Welsch kernel's
    # own heuristic slack; coordinates never touch this term).  The two
    # coordinate-carrying (N, M) contractions use HIGH (3-pass bf16 ≈ f32
    # accuracy) — HIGHEST doubles their MXU passes again for accuracy far
    # below f32 rounding of the inputs.
    high = jax.lax.Precision.HIGH
    woh = jnp.einsum("...n,...nm->...m", weights, oh)
    swb = jnp.einsum("...m,...md->...d", woh, target_points, precision=HIGHEST)
    awoh = jnp.einsum(
        "...ni,...n,...nm->...im", source, weights, oh, precision=high
    )
    swab = jnp.einsum("...im,...mj->...ij", awoh, target_points, precision=high)
    ca = swa / sw_safe[..., None]
    cb = swb / sw_safe[..., None]
    h = swab - jnp.einsum("...i,...j->...ij", swa, swb) / sw_safe[..., None, None]
    r = _rotation_from_h(h, solver)
    t = cb - jnp.einsum("...ij,...j->...i", r, ca, precision=HIGHEST)
    return RigidTransform(r, t)


def fit_rigid(
    source: Array,
    target: Array,
    weights: Array,
    solver: str = "auto",
) -> RigidTransform:
    """Weighted least-squares rigid transform taking ``source`` onto ``target``.

    ``min_{R,t} sum_i w_i || R a_i + t - b_i ||^2`` with ``R`` a proper
    rotation.  ``t = b̅ - R a̅`` as in the reference (``vanilla.cpp:63``).

    solver: "auto" (2D closed form; 3D svd in fp64, quat in fp32),
    "svd", or "quat" (3D only).
    """
    h, ca, cb = cross_covariance(source, target, weights)
    r = _rotation_from_h(h, solver)
    t = cb - jnp.einsum("...ij,...j->...i", r, ca, precision=HIGHEST)
    return RigidTransform(r, t)
