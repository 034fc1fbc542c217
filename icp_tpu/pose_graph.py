"""Pose-graph optimization back-end (Gauss-Newton over SE(2)/SE(3)).

Net-new vs the reference (no trajectory/back-end at all).  Given keyframe
poses and relative-pose constraints (odometry chains + loop closures from
re-registering keyframe pairs), minimize

    sum_e  w_e * || log( Z_e^{-1} · X_i^{-1} · X_j ) ||^2

over the poses, with pose 0 gauge-fixed.  TPU-native formulation:

* residuals for ALL edges evaluate in one batched pass (gathers + batched
  matmuls + the branch-free tangent maps of :mod:`icp_tpu.lie`);
* Jacobians come from ``jax.jacfwd`` of the tangent perturbation
  ``X_k <- X_k · exp(delta_k)`` — no hand-derived adjoints to get wrong;
* the normal system solves **dense** (small graphs — one
  ``jnp.linalg.solve`` on the MXU), **matrix-free CG** (a jvp/vjp sandwich),
  or — the scalable default for large graphs — **block-Jacobi
  preconditioned CG** on analytic per-edge Jacobian blocks: each edge
  contributes two ``(dof, dof)`` blocks ``A_e = dr/d(delta_i)``,
  ``B_e = dr/d(delta_j)`` (computed in one vmapped ``jacfwd`` pass), so a
  ``J^T J v`` matvec is three batched einsums + two ``segment_sum``
  scatters — O(E·dof²), never materializing anything larger than the edge
  list.  The preconditioner is the inverse of the per-node diagonal
  Hessian blocks (standard for pose graphs, where the diagonal dominates);
* the edge arrays shard over the mesh's ``data`` axis
  (:func:`shard_over_edges`): every einsum/segment_sum partial is local to
  a device's edge shard and XLA inserts the cross-device reduction,
  exactly like a batch of registrations;
* the GN iteration loop is a ``lax.scan`` with a fixed iteration budget
  (compile-once, no host round-trips).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import geometry, lie
from .geometry import RigidTransform

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Nodes ``poses`` (batched transform, T nodes) + relative-pose edges.

    ``edges_ij (E, 2)`` int32 node indices; ``measurements`` the measured
    ``Z_e`` = frame-i-relative pose of frame j; ``weights (E,)`` scalar
    information weights.

    ``sqrt_information`` (optional, ``(E, dof, dof)``): per-edge matrix
    whitener ``L^T`` with ``info = L L^T``
    (:func:`icp_tpu.ops.covariance.sqrt_information`) — anisotropic edge
    trust, e.g. a corridor-to-corridor closure that pins the lateral offset
    but barely constrains the along-corridor translation (the aperture
    problem, ``docs/datasets.md``).  Residuals become
    ``sqrt(w_e) · L_e^T · log(...)``; ``None`` (the default) keeps the
    scalar path bit-identical to before the field existed.  With matrix
    whitening active on an edge, the robust kernels' "geometric" norm for
    that edge is the information-whitened norm divided by ``sqrt(w_e)`` —
    pick ``robust_scale`` (or use ``'auto'``) in those units.
    """

    poses: RigidTransform  # (T, D, D) / (T, D)
    edges_ij: Array  # (E, 2) int32
    measurements: RigidTransform  # (E, D, D) / (E, D)
    weights: Array  # (E,)
    sqrt_information: Array | None = None  # (E, dof, dof) or None

    @property
    def num_nodes(self) -> int:
        return self.poses.translation.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edges_ij.shape[0]

    @property
    def dim(self) -> int:
        return self.poses.dim


def edge_residuals(graph: PoseGraph, poses: RigidTransform) -> Array:
    """Weighted tangent residuals ``(E, dof)`` for all edges at once."""
    i = graph.edges_ij[:, 0]
    j = graph.edges_ij[:, 1]
    xi = RigidTransform(poses.rotation[i], poses.translation[i])
    xj = RigidTransform(poses.rotation[j], poses.translation[j])
    rel = geometry.compose(geometry.inverse(xi), xj)
    err = geometry.compose(geometry.inverse(graph.measurements), rel)
    r = lie.log(err)
    if graph.sqrt_information is not None:
        r = jnp.einsum(
            "eij,ej->ei", graph.sqrt_information, r, precision=geometry.HIGHEST
        )
    return r * jnp.sqrt(graph.weights)[..., None]


def _retract(poses: RigidTransform, delta: Array, dim: int) -> RigidTransform:
    """Right-perturb every pose: ``X_k <- X_k · exp(delta_k)``."""
    step = lie.exp(delta, dim)
    return geometry.compose(poses, step)


def _residual_of_delta(graph: PoseGraph, delta_flat: Array) -> Array:
    dim = graph.dim
    d = lie.dof(dim)
    delta = delta_flat.reshape(graph.num_nodes, d)
    # Gauge fix: node 0 stays put.
    delta = delta.at[0].set(0.0)
    return edge_residuals(graph, _retract(graph.poses, delta, dim)).reshape(-1)


def _edge_linearization(
    graph: PoseGraph, poses: RigidTransform
) -> tuple[Array, Array, Array]:
    """Residuals + analytic per-edge Jacobian blocks, one vmapped pass.

    Returns ``(r (E, dof), A (E, dof, dof), B (E, dof, dof))`` with
    ``A = dr_e/d(delta_i)``, ``B = dr_e/d(delta_j)`` under the right
    perturbation ``X_k <- X_k · exp(delta_k)``.  Each edge touches exactly
    two nodes, so this is the COMPLETE Jacobian in O(E·dof²) storage — the
    structure the dense path throws away by materializing (E·dof, T·dof).
    """
    dim = graph.dim
    d = lie.dof(dim)
    i = graph.edges_ij[:, 0]
    j = graph.edges_ij[:, 1]
    sqw = jnp.sqrt(graph.weights)

    def one(rot_i, tr_i, rot_j, tr_j, rot_z, tr_z, w, lt):
        def res(dd):
            xi = geometry.compose(RigidTransform(rot_i, tr_i), lie.exp(dd[:d], dim))
            xj = geometry.compose(RigidTransform(rot_j, tr_j), lie.exp(dd[d:], dim))
            rel = geometry.compose(geometry.inverse(xi), xj)
            err = geometry.compose(geometry.inverse(RigidTransform(rot_z, tr_z)), rel)
            r0 = lie.log(err)
            if lt is not None:
                r0 = jnp.einsum("ij,j->i", lt, r0, precision=geometry.HIGHEST)
            return r0 * w

        zero = jnp.zeros((2 * d,), dtype=tr_i.dtype)
        return res(zero), jax.jacfwd(res)(zero)

    operands = (
        poses.rotation[i],
        poses.translation[i],
        poses.rotation[j],
        poses.translation[j],
        graph.measurements.rotation,
        graph.measurements.translation,
        sqw,
    )
    if graph.sqrt_information is None:
        r, jac = jax.vmap(lambda *a: one(*a, None))(*operands)
    else:
        r, jac = jax.vmap(one)(*operands, graph.sqrt_information)
    return r, jac[..., :d], jac[..., d:]


ROBUST_KERNELS = ("none", "huber", "cauchy", "welsch", "gnc_gm")


def _robust_weights(rn2: Array, kernel: str, scale: float, mu: Array) -> Array:
    """IRLS weight per edge from the squared GEOMETRIC residual norm.

    ``rn2`` is ``||log(Z^-1 X_i^-1 X_j)||^2`` BEFORE information weighting,
    so ``scale`` is in plain residual units (meters + radians mix), not
    chi².  This deliberately decouples the inlier threshold from the edge's
    information weight: evaluated on whitened residuals instead, a
    ``loop_weight=10`` closure would see its threshold shrink by sqrt(10) —
    measured on the circle-trajectory scenario, that made GNC reject the
    drift-carrying *correct* closure (its whitened residual was 4x the
    short-loop closures').  ``mu`` is the GNC control parameter (ignored by
    the fixed-scale kernels).  All branches are branch-free ``jnp`` so the
    weights trace under jit/vmap/scan.
    """
    c2 = scale * scale
    if kernel == "none":
        return jnp.ones_like(rn2)
    if kernel == "huber":
        rn = jnp.sqrt(rn2 + jnp.finfo(rn2.dtype).tiny)
        return jnp.minimum(1.0, scale / rn)
    if kernel == "cauchy":
        return 1.0 / (1.0 + rn2 / c2)
    if kernel == "welsch":
        return jnp.exp(-rn2 / c2)
    if kernel == "gnc_gm":
        # Geman-McClure surrogate at control mu: mu -> inf is quadratic,
        # mu = 1 is the true GM kernel.  w = (mu c^2 / (r^2 + mu c^2))^2.
        return jnp.square(mu * c2 / (rn2 + mu * c2))
    raise ValueError(f"unknown robust kernel {kernel!r}; one of {ROBUST_KERNELS}")


def _robust_rho(rn2: Array, kernel: str, scale: float, mu: Array) -> Array:
    """Robust cost per edge (the quantity the IRLS weights descend)."""
    c2 = scale * scale
    if kernel == "none":
        return rn2
    if kernel == "huber":
        rn = jnp.sqrt(rn2 + jnp.finfo(rn2.dtype).tiny)
        return jnp.where(rn <= scale, rn2, 2.0 * scale * rn - c2)
    if kernel == "cauchy":
        return c2 * jnp.log1p(rn2 / c2)
    if kernel == "welsch":
        return c2 * (1.0 - jnp.exp(-rn2 / c2))
    if kernel == "gnc_gm":
        return mu * c2 * rn2 / (rn2 + mu * c2)
    raise ValueError(f"unknown robust kernel {kernel!r}; one of {ROBUST_KERNELS}")


def robust_edge_weights(
    graph: PoseGraph,
    robust: str,
    robust_scale: float,
    mu: float = 1.0,
    robust_edges: Array | None = None,
) -> tuple[Array, Array]:
    """Final IRLS weights ``(E,)`` and geometric residual norms ``(E,)`` at
    ``graph.poses``.

    Call this after :func:`optimize` (same ``robust_edges`` mask) to
    classify edges: a converged GNC/Welsch solve drives outlier closures'
    weights to ~0 while inliers sit near 1 — the diagnostic ``run_slam``
    reports for rejected closures.  The returned norms are UNwhitened
    (``||log(Z^-1 X_i^-1 X_j)||``, meters + radians), matching the units of
    ``robust_scale``.
    """
    rn2 = _geometric_rn2(graph, graph.poses)
    mu_a = jnp.asarray(mu, dtype=rn2.dtype)
    w = _robust_weights(rn2, robust, robust_scale, mu_a)
    if robust_edges is not None:
        w = jnp.where(robust_edges, w, jnp.ones_like(w))
    return w, jnp.sqrt(rn2)


def _masked_upper_median(rn: Array, keep: Array) -> Array:
    """Upper median of ``rn`` over ``keep`` (0 if the mask is empty)."""
    big = jnp.asarray(jnp.inf, rn.dtype)
    vals = jnp.sort(jnp.where(keep, rn, big))
    count = jnp.sum(keep)
    return jnp.where(count > 0, vals[jnp.maximum(count // 2, 0)], jnp.zeros_like(big))


def _masked_quantile(rn: Array, keep: Array, q: float) -> Array:
    """Masked quantile with ``np.quantile``'s linear interpolation (0 if the
    mask is empty) — the traced twin of the host-side bootstrap-floor
    statistic in :func:`robust_solve`."""
    big = jnp.asarray(jnp.inf, rn.dtype)
    vals = jnp.sort(jnp.where(keep, rn, big))
    count = jnp.sum(keep)
    pos = q * jnp.maximum(count - 1, 0).astype(rn.dtype)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(count - 1, 0)).astype(jnp.int32)
    frac = pos - lo.astype(rn.dtype)
    # hi is clamped inside the live prefix, so vals[hi] is finite whenever
    # count > 0; the empty-mask branch is masked out below.
    v = vals[lo] * (1.0 - frac) + vals[hi] * frac
    return jnp.where(count > 0, v, jnp.zeros_like(big))


def auto_robust_scale(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "auto",
    cg_iterations: int = 50,
    robust_edges: Array | None = None,
    rule: str = "median",
    early_exit_tol: float | None = None,
) -> Array:
    """Data-driven robust inlier scale from an L2 pre-solve.

    ``rule='median'`` (default): ``2 · upper-median robust-edge residual``
    at the L2 solution.  ``rule='max'`` is the legacy round-3 rule
    (``2 · max``), kept for comparison — it breaks under MULTIPLE outliers
    of differing magnitude, because the threshold keys to the WORST
    outlier's residual and inflates past the milder ones (measured,
    pinned: ``tests/test_robustness.py::test_legacy_max_rule_breaks_on_
    mixed_magnitude_outliers`` — one 8 m + three 1.5 m wrong closures, the
    max rule's scale admits all three mild outliers with weight > 0.9; the
    median rule rejects all four).  The upper median keys to the INLIER
    bulk instead: it tolerates up to half the robust edges being wrong,
    and on graphs with one or two closures it EQUALS the max (sorted[k//2]
    of k<=2 values is the larger), so every single-outlier working window
    measured in round 3 is preserved bit-for-bit.

    Why a residual statistic at all: a correct closure retains a residual
    at the L2 optimum set by the odometry chain's stiffness (it cannot be
    pulled all the way in), so the inlier threshold must sit above that
    retained level; a wrong closure's inconsistency re-emerges during the
    GNC anneal even when the L2 compromise has hidden it (see
    :func:`optimize`).  The scale is floored by HALF the MEDIAN residual
    of the non-robust (odometry) edges — the graph's ambient noise level:
    when the L2 solve satisfies the closures almost exactly (retained
    ~ 0), the closure statistic alone would land below the perturbation a
    single GN step introduces, and the GM weight of even a perfect closure
    cascades to 0 (measured on the clean square scenario: retained 4e-4 m
    vs odometry noise 7e-3 m).  Half, not full: at the full median it
    overshoots the separating window when odometry noise is high relative
    to the closures' retained residuals (measured on the SE(3) scenario:
    floor 0.115 kept the wrong closure at w=0.6 while any scale in
    [0.04, 0.08] rejected it).  Costs one extra L2 solve at the same
    budget.  Returns a traced scalar — safe to feed straight into
    :func:`optimize` / :func:`robust_edge_weights` under jit.

    The rule deliberately sits on the REJECTING side of the trade: when the
    trajectory carries large real drift, even a correct long-loop closure
    retains a residual above the threshold (the kernel then flags it),
    because accepting a WRONG closure corrupts the whole map while
    rejecting a correct one only costs local drift — and the rejection is
    visible in the :func:`robust_edge_weights` diagnostic, never silent.
    Deployments whose odometry drift per loop is large relative to closure
    accuracy should pass an explicit scale above the expected
    retained-drift level (measured example: the 25-step circle scenario
    retains 0.2 m on its true revisit closure; scale 0.8 keeps it, auto
    ~0.4 flags it).
    """
    if rule not in ("median", "max"):
        raise ValueError(f"unknown auto-scale rule {rule!r}; 'median' or 'max'")
    base, _ = optimize(
        graph,
        iterations=iterations,
        damping=damping,
        solver=solver,
        cg_iterations=cg_iterations,
        early_exit_tol=early_exit_tol,
    )
    rn2_base = _geometric_rn2(base, base.poses)
    rn = jnp.sqrt(rn2_base)
    live = graph.weights > 0
    if robust_edges is not None:
        keep_rob = robust_edges & live
        keep_noise = (~robust_edges) & live
    else:
        keep_rob = live
        keep_noise = live
    if rule == "max":
        closure_stat = jnp.max(jnp.where(keep_rob, rn, 0.0))
    else:
        closure_stat = _masked_upper_median(rn, keep_rob)
    noise = _masked_upper_median(rn, keep_noise)
    return jnp.maximum(jnp.maximum(2.0 * closure_stat, 0.5 * noise), 1e-3)


def _geometric_rn2(graph: PoseGraph, poses: RigidTransform) -> Array:
    """Squared UNwhitened residual norms ``(E,)`` (zero-weight-safe)."""
    r = edge_residuals(graph, poses)
    rn2_w = jnp.sum(r * r, axis=-1)
    return _unwhiten(rn2_w, graph.weights)


def _unwhiten(rn2_whitened: Array, weights: Array) -> Array:
    """chi² -> squared geometric norm; zero-weight (padding) edges -> 0."""
    safe = jnp.where(weights > 0, weights, 1.0)
    return jnp.where(weights > 0, rn2_whitened / safe, 0.0)


def _pcg_delta(
    r: Array,
    a_blk: Array,
    b_blk: Array,
    i: Array,
    j: Array,
    num_nodes: int,
    damping: Array | float,
    iterations: int,
) -> Array:
    """Block-Jacobi PCG solve of ``(P Jᵀ J P + λI) delta = -P Jᵀ r``.

    ``P`` projects out node 0 (the gauge).  The Krylov space stays in the
    node-0-free subspace because rhs and preconditioner both vanish there.
    All products are batched (E, dof)-einsums + segment-sums — sharding the
    edge arrays over a mesh axis shards every matvec.
    """
    h = geometry.HIGHEST
    d = r.shape[-1]

    def scatter(vi, vj):
        return jax.ops.segment_sum(vi, i, num_segments=num_nodes) + jax.ops.segment_sum(
            vj, j, num_segments=num_nodes
        )

    jtr = scatter(
        jnp.einsum("eij,ei->ej", a_blk, r, precision=h),
        jnp.einsum("eij,ei->ej", b_blk, r, precision=h),
    )
    rhs = (-jtr).at[0].set(0.0)

    def hv(v):
        vz = v.at[0].set(0.0)
        u = jnp.einsum("eij,ej->ei", a_blk, vz[i], precision=h) + jnp.einsum(
            "eij,ej->ei", b_blk, vz[j], precision=h
        )
        g = scatter(
            jnp.einsum("eij,ei->ej", a_blk, u, precision=h),
            jnp.einsum("eij,ei->ej", b_blk, u, precision=h),
        )
        return g.at[0].set(0.0) + damping * vz

    blocks = jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", a_blk, a_blk, precision=h), i, num_segments=num_nodes
    ) + jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", b_blk, b_blk, precision=h), j, num_segments=num_nodes
    )
    blocks = blocks + damping * jnp.eye(d, dtype=r.dtype)
    minv = jnp.linalg.inv(blocks)

    def prec(v):
        return jnp.einsum("tij,tj->ti", minv, v, precision=h)

    x0 = jnp.zeros_like(rhs)
    z0 = prec(rhs)
    rz0 = jnp.sum(rhs * z0)

    def body(_, carry):
        x, res, z, p, rz = carry
        hp = hv(p)
        denom = jnp.sum(p * hp)
        safe = jnp.where(denom == 0, 1.0, denom)
        alpha = jnp.where(denom == 0, 0.0, rz / safe)
        x = x + alpha * p
        res = res - alpha * hp
        z = prec(res)
        rz_new = jnp.sum(res * z)
        safe_rz = jnp.where(rz == 0, 1.0, rz)
        beta = jnp.where(rz == 0, 0.0, rz_new / safe_rz)
        return x, res, z, p * beta + z, rz_new

    x, *_ = jax.lax.fori_loop(0, iterations, body, (x0, rhs, z0, z0, rz0))
    return x


def optimize(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-6,
    solver: str = "auto",
    cg_iterations: int = 50,
    robust: str = "none",
    robust_scale: float | str | Array = "auto",
    robust_edges: Array | None = None,
    gnc_head: float = 0.25,
    early_exit_tol: float | None = None,
) -> tuple[PoseGraph, Array]:
    """Run Gauss-Newton / IRLS; returns (optimized graph, per-iteration cost).

    ``early_exit_tol`` (fixed-scale kernels + L2 only — GNC's mu anneal is
    a fixed-length schedule by construction): replace the fixed-budget
    ``lax.scan`` with a device-side ``lax.while_loop`` that stops once a
    step improves the cost by less than ``tol`` relative (a REJECTED
    monotone-guard step keeps iterating — the LM damping is still
    adapting).  The cost trace then has length 2 (initial, final) instead
    of ``iterations + 1``.  Why: the solves inside
    :class:`icp_tpu.slam.OnlineSlam`'s fused two-pass refinement converge
    in ~4-8 of their 30 budgeted iterations, so the fixed scan wastes ~3x
    device time on converged no-op steps (round-5 stall decomposition,
    BASELINE.md); offline paths keep the fixed budget (full cost curves,
    fixed-shape traces).

    ``solver='dense'`` builds J explicitly (fine to a few hundred DOF);
    ``'cg'`` is matrix-free conjugate gradient on the normal equations;
    ``'pcg'`` is block-Jacobi preconditioned CG on the analytic per-edge
    Jacobian blocks — O(E·dof²) per matvec, the scalable path (10k nodes /
    30k edges optimize on one device; edge arrays shard over the mesh).
    ``'auto'`` (default) picks dense below 512 variables, else pcg.

    ``robust`` selects a per-edge robust kernel applied by iteratively
    reweighted least squares: each GN iteration computes IRLS weights from
    the current GEOMETRIC residual norms (see :func:`_robust_weights` for
    why not chi²) and scales that iteration's residuals and Jacobians by
    ``sqrt(w_e)``, so outlier edges (wrong loop closures — plausible ICP
    cost, wrong basin) are down-weighted instead of trusted.
    ``'huber'``/``'cauchy'``/``'welsch'`` are fixed-scale kernels;
    ``'gnc_gm'`` is graduated non-convexity on the Geman-McClure kernel
    (Yang et al. 2020) under the three-phase schedule below; give it
    ``iterations >= 30`` — measured: rejection of the bad edge completes by
    ~20, but the trajectory needs the post-rejection tail to relax back to
    the oracle solution (exact oracle match at 30 on every seed).  Prefer
    ``'gnc_gm'`` or the redescending fixed-scale kernels (``'welsch'``,
    ``'cauchy'``) for wrong-closure rejection; ``'huber'`` only *bounds*
    outlier influence — measured on the injected-bad-closure scenario its
    IRLS fixed point is the L2 compromise (the graph bends until every
    closure is inside the threshold), so it does not reject structured
    outliers.

    ``robust_scale`` is the inlier threshold in plain residual units
    (meters + radians; NOT chi² — independent of the edge's information
    weight).  Selection rule: it must sit ABOVE the residual a CORRECT
    closure retains after an L2 solve (set by the odometry chain's
    stiffness — measured 0.03 m on the square scenario, 0.19 m on the
    25-step circle) and BELOW the bending regime where the compromise hides
    the outlier.  The default ``'auto'`` computes exactly that: one L2
    solve, then ``scale = 2 · max closure residual`` at its solution —
    validated on both scenarios above (each needs a different scale; a
    fixed default fails one or the other).  Auto costs a second solve
    (same iteration budget); pass a float to skip it.  Sanity-check any
    choice by inspecting :func:`robust_edge_weights` norms on a
    ``robust='none'`` solve.

    ``robust_edges`` (bool ``(E,)``, default all-True) restricts the kernel
    to a subset of edges; the rest stay exactly quadratic.  Pass a mask that
    selects ONLY the loop-closure edges (``graph_from_trajectory`` orders
    odometry edges first, closures last): odometry edges come from
    sequential scan matching and cannot be wrong *data associations*, and —
    measured in the round-3 design experiments — letting a redescending
    kernel (GM/Welsch at tight scale) touch them lets the solver DISCONNECT
    the chain, after which the outlier closure is satisfied exactly instead
    of rejected.

    The cost trace reports ``sum_e w_e · rho(||r_e||)`` under the active
    kernel (for ``'none'`` that is the classic chi² ``sum w_e ||r_e||^2``);
    for GNC the trace is not comparable across iterations while mu anneals.

    Everything stays jit/vmap/scan-compatible: the mu schedule is a traced
    ``(iterations,)`` array fed through ``lax.scan``, and the IRLS weights
    are stop-gradiented constants within each linearization (standard IRLS).
    """
    if robust not in ROBUST_KERNELS:
        raise ValueError(f"unknown robust kernel {robust!r}; one of {ROBUST_KERNELS}")
    if isinstance(robust_scale, str):
        if robust_scale != "auto":
            raise ValueError(f"robust_scale must be a float or 'auto', got {robust_scale!r}")
        if robust != "none":
            robust_scale = auto_robust_scale(
                graph,
                iterations=iterations,
                damping=damping,
                solver=solver,
                cg_iterations=cg_iterations,
                robust_edges=robust_edges,
            )
        else:
            robust_scale = 1.0
    dim = graph.dim
    d = lie.dof(dim)
    n_var = graph.num_nodes * d
    if solver == "auto":
        solver = "dense" if n_var <= 512 else "pcg"

    dtype = graph.poses.dtype

    def weights_of(rn2, mu):
        w = _robust_weights(rn2, robust, robust_scale, mu)
        if robust_edges is not None:
            w = jnp.where(robust_edges, w, jnp.ones_like(w))
        return w

    def rho_of(rn2, mu):
        rho = _robust_rho(rn2, robust, robust_scale, mu)
        if robust_edges is not None:
            rho = jnp.where(robust_edges, rho, rn2)
        return rho

    if robust == "gnc_gm":
        # Three-phase mu schedule, adapted from Yang et al. (whose fixed
        # 1.4x anneal with one GN step per mu both runs out of budget at
        # mu_0 ~ 1e3 AND starts with biased weights before the quadratic
        # phase has converged — measured: the bias rejected a correct
        # drift-carrying closure):
        #   1. quadratic head (~1/4): mu so large every weight is ~1 — plain
        #      GN to (near) convergence, letting big-but-correct closures
        #      pull the trajectory into their basin first;
        #   2. geometric anneal from mu_0 = 2·max r²/c² (eq. 13) down to 1;
        #   3. refinement tail (~1/4) at the true GM kernel (mu = 1).
        # The max runs over the robust edges only — quadratic edges do not
        # stretch the schedule.
        rn2_init = _geometric_rn2(graph, graph.poses)
        if robust_edges is not None:
            rn2_init = jnp.where(robust_edges, rn2_init, 0.0)
        c2 = robust_scale * robust_scale
        mu0 = jnp.maximum(1.0, 2.0 * jnp.max(rn2_init) / c2)
        # ``gnc_head`` trades two adversarial regimes that conflict at the
        # schedule level (both measured, tests/test_robustness.py):
        # the quadratic head lets a drift-carrying CORRECT closure (often
        # the max residual, so mu0 keys to it and would bias against it)
        # pull the trajectory into its basin before any down-weighting —
        # but it also fully TRUSTS gross outliers for that whole phase,
        # and with several of them the head commits to a corrupted basin
        # the anneal cannot leave (measured at 20-30% random outliers:
        # recall 0.6 with the head vs 1.0 without).  ``gnc_head=0.0`` is
        # the original Yang et al. shape — anneal from step 1 at
        # mu0 = 2·max rn²/c², which still starts NEAR-quadratic (the worst
        # edge's weight is (2/3)², inliers ~1) — the right choice for
        # multi-outlier graphs; the default 0.25 keeps the round-3
        # single-bad-closure windows bit-for-bit.
        head = max(1, int(iterations * gnc_head)) if gnc_head > 0 else 0
        tail = max(1, iterations // 4)
        anneal = max(1, iterations - head - tail)
        k = jnp.arange(iterations, dtype=dtype)
        frac = jnp.clip((k - max(head - 1, 0)) / float(anneal), 0.0, 1.0)
        mu_quad = jnp.asarray(1e12, dtype=dtype)
        mus = jnp.where(k < head, mu_quad, mu0 ** (1.0 - frac))
    else:
        mus = jnp.ones((iterations,), dtype=dtype)

    def gn_step(carry, mu):
        poses, lm_damping = carry
        g = dataclasses.replace(graph, poses=poses)

        def res(delta_flat):
            return _residual_of_delta(g, delta_flat)

        if solver == "pcg":
            r_e, a_blk, b_blk = _edge_linearization(g, poses)
            rn2 = _unwhiten(jnp.sum(r_e * r_e, axis=-1), graph.weights)
            cost = jnp.sum(graph.weights * rho_of(rn2, mu))
            sw = jax.lax.stop_gradient(jnp.sqrt(weights_of(rn2, mu)))
            r_e = r_e * sw[:, None]
            a_blk = a_blk * sw[:, None, None]
            b_blk = b_blk * sw[:, None, None]
            delta = _pcg_delta(
                r_e,
                a_blk,
                b_blk,
                g.edges_ij[:, 0],
                g.edges_ij[:, 1],
                graph.num_nodes,
                lm_damping,
                cg_iterations,
            ).reshape(-1)
        elif solver in ("dense", "cg"):
            zero = jnp.zeros((n_var,), dtype=poses.dtype)
            r0 = res(zero)
            rn2 = _unwhiten(
                jnp.sum(r0.reshape(graph.num_edges, d) ** 2, axis=-1),
                graph.weights,
            )
            cost = jnp.sum(graph.weights * rho_of(rn2, mu))
            sw = jax.lax.stop_gradient(jnp.sqrt(weights_of(rn2, mu)))

            def wres(delta_flat):
                return (res(delta_flat).reshape(graph.num_edges, d) * sw[:, None]).reshape(-1)

            wr0 = (r0.reshape(graph.num_edges, d) * sw[:, None]).reshape(-1)
            if solver == "dense":
                jac = jax.jacfwd(wres)(zero)  # (E*dof, n_var)
                jtj = jnp.matmul(jac.T, jac, precision=geometry.HIGHEST)
                jtr = jnp.matmul(jac.T, wr0, precision=geometry.HIGHEST)
                jtj = jtj + lm_damping * jnp.eye(n_var, dtype=poses.dtype)
                # Jacobi (diagonal) scaling before the factorization:
                # exact-arithmetic no-op, but in f32 the raw normal matrix
                # mixes edge weights (~1e2), unit blocks, and bare damping
                # (1e-6 on bucketed padding nodes) — condition numbers past
                # f32's LU range.  Measured (seq2loop refine bucket,
                # k=113/cap=128, f32): unscaled diverges to NaN on the
                # first GN step from the odometry-chain init; scaled tracks
                # the f64 trajectory.  f64 results change only at roundoff.
                dj = jnp.sqrt(jnp.diagonal(jtj))
                s = 1.0 / jnp.maximum(dj, jnp.finfo(poses.dtype).tiny ** 0.5)
                jtj_s = jtj * s[:, None] * s[None, :]
                delta = -s * jnp.linalg.solve(jtj_s, jtr * s)
            else:
                _, vjp = jax.vjp(wres, zero)

                def jtjv(v):
                    jv = jax.jvp(wres, (zero,), (v,))[1]
                    return vjp(jv)[0] + lm_damping * v

                jtr = vjp(wr0)[0]
                delta, _ = jax.scipy.sparse.linalg.cg(
                    jtjv, -jtr, maxiter=cg_iterations
                )
        else:
            raise ValueError(f"unknown solver {solver!r}")

        delta = delta.reshape(graph.num_nodes, d).at[0].set(0.0)
        new_poses = _retract(poses, delta, dim)
        new_damping = lm_damping
        if robust != "none":
            # Monotone-descent guard (majorization-minimization): the IRLS
            # weights majorize the robust cost, so any step that INCREASES
            # the true robust cost (at the same mu) is an artifact of the
            # linearization — reject it.  Without this, a partially
            # down-weighted correct closure can cascade to rejection (each
            # step grows its residual, which cuts its weight further):
            # measured on the circle scenario, the cascade climbed from
            # robust cost 0.37 to a 3.2 local minimum that cut the one true
            # revisit closure.  Monotone descent provably cannot reach it.
            # A rejected step also RAISES the Levenberg damping 8x (and an
            # accepted one relaxes it 2x toward the configured floor), so
            # the next iteration takes a shorter, more-gradient-like step
            # instead of re-proposing the same rejected one — the classic
            # LM trust-region dynamic, but branch-free in the scan carry.
            # (L2 keeps the unguarded classic GN behavior bit-for-bit.)
            rn2_new = _geometric_rn2(graph, new_poses)
            new_cost = jnp.sum(graph.weights * rho_of(rn2_new, mu))
            accept = new_cost <= cost
            new_poses = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), new_poses, poses
            )
            new_damping = jnp.where(
                accept,
                jnp.maximum(lm_damping * 0.5, damping),
                jnp.minimum(lm_damping * 8.0, 1e3),
            )
        return (new_poses, new_damping), cost

    if early_exit_tol is not None:
        if robust == "gnc_gm":
            raise ValueError(
                "early_exit_tol does not support the gnc_gm schedule "
                "(fixed-length mu anneal)"
            )
        mu1 = jnp.asarray(1.0, dtype=dtype)
        tol = jnp.asarray(early_exit_tol, dtype=dtype)
        big = jnp.asarray(jnp.inf, dtype=dtype)

        def cond(carry):
            _, _, it, _, stop = carry
            return (it < iterations) & ~stop

        def body(carry):
            poses_c, lm, it, prev_cost, _ = carry
            (new_poses, new_lm), cost = gn_step((poses_c, lm), mu1)
            # ``cost`` is evaluated BEFORE the step (at poses_c); the
            # improvement prev_cost -> cost measures the PREVIOUS step.
            # Exiting one step after convergence is harmless (monotone
            # descent), and initial prev_cost = inf keeps step 0 running.
            # A REJECTED monotone-guard step leaves cost unchanged
            # (improvement exactly 0) while the LM damping climbs — that
            # must keep iterating, so rejection (identified by the damping
            # ramp: accept halves it, reject multiplies by 8) vetoes the
            # stop.
            improved = prev_cost - cost
            rejected = new_lm > lm
            stop = ~rejected & (
                improved <= tol * jnp.maximum(cost, jnp.asarray(1e-30, dtype))
            )
            return (new_poses, new_lm, it + 1, cost, stop)

        init = (
            graph.poses, jnp.asarray(damping, dtype=dtype),
            jnp.asarray(0, jnp.int32), big,
            jnp.asarray(False),
        )
        poses, _, _, _, _ = jax.lax.while_loop(cond, body, init)
        rn2_init = _geometric_rn2(graph, graph.poses)
        rn2_fin = _geometric_rn2(dataclasses.replace(graph, poses=poses), poses)
        costs = jnp.stack(
            [
                jnp.sum(graph.weights * rho_of(rn2_init, mu1)),
                jnp.sum(graph.weights * rho_of(rn2_fin, mu1)),
            ]
        )
        return dataclasses.replace(graph, poses=poses), costs

    init_carry = (graph.poses, jnp.asarray(damping, dtype=dtype))
    (poses, _), costs = jax.lax.scan(gn_step, init_carry, mus)
    # costs[k] is evaluated BEFORE step k; append the post-final-step cost so
    # costs has length iterations+1 and costs[-1] reflects the returned poses.
    rn2_final = _geometric_rn2(dataclasses.replace(graph, poses=poses), poses)
    mu_final = mus[-1] if iterations > 0 else jnp.asarray(1.0, dtype=dtype)
    costs = jnp.concatenate(
        [costs, jnp.sum(graph.weights * rho_of(rn2_final, mu_final))[None]]
    )
    return dataclasses.replace(graph, poses=poses), costs




def robust_solve(
    graph: PoseGraph,
    kernel: str = "welsch",
    robust_edges: Array | None = None,
    iterations: int = 30,
    solver: str = "auto",
    cg_iterations: int = 50,
    damping: float = 1e-6,
    robust_scale: float | str = "auto",
    scale_passes: int = 2,
    shrink_bound: float = 8.0,
    gnc_head: float = 0.25,
) -> tuple[PoseGraph, Array, float, Array]:
    """Multi-outlier robust solve: auto scale + bounded iterated
    re-estimation.  Returns ``(optimized graph, costs, scale, weights)``.

    The single-pass auto scale derives from residuals at the CORRUPTED L2
    solution — with 10-30% wrong closures the bend inflates every closure's
    retained residual, so the threshold lands 3-10x above the separating
    window and mid-magnitude outliers survive (measured on
    ``ex_data/manhattan/m600.g2o`` with the Vertigo-style injection
    protocol, :mod:`icp_tpu.robustness`: welsch at the single-pass scale
    leaves recall 0.69-0.93 and 1.9-4.9 m ATE at 20-30% rates).  This
    driver closes the loop: solve at the pass-1 scale, re-estimate the
    scale from the residuals at the ROBUST solution (same median rule —
    now evaluated on a mostly-unbent trajectory), and re-solve cold.

    Two floors keep the re-estimate from collapsing (both measured on the
    m600 protocol, BASELINE.md round-4 table):

    * **bootstrap floor** — the lower-quartile closure residual at the
      INITIAL (odometry) poses.  Each re-solve restarts cold from the
      odometry init (a warm start from the previous solution can be stuck
      in the basin an escaped outlier cluster bent — measured: warm at
      clustered 30% left recall 0.84 / 3.3 m ATE where cold reaches 1.00 /
      0.018 m), and a redescending kernel only bootstraps if the NEAREST
      closures keep enough weight at the init to start pulling the
      trajectory in; the quartile floor guarantees exactly that (without
      it, the 10%-rate cells collapse to scale s/8 and cut 33% of true
      closures).
    * **shrink bound** ``scale / shrink_bound`` per pass — at a
      well-converged solution the surviving closures' residuals sit AT the
      noise floor, so an unbounded ``2·median`` collapses below the inlier
      noise and the kernel feedback-rejects perfect closures (measured:
      unbounded pass-2 scale 2.4-10 on m600 cut 33-96% of true closures).

    With both in place every m600 cell (random + clustered x 10/20/30%)
    measures recall 1.00, inliers-kept 1.00, ATE <= 0.018 m vs the
    outlier-free oracle.  ``scale_passes=2`` (one re-estimation) is the
    validated default: a THIRD pass re-estimates at an already-converged
    solution and lands on the same floors, so extra passes buy nothing.

    Scope note (measured, honest): the two-pass recipe assumes outlier
    residuals separate from inlier retained drift at the pass-1 solution —
    true at mapping scale (hundreds of closures, m600/m3500).  On tiny
    high-drift graphs (the round-3 single-bad-closure scenarios: <= 2
    closures retaining 0.03-0.2 m against odometry noise) pass-1 IS the
    round-3-validated rule and re-estimation can overshoot; use
    ``optimize(robust='gnc_gm', robust_scale='auto')`` there
    (tests/test_robust_posegraph.py pins those windows).
    """
    import numpy as np

    if isinstance(robust_scale, str):
        if robust_scale != "auto":
            raise ValueError(
                f"robust_scale must be a float or 'auto', got {robust_scale!r}"
            )
        scale = float(
            auto_robust_scale(
                graph,
                iterations=iterations,
                damping=damping,
                solver=solver,
                cg_iterations=cg_iterations,
                robust_edges=robust_edges,
            )
        )
    else:
        scale = float(robust_scale)

    def solve(s):
        return optimize(
            graph,
            iterations=iterations,
            damping=damping,
            solver=solver,
            cg_iterations=cg_iterations,
            robust=kernel,
            robust_scale=s,
            robust_edges=robust_edges,
            gnc_head=gnc_head,
        )

    live = np.asarray(graph.weights) > 0
    if robust_edges is not None:
        rob = np.asarray(robust_edges) & live
        noise_mask = ~np.asarray(robust_edges) & live
    else:
        rob = live
        noise_mask = live
    rn_init = np.sqrt(np.asarray(_geometric_rn2(graph, graph.poses)))
    bootstrap = float(np.quantile(rn_init[rob], 0.25)) if rob.any() else 0.0

    opt, costs = solve(scale)
    for _ in range(max(0, scale_passes - 1)):
        rn = np.sqrt(np.asarray(_geometric_rn2(opt, opt.poses)))
        vals = np.sort(rn[rob])
        clo = vals[len(vals) // 2] if len(vals) else 0.0
        nvals = np.sort(rn[noise_mask])
        noise = nvals[len(nvals) // 2] if len(nvals) else 0.0
        new_scale = max(
            2.0 * clo, 0.5 * noise, bootstrap, scale / shrink_bound, 1e-3
        )
        if abs(new_scale - scale) <= 1e-9 * scale:
            break
        scale = new_scale
        opt, costs = solve(scale)
    weights, _ = robust_edge_weights(opt, kernel, scale, robust_edges=robust_edges)
    return opt, costs, scale, weights


def robust_solve_fused(
    graph: PoseGraph,
    robust_edges: Array | None = None,
    kernel: str = "welsch",
    iterations: int = 30,
    solver: str = "auto",
    cg_iterations: int = 50,
    damping: float = 1e-6,
    robust_scale: float | str | Array = "auto",
    scale_passes: int = 2,
    shrink_bound: float = 8.0,
    gnc_head: float = 0.25,
    early_exit_tol: float | None = None,
) -> tuple[PoseGraph, Array, Array, Array]:
    """:func:`robust_solve` as ONE traceable device program (jit-safe).

    Same validated recipe — auto scale from an L2 pre-solve, pass-1 robust
    solve, scale re-estimation at the robust solution under the same floors
    (bootstrap quartile, noise median, ``scale / shrink_bound``), cold
    re-solve — but every statistic is a traced masked reduction
    (:func:`_masked_upper_median` / :func:`_masked_quantile`) instead of a
    host-side NumPy sort, so the whole multi-pass solve compiles to a single
    XLA executable.  That is what lets :class:`icp_tpu.slam.OnlineSlam` run
    the two-pass recipe inside its bucketed jitted refinement without any
    host round-trip or per-scale recompile (the scale is a traced scalar,
    not a Python constant baked into the executable).

    Two deliberate deltas vs the host driver, both semantics-preserving:

    * no early break on a converged scale — the pass count is static
      (``scale_passes`` unrolled); a re-solve at an unchanged scale from the
      same cold init is deterministic, so the result is identical, and with
      the default ``scale_passes=2`` the break never fired anyway;
    * the bootstrap quartile uses ``np.quantile``'s linear interpolation
      re-expressed as a masked traced reduction (exact same value on the
      same inputs — pinned by tests/test_robustness.py fused-parity test).

    Returns ``(optimized graph, costs, scale, weights)``; ``scale`` and
    ``weights`` are traced arrays.  Like :func:`robust_solve`, each pass
    restarts cold from ``graph.poses`` (see that docstring for why warm
    starts lose).  No reference counterpart — the C++ has no pose graph at
    all; recipe validated on the round-4 m600/m3500/sphere2500 protocol
    (BASELINE.md round-4 table).
    """
    if isinstance(robust_scale, str):
        if robust_scale != "auto":
            raise ValueError(
                f"robust_scale must be a float or 'auto', got {robust_scale!r}"
            )
        scale = auto_robust_scale(
            graph,
            iterations=iterations,
            damping=damping,
            solver=solver,
            cg_iterations=cg_iterations,
            robust_edges=robust_edges,
            early_exit_tol=early_exit_tol,
        )
    else:
        scale = jnp.asarray(robust_scale, dtype=graph.poses.dtype)

    live = graph.weights > 0
    if robust_edges is not None:
        rob = robust_edges & live
        noise_mask = (~robust_edges) & live
    else:
        rob = live
        noise_mask = live
    rn_init = jnp.sqrt(_geometric_rn2(graph, graph.poses))
    bootstrap = _masked_quantile(rn_init, rob, 0.25)

    def solve(s):
        return optimize(
            graph,
            iterations=iterations,
            damping=damping,
            solver=solver,
            cg_iterations=cg_iterations,
            robust=kernel,
            robust_scale=s,
            robust_edges=robust_edges,
            gnc_head=gnc_head,
            early_exit_tol=early_exit_tol,
        )

    opt, costs = solve(scale)
    for _ in range(max(0, scale_passes - 1)):
        rn = jnp.sqrt(_geometric_rn2(opt, opt.poses))
        clo = _masked_upper_median(rn, rob)
        noise = _masked_upper_median(rn, noise_mask)
        scale = jnp.maximum(
            jnp.maximum(jnp.maximum(2.0 * clo, 0.5 * noise), bootstrap),
            jnp.maximum(scale / shrink_bound, 1e-3),
        )
        opt, costs = solve(scale)
    weights, _ = robust_edge_weights(opt, kernel, scale, robust_edges=robust_edges)
    return opt, costs, scale, weights


@partial(jax.jit, static_argnames=("min_separation", "k"))
def find_loop_candidates_topk(
    poses: RigidTransform,
    radius: float,
    min_separation: int = 10,
    k: int = 64,
    exclude: Array | None = None,
) -> tuple[Array, Array]:
    """Device-side loop-candidate search: static-shape top-``k`` over the
    (T, T) pose-distance matrix.

    Returns ``(pairs (k, 2) int32, valid (k,) bool)``: the up-to-``k``
    CLOSEST index pairs with ``j > i``, ``j - i >= min_separation`` and
    distance < ``radius``, ordered by ascending distance (ties by row-major
    pair order, matching the host path).  Entirely jittable — no host
    round-trip, no data-dependent shapes — so it runs as one fused kernel
    on the trajectory already resident on device.

    ``exclude`` (bool ``(T, T)``, optional): pairs to skip BEFORE the
    top-``k`` truncation — e.g. already-tried pairs.  Without it a caller
    that filters tried pairs afterwards can starve: once the ``k`` closest
    pairs are all tried, no fresh pair can ever surface regardless of how
    often the search runs (measured on the two-lap merge: refine-to-
    saturation stalled at 21 closures with the trajectory tail un-pinned).
    """
    t = poses.translation
    n = t.shape[0]
    d = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    idx = jnp.arange(n)
    sep = idx[None, :] - idx[:, None]  # j - i
    ok = (d < radius) & (sep >= min_separation)  # sep >= min also forces j > i
    if exclude is not None:
        ok = ok & ~exclude
    masked = jnp.where(ok, d, jnp.asarray(jnp.inf, d.dtype))
    neg, flat_idx = jax.lax.top_k(-masked.reshape(-1), min(k, n * n))
    pairs = jnp.stack([flat_idx // n, flat_idx % n], axis=-1).astype(jnp.int32)
    return pairs, jnp.isfinite(neg)


def find_loop_candidates(
    poses: RigidTransform,
    radius: float,
    min_separation: int = 10,
    max_candidates: int | None = None,
    exclude: Array | None = None,
) -> Array:
    """Candidate loop-closure pairs ``(K, 2)``: trajectory indices whose
    poses are within ``radius`` but at least ``min_separation`` steps apart.

    Pairs are ordered by ascending distance; ``max_candidates`` truncates.
    The search itself is the device-side static-shape top-K
    (:func:`find_loop_candidates_topk`); only the final compaction of the
    validity mask happens on host (the result feeds host-side graph
    construction anyway).  When ``max_candidates`` is None the exact valid-
    pair count comes from one cheap jitted mask reduction first, and the
    top-K budget is that count rounded up to a power of two — ONE top-k
    compile per budget bucket instead of a doubling chain of O(T²)
    recompiles over the minutes-per-compile TPU tunnel (ADVICE round 2).
    """
    import numpy as np

    n = poses.translation.shape[0]
    total = n * n
    if max_candidates is not None:
        budget = max_candidates
    else:
        nvalid = int(
            _count_loop_candidates(poses, radius, min_separation, exclude)
        )
        budget = min(max(1, 1 << (max(1, nvalid) - 1).bit_length()), total)
    pairs, valid = find_loop_candidates_topk(
        poses, radius, min_separation=min_separation, k=budget, exclude=exclude
    )
    return jnp.asarray(np.asarray(pairs)[np.asarray(valid)], dtype=jnp.int32)


@partial(jax.jit, static_argnames=("min_separation",))
def _count_loop_candidates(
    poses: RigidTransform,
    radius: float,
    min_separation: int,
    exclude: Array | None = None,
) -> Array:
    """Exact count of valid loop-candidate pairs — one O(T²) reduction."""
    t = poses.translation
    n = t.shape[0]
    d = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    idx = jnp.arange(n)
    sep = idx[None, :] - idx[:, None]
    ok = (d < radius) & (sep >= min_separation)
    if exclude is not None:
        ok = ok & ~exclude
    return jnp.sum(ok)


def pad_edges(graph: PoseGraph, multiple: int) -> PoseGraph:
    """Pad the edge list to a multiple of ``multiple`` with zero-weight
    (0, 0) self-edges (identity measurements).

    Zero weight scales the padded residuals AND their Jacobian blocks to
    exactly 0, so padding never perturbs the solve — it only rounds the
    edge-shard shapes for even device placement.
    """
    e = graph.num_edges
    pad = (-e) % multiple
    if pad == 0:
        return graph
    dim = graph.dim
    dtype = graph.poses.dtype
    eye = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (pad, dim, dim))
    sqrt_info = graph.sqrt_information
    if sqrt_info is not None:
        d = lie.dof(dim)
        sqrt_info = jnp.concatenate(
            [
                sqrt_info,
                jnp.broadcast_to(jnp.eye(d, dtype=dtype), (pad, d, d)),
            ],
            axis=0,
        )
    return dataclasses.replace(
        graph,
        edges_ij=jnp.concatenate(
            [graph.edges_ij, jnp.zeros((pad, 2), dtype=jnp.int32)], axis=0
        ),
        measurements=RigidTransform(
            jnp.concatenate([graph.measurements.rotation, eye], axis=0),
            jnp.concatenate(
                [graph.measurements.translation, jnp.zeros((pad, dim), dtype=dtype)],
                axis=0,
            ),
        ),
        weights=jnp.concatenate([graph.weights, jnp.zeros((pad,), dtype=dtype)]),
        sqrt_information=sqrt_info,
    )


def pad_nodes(graph: PoseGraph, capacity: int) -> PoseGraph:
    """Pad the node list to exactly ``capacity`` with edge-less replicas of
    the last pose.

    Inert by construction: no edge references a padding node, so every
    padding residual row and Jacobian column is identically zero, and the
    Levenberg damping decouples the padding block in the normal equations —
    dense: its block is ``damping·I`` with zero RHS, so its update is zero;
    CG: the Krylov iterates start at zero in the padding components and
    ``JᵀJ·v + damping·v`` keeps them there.  (:func:`optimize` additionally
    anchors node 0 only, which padding never is.)

    Why: an online back-end's keyframe count grows a few nodes per
    refinement, and an unpadded graph hands :func:`optimize`'s ``lax.scan``
    a NEW shape every time — one XLA compile per refinement, which over a
    remote-TPU tunnel dwarfs the solve itself.  Rounding nodes (here) and
    edges (:func:`pad_edges`) to capacity buckets makes refinements reuse
    one executable per (node-bucket, edge-bucket) pair — the same
    power-of-two bucketing discipline the cloud capacities and the closure
    batch already follow (:func:`icp_tpu.cloud.bucket_capacity`).
    """
    n = graph.num_nodes
    if capacity < n:
        raise ValueError(f"capacity {capacity} < num_nodes {n}")
    if capacity == n:
        return graph
    pad = capacity - n
    dim = graph.dim
    return dataclasses.replace(
        graph,
        poses=RigidTransform(
            jnp.concatenate(
                [
                    graph.poses.rotation,
                    jnp.broadcast_to(graph.poses.rotation[-1], (pad, dim, dim)),
                ],
                axis=0,
            ),
            jnp.concatenate(
                [
                    graph.poses.translation,
                    jnp.broadcast_to(graph.poses.translation[-1], (pad, dim)),
                ],
                axis=0,
            ),
        ),
    )


def shard_over_edges(graph: PoseGraph, mesh, axis: str = "data") -> PoseGraph:
    """Place the edge arrays sharded over ``mesh``'s ``axis``; poses
    replicated.

    With the ``'pcg'`` solver every per-edge einsum then computes on the
    local edge shard and XLA inserts one cross-device reduction per
    ``segment_sum`` — the pose-graph analogue of sharding a registration
    batch over ``data`` (module doc).  Pads the edge count to the axis size
    first (:func:`pad_edges`); zero-weight padding is exact.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    graph = pad_edges(graph, mesh.shape[axis])
    edge = NamedSharding(mesh, P(axis))
    edge2 = NamedSharding(mesh, P(axis, None))
    edge3 = NamedSharding(mesh, P(axis, None, None))
    repl = NamedSharding(mesh, P())
    return PoseGraph(
        poses=RigidTransform(
            jax.device_put(graph.poses.rotation, repl),
            jax.device_put(graph.poses.translation, repl),
        ),
        edges_ij=jax.device_put(graph.edges_ij, edge2),
        measurements=RigidTransform(
            jax.device_put(graph.measurements.rotation, edge3),
            jax.device_put(graph.measurements.translation, edge2),
        ),
        weights=jax.device_put(graph.weights, edge),
        sqrt_information=(
            None
            if graph.sqrt_information is None
            else jax.device_put(graph.sqrt_information, edge3)
        ),
    )


def register_loop_closures(
    clouds,
    poses: RigidTransform,
    candidates: Array,
    method,
    driver_config,
    max_cost: float | None = None,
    coarse: bool = False,
    guesses: RigidTransform | None = None,
    converge_fn=None,
):
    """Register every candidate pair (batched) and return accepted
    ``(edges (K', 2), measurements, costs)``.

    ``converge_fn`` (optional ``(source, target, guess) -> (result, state)``)
    overrides the in-place :func:`icp_tpu.driver.converge` call — callers
    with a compiled/AOT-cached converge entry point
    (:class:`icp_tpu.slam.OnlineSlam`) route the closure batch through it
    so the batch executable participates in the same disk cache.

    ``clouds`` is the batched keyframe cloud stack ``(T, N, D)`` aligned with
    ``poses``.  The relative pose seed is derived from the current poses
    (``X_i^{-1} X_j``); with ``coarse=True`` the global initializer
    (``ops/coarse.py``) seeds instead — the right choice when accumulated
    drift is large enough that the pose-derived seed leaves ICP's basin
    (a wrongly-converged closure silently confirms the drift).  ``guesses``
    (a ``(K,)``-batched transform aligned with ``candidates``) overrides
    both — e.g. the Scan Context yaw seeds
    (:func:`icp_tpu.ops.descriptor.yaw_seeds`), which depend on the scans'
    appearance rather than the drifted poses.
    ``max_cost`` drops closures whose converged cost exceeds it (bad
    closures corrupt graphs — standard practice).
    """
    import numpy as np

    from . import cloud as cloud_mod
    from .driver import converge

    cand = np.asarray(candidates).reshape(-1, 2)
    if cand.size == 0:
        dim = poses.dim
        empty_tf = RigidTransform(
            jnp.zeros((0, dim, dim), dtype=poses.dtype),
            jnp.zeros((0, dim), dtype=poses.dtype),
        )
        return (
            jnp.zeros((0, 2), dtype=jnp.int32),
            empty_tf,
            jnp.zeros((0,), dtype=poses.dtype),
        )
    i, j = cand[:, 0], cand[:, 1]
    src = cloud_mod.PointCloud(clouds.points[j], clouds.count[j])
    tgt = cloud_mod.PointCloud(clouds.points[i], clouds.count[i])
    # Seed: the transform taking frame-j points into frame i under current
    # estimates is X_i^{-1} X_j.
    if guesses is not None:
        seed = guesses
    elif coarse:
        from .ops.coarse import coarse_align_2d, coarse_align_3d

        seed = (coarse_align_2d if poses.dim == 2 else coarse_align_3d)(src, tgt)
    else:
        xi = RigidTransform(poses.rotation[i], poses.translation[i])
        xj = RigidTransform(poses.rotation[j], poses.translation[j])
        seed = geometry.compose(geometry.inverse(xi), xj)

    if converge_fn is not None:
        result, _ = converge_fn(src, tgt, seed)
    else:
        result, _ = converge(method, src, tgt, seed, driver_config)
    # Measurement convention of :class:`PoseGraph`: Z_e = frame-i pose of
    # frame j. Registering j->i yields exactly that transform.
    meas = result.transform
    if max_cost is not None:
        good = np.asarray(result.cost) <= max_cost
        cand = cand[good]
        meas = RigidTransform(meas.rotation[good], meas.translation[good])
        return jnp.asarray(cand, dtype=jnp.int32), meas, result.cost[good]
    return candidates, meas, result.cost


def graph_from_trajectory(
    poses: RigidTransform,
    odometry_measurements: RigidTransform,
    loop_edges: Array | None = None,
    loop_measurements: RigidTransform | None = None,
    odometry_weight: float | Array = 1.0,
    loop_weight: float | Array = 1.0,
    loop_information: Array | None = None,
) -> PoseGraph:
    """Assemble a graph: consecutive odometry edges + optional loop closures.

    ``odometry_measurements`` are frame-t-relative poses of frame t+1
    (length T-1); loop edges/measurements likewise frame-i-relative of j.
    ``odometry_weight`` / ``loop_weight`` are scalars or per-edge arrays —
    per-edge lets a caller carry zero-weight (exactly inert) padding edges,
    which is how :class:`icp_tpu.slam.OnlineSlam` buckets its refinement
    graph inside one jitted assembly.

    ``loop_information`` (``(K, dof, dof)``, optional): per-closure
    information matrices — e.g. the registration-geometry estimate
    :func:`icp_tpu.ops.covariance.point_to_point_information` — whitened
    into the residuals via their Cholesky factors; odometry edges get
    identity blocks (their scalar ``odometry_weight`` still applies).
    Normalize the matrices to a unit-ish scale (e.g. divide by the point
    count) so ``loop_weight`` keeps its meaning as the overall trust knob.
    """
    t = poses.translation.shape[0]
    dtype = poses.dtype
    ij = jnp.stack(
        [jnp.arange(t - 1, dtype=jnp.int32), jnp.arange(1, t, dtype=jnp.int32)],
        axis=-1,
    )
    meas = odometry_measurements
    # Scalar (the common case) or per-edge (T-1,) weights — per-edge lets a
    # caller carry one low-trust chain link, e.g. merge_sessions' bridge
    # edge, whose measurement derives from drifted estimates and must not
    # fight the closures at full odometry stiffness.
    weights = jnp.broadcast_to(
        jnp.asarray(odometry_weight, dtype=dtype), (t - 1,)
    )
    sqrt_info = None
    if loop_edges is not None and loop_edges.shape[0] > 0:
        ij = jnp.concatenate([ij, loop_edges.astype(jnp.int32)], axis=0)
        meas = RigidTransform(
            jnp.concatenate([meas.rotation, loop_measurements.rotation], axis=0),
            jnp.concatenate([meas.translation, loop_measurements.translation], axis=0),
        )
        weights = jnp.concatenate(
            [
                weights,
                jnp.broadcast_to(
                    jnp.asarray(loop_weight, dtype=dtype), (loop_edges.shape[0],)
                ),
            ]
        )
        if loop_information is not None:
            from .ops.covariance import sqrt_information

            d = lie.dof(poses.dim)
            eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (t - 1, d, d))
            sqrt_info = jnp.concatenate(
                [eye, sqrt_information(loop_information).astype(dtype)], axis=0
            )
    return PoseGraph(
        poses=poses, edges_ij=ij, measurements=meas, weights=weights,
        sqrt_information=sqrt_info,
    )
