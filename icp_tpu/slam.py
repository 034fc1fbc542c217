"""SLAM pipelines: one-call offline (:func:`run_slam`) and incremental
online (:class:`OnlineSlam`).

Offline: the full back-end the CLI drives — coarse-seeded odometry →
loop-closure detection → closure registration → robust pose-graph
optimization — as a single library entry point
(``icp-tpu odometry --coarse --loop-radius ... --robust-kernel gnc_gm``).

Online: scans arrive one at a time; keyframe odometry streams on the
jitted converge, closures register periodically, the robust graph solve
re-anchors the LIVE pose mid-stream, and the whole streaming state
checkpoints for bit-identical crash resume
(:func:`icp_tpu.resilient.resumable_online_slam`;
``icp-tpu odometry --online``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp

import numpy as np

from . import geometry, odometry, pose_graph
from .cloud import PointCloud
from .driver import DriverConfig
from .methods.base import Method
from .geometry import RigidTransform


@dataclasses.dataclass(frozen=True)
class OnlineUpdate:
    """One :meth:`OnlineSlam.add_scan` result."""

    pose: RigidTransform  # live world-from-scan pose (refined frame)
    is_keyframe: bool
    refined: bool  # a loop-closure refinement ran on this scan
    num_closures: int  # accepted closures so far


def _masked_median(hist: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """``np.median`` over the LAST ``count`` entries of ``hist`` (newest at
    the end), as a traced scalar — the device-side twin of the host
    ``float(np.median(hist))`` in the serial :meth:`OnlineSlam.add_scan`
    path, including the even-count middle-pair average, so the pipelined
    mode's anomaly predicate is bit-identical to the serial one."""
    n = hist.shape[0]
    valid = jnp.arange(n) >= n - count
    big = jnp.asarray(jnp.inf, hist.dtype)
    vals = jnp.sort(jnp.where(valid, hist, big))
    lo = vals[jnp.maximum((count - 1) // 2, 0)]
    hi = vals[jnp.maximum(count // 2, 0)]
    return 0.5 * (lo + hi)


def _online_step(
    fn,
    prev_scan: PointCloud,
    prev_pose: RigidTransform,
    scan: PointCloud,
    hist: jnp.ndarray,
    count: jnp.ndarray,
    retry_factor: float,
):
    """One fused pipelined-SLAM advance, entirely on device: scan-to-scan
    registration (identity seed) + the cost-anomaly coarse retry under
    ``lax.cond`` (only the taken branch executes at runtime, so the retry
    converge costs nothing on clean scans).  Returns
    ``(pose, cost, new_hist, new_count)`` — all traced; the ONLY host
    materialization in the pipelined path is the deferred promotion
    predicate one scan later (:meth:`OnlineSlam._materialize_pending`).

    Why scan-to-scan rather than the serial path's scan-to-keyframe: the
    pipelined dispatch cannot see the promotion decided for the still
    in-flight previous scan, so a keyframe-anchored registration spans up
    to TWO keyframe periods with an identity seed — outside trimmed ICP's
    basin on real corridor data (measured on seq1: 5.6 m end drift vs the
    serial 0.85 m).  Seeding that doubled gap from the in-flight pose is
    worse still: in a perceptually aliased corridor the cost is flat along
    the corridor axis, so whatever motion the seed asserts is accepted and
    a velocity error integrates linearly (measured: 15 m).  Adjacent scans
    are ALWAYS one scan of motion apart — identity-seeded registration is
    well-conditioned regardless of promotion cadence, the previous pose
    chains as a device value (no host sync), and the accumulated-drift
    price is modest (measured on seq1: 1.00 m scan-to-scan vs 0.85 m
    keyframe-anchored, before loop closure).

    The serial path pays a full host round-trip per scan for the anomaly
    check this step runs on device (``float(result.cost)`` against a host
    median — measured over the TPU tunnel: the sync dominates the
    1.4-35 ms of compute, VERDICT round-3 item 2)."""
    import jax

    from .ops.coarse import coarse_align_2d, coarse_align_3d

    def register(guess):
        result, _ = fn(prev_scan, scan, guess)
        # prev->scan registration transform T: pose advances by inv(T)
        # (the stream_step convention, odometry.py).
        return (
            geometry.compose(prev_pose, geometry.inverse(result.transform)),
            result.cost,
        )

    pose, cost = register(geometry.identity(scan.dim, dtype=scan.dtype))
    med = _masked_median(hist, count)
    anomalous = (count >= 4) & (cost > retry_factor * med)
    coarse = coarse_align_2d if scan.dim == 2 else coarse_align_3d

    def retry(_):
        pose2, cost2 = register(coarse(prev_scan, scan))
        better = cost2 < cost
        return jax.tree.map(
            lambda a, b: jnp.where(better, a, b), (pose2, cost2), (pose, cost)
        )

    pose, cost = jax.lax.cond(anomalous, retry, lambda _: (pose, cost), None)
    new_hist = jnp.concatenate([hist[1:], cost[None]])
    new_count = jnp.minimum(count + 1, hist.shape[0])
    return pose, cost, new_hist, new_count


def _wrap_for(aot_cache: str | None):
    """jit wrapper for an entry point: plain ``jax.jit`` or the disk-backed
    AOT executable cache (:mod:`icp_tpu.aot`) when a cache dir is set."""
    import jax

    if aot_cache is None:
        return jax.jit
    from . import aot

    return lambda f: aot.cached_jit(f, directory=aot_cache or None)


@functools.lru_cache(maxsize=None)
def _shared_converge_fn(method: Method, config: DriverConfig, aot_cache=None):
    """Process-shared compiled converge for (method, config).

    Sessions sharing knobs share ONE jit object — tracing and compilation
    are paid once per process per abstract shape, not once per
    :class:`OnlineSlam` instance.  (Measured on the chip bench: per-
    instance jit objects made every fresh session re-trace its whole
    executable set even though the persistent compile cache was warm; the
    accepting-refine stall read seconds of pure host-side re-tracing.)"""
    from .driver import converge

    return _wrap_for(aot_cache)(
        lambda source, target, guess: converge(method, source, target, guess, config)
    )


@functools.lru_cache(maxsize=None)
def _shared_device_step(
    method: Method, config: DriverConfig, retry_factor: float, aot_cache=None
):
    """Process-shared pipelined device step (see :func:`_online_step`).

    The inner converge stays the plain-jit shared object both because an
    AOT-cached executable cannot be called under tracing AND because the
    nested-jit call boundary keeps the pipelined trace fusing IDENTICALLY
    to the standalone serial executable (the pipelined-vs-serial bitwise
    pins; inlining the raw function drifted results at the 1-ulp level)."""
    fn_inner = _shared_converge_fn(method, config)
    return _wrap_for(aot_cache)(
        lambda prev_scan, prev_pose, scan, hist, count: _online_step(
            fn_inner, prev_scan, prev_pose, scan, hist, count, retry_factor
        )
    )


def _assemble_graph(poses_r, poses_t, odo_r, odo_t, odo_w,
                    loop_ij, loop_r, loop_t, loop_w, loop_info):
    """Traced graph assembly from bucket-padded stacks (zero-weight =
    exactly inert padding) + the robust-edge mask (real closures only)."""
    graph = pose_graph.graph_from_trajectory(
        RigidTransform(poses_r, poses_t),
        RigidTransform(odo_r, odo_t),
        loop_edges=loop_ij,
        loop_measurements=RigidTransform(loop_r, loop_t),
        odometry_weight=odo_w,
        loop_weight=loop_w,
        loop_information=loop_info,
    )
    mask = jnp.concatenate([jnp.zeros((odo_r.shape[0],), bool), loop_w > 0])
    return graph, mask


def _chain_init(poses_r, poses_t, odo_r, odo_t):
    """Absolute poses from the immutable odometry chain (log-depth):
    ``X_0`` = current first-keyframe pose (the gauge), ``X_{i+1} = X_i ∘
    Z_i``.  Identity-padded measurements extend the last pose over the
    node-bucket tail (edge-less there, so inert)."""
    import jax

    def combine(a, b):
        ra, ta = a
        rb, tb = b
        rot = jnp.matmul(ra, rb, precision=geometry.HIGHEST)
        tr = jnp.einsum("...ij,...j->...i", ra, tb, precision=geometry.HIGHEST) + ta
        return rot, tr

    rots = jnp.concatenate([poses_r[:1], odo_r], axis=0)
    trans = jnp.concatenate([poses_t[:1], odo_t], axis=0)
    pr, pt = jax.lax.associative_scan(combine, (rots, trans))
    # Re-project the scan products onto SO(D): a length-k f32 product
    # otherwise contracts (det ~ prod of per-factor dets), and feeding
    # contracted poses back through the promote/refine cycle compounds
    # EXPONENTIALLY (measured on the f32 seq2loop stream: keyframe dets
    # 2.6e-4, NaN Jacobians by refine ~5 — geometry.project_rotation's
    # docstring carries the numbers).
    return RigidTransform(geometry.project_rotation(pr), pt)


@functools.lru_cache(maxsize=None)
def _shared_graph_solvers(
    robust: str,
    robust_scale,
    gn_iterations: int,
    gn_solver: str,
    mapping_kernel: str,
    passes: int,
    aot_cache=None,
):
    """Process-shared bucketed refinement solvers: one jitted executable
    per (node-bucket, closure-bucket) shape pair, shared by every session
    with equal knobs (see :func:`_shared_converge_fn` for why sharing).

    The GRAPH ASSEMBLY (graph_from_trajectory + robust-edge mask) happens
    INSIDE the jitted program: the caller hands over bucket-padded
    pose/measurement stacks and per-edge weight vectors, so a refinement
    costs ~10 eager pad/fold dispatches instead of ~30 growing assembly
    ops (BASELINE.md round-4 continuation lever, built in round 5).
    Kernel/solver/iteration knobs are static; weights and the node count
    move as traced arrays, so the closure boundary shifting inside a
    bucket reuses the executable.  Both solvers return
    ``(poses, edge_weights, scale)``."""

    def _solve_single(*args):
        graph, mask = _assemble_graph(*args)
        if robust == "none":
            g, _ = pose_graph.optimize(
                graph, iterations=gn_iterations, solver=gn_solver,
            )
            one = jnp.ones((graph.num_edges,), graph.weights.dtype)
            return g.poses, one, jnp.asarray(1.0, graph.weights.dtype)
        # Resolving 'auto' here (instead of inside optimize) is the same
        # auto_robust_scale call with the same arguments — bitwise
        # identical — but hands the scale back for the weights diagnostic
        # without re-solving.
        if isinstance(robust_scale, str):
            scale = pose_graph.auto_robust_scale(
                graph, iterations=gn_iterations, solver=gn_solver,
                robust_edges=mask,
            )
        else:
            scale = jnp.asarray(robust_scale, graph.poses.dtype)
        g, _ = pose_graph.optimize(
            graph, iterations=gn_iterations, solver=gn_solver,
            robust=robust, robust_scale=scale, robust_edges=mask,
        )
        w, _ = pose_graph.robust_edge_weights(g, robust, scale, robust_edges=mask)
        return g.poses, w, scale

    def _solve_two_pass(*args):
        graph, mask = _assemble_graph(*args)
        # Cold odometry-chain init — robust_solve's own requirement (a
        # warm start can be stuck in a basin an outlier cluster bent), and
        # what keeps the CLEAN streaming case healthy: at the
        # already-refined poses every scale statistic sits at the
        # registration noise floor, the bootstrap floor (quartile of init
        # residuals) vanishes, and the re-estimated scale feedback-rejects
        # perfect closures (measured on the clean seq2loop stream: 60% of
        # true closures cut by the final refinement; with the chain init,
        # none).
        init = _chain_init(args[0], args[1], args[2], args[3])
        graph = dataclasses.replace(graph, poses=init)
        # Device-side early exit (optimize's early_exit_tol): the three
        # chained GN solves converge in ~4-8 of their 30 budgeted
        # iterations from the chain init, so the fixed scan wasted ~3x
        # device time (round-5 stall decomposition, BASELINE.md).  The
        # streaming quality bounds (seq2loop outlier protocol R/K/ATE)
        # are pinned with this on.
        g, _, scale, w = pose_graph.robust_solve_fused(
            graph, mask, kernel=mapping_kernel,
            iterations=gn_iterations, solver=gn_solver,
            robust_scale=robust_scale, scale_passes=passes,
            early_exit_tol=1e-6,
        )
        return g.poses, w, scale

    wrap = _wrap_for(aot_cache)
    return wrap(_solve_single), wrap(_solve_two_pass)


class OnlineSlam:
    """Incremental SLAM: streaming odometry + periodic robust loop closure.

    The online counterpart of :func:`run_slam` — scans arrive one at a
    time; each registers against the current keyframe
    (:func:`icp_tpu.odometry.stream_step` semantics, same jitted converge);
    keyframes accumulate; every ``loop_every`` keyframes the back-end
    searches for revisits among the keyframe poses, registers candidate
    pairs (one batched converge), and re-optimizes the keyframe graph with
    the robust kernel — then **re-anchors the live pose**, so drift
    corrections take effect immediately instead of at shutdown.  Wrong
    closures cannot corrupt the map: below ``mapping_threshold`` accepted
    closures the single-pass GNC kernel down-weights them by graph
    inconsistency (see :func:`icp_tpu.pose_graph.optimize`); at mapping
    scale the solve switches to the two-pass welsch recipe of
    :func:`icp_tpu.pose_graph.robust_solve` (fused on-device,
    :func:`~icp_tpu.pose_graph.robust_solve_fused`), which survives
    10-30% random AND clustered wrong closures (offline protocol:
    BASELINE.md round-4 table; streaming: tests/test_seq2loop_outliers.py).

    Weights approximate information (1/sigma^2): keyframe odometry edges
    come from sequential scan matching (mm-cm accurate — ``odometry_weight``
    deserves to be high relative to ``loop_weight`` when the front-end
    tracks well); a stiff-enough odometry chain is also what lets the
    robust kernel REJECT a wrong closure instead of bending the chain to
    absorb it (see the injected-closure test).  Front-end limit: the
    inter-scan motion must stay inside point-to-point ICP's basin
    (measured: 7.5 deg/scan streams cleanly, 15 deg/scan does not — feed a
    denser scan rate or a coarse/multiscale front-end).

    Compiled-program discipline: one converge shape for scan->keyframe
    steps, one per closure-batch bucket (the candidate batch is padded to a
    power of two), one graph solve per (keyframe-count bucket, closure
    bucket) — pad-friendly callers should feed fixed-capacity clouds.
    All jitted objects come from process-shared lru-cached factories keyed
    on the knob values (:func:`_shared_converge_fn`,
    :func:`_shared_graph_solvers`), so constructing a new session with the
    same knobs costs NO re-tracing or re-compilation — measured on the
    chip bench, per-instance jits read as multi-second refine stalls that
    were pure host-side re-tracing.

    Not thread-safe; feed scans from one thread.
    """

    def __init__(
        self,
        method: Method,
        config: DriverConfig,
        *,
        translation_threshold: float = 0.5,
        angle_threshold: float = 0.1,
        loop_every: int = 8,
        loop_radius: float = 2.0,
        loop_detector: str = "radius",
        descriptor_range: float | None = None,
        descriptor_max_distance: float = 0.2,
        loop_min_separation: int = 10,
        loop_max_candidates: int = 16,
        loop_max_cost: float | None = None,
        loop_coarse: bool = False,
        loop_weight: float = 10.0,
        odometry_weight: float = 1.0,
        robust: str = "gnc_gm",
        robust_scale: float | str = "auto",
        scale_passes: int | str = "auto",
        mapping_kernel: str = "welsch",
        mapping_threshold: int = 12,
        gn_iterations: int | None = None,
        gn_solver: str = "dense",
        closure_information: bool = False,
        information_neighbors: int = 10,
        pipelined: bool = False,
        aot_cache: str | None = None,
        async_refine: bool = False,
        prefetch_buckets: bool | None = None,
    ):
        # ``aot_cache`` (a directory; "" = the default cache dir) wraps
        # every jitted executable this session uses — the per-scan
        # converge (shared with the closure-batch registrations), the
        # pipelined device step, and the bucketed graph solves — in the
        # disk-backed AOT executable cache (:mod:`icp_tpu.aot`), so a
        # process restart skips the multi-minute XLA compiles (VERDICT
        # round-4 item 5: the SLAM surface was uncovered; the seq3d cold
        # wall grew 209 -> 372 s).  First-run behavior is identical; only
        # where the executable comes from changes.  All jitted objects
        # come from process-shared lru-cached factories, so sessions with
        # equal knobs share traces and executables.
        self._method = method
        self._config = config
        self._fn = _shared_converge_fn(method, config, aot_cache)
        self._tt = translation_threshold
        self._ta = angle_threshold
        self._loop_every = loop_every
        self._loop_radius = loop_radius
        if loop_detector not in ("radius", "descriptor"):
            raise ValueError(
                f"loop_detector must be 'radius' or 'descriptor', got "
                f"{loop_detector!r}"
            )
        if loop_detector == "descriptor" and descriptor_range is None:
            raise ValueError(
                "loop_detector='descriptor' needs descriptor_range (sensor range)"
            )
        self._loop_detector = loop_detector
        self._desc_range = descriptor_range
        self._desc_max_dist = descriptor_max_distance
        self._kf_descs: list = []  # one Scan Context per keyframe
        self._desc_queried = 0  # keyframes already scored for candidates
        self._loop_min_sep = loop_min_separation
        self._loop_max_cands = loop_max_candidates
        self._loop_max_cost = loop_max_cost
        # Closure-registration seeding.  False (default): seed from the
        # current pose estimates (X_i^{-1} X_j) — right while TRACKING,
        # where drift between candidate pairs is small.  True: seed every
        # candidate from the global coarse initializer instead
        # (register_loop_closures' coarse path, the run_slam loop_coarse
        # analogue) — for trajectories whose estimates carry relative
        # drift beyond the method's basin.  (On the two-lap merge workload
        # pose seeds were measured fine — closure measurement error vs
        # ground truth: mean 0.013 m at ~1 m drift — so the default holds
        # even there; the knob exists for worse-drifted or more aliased
        # regimes.)
        self._loop_coarse = loop_coarse
        self._loop_weight = loop_weight
        self._odometry_weight = odometry_weight
        self._robust = robust
        self._robust_scale = robust_scale
        # Two-pass robust regime selection (the round-4 protocol's central
        # finding, wired into the flagship path in round 5): at mapping
        # scale — many closures, where a corrupted subset inflates any
        # single-pass auto scale — the validated recipe is the two-pass
        # welsch of :func:`icp_tpu.pose_graph.robust_solve` (R>=0.94 /
        # K=1.00 on every m600/m3500/sphere2500 protocol cell); on tiny
        # graphs (a handful of closures retaining real drift) pass-1 IS the
        # round-3-validated rule and re-estimation can overshoot
        # (robust_solve's scope note).  ``scale_passes='auto'`` switches to
        # the two-pass ``mapping_kernel`` solve once the accepted-closure
        # count reaches ``mapping_threshold``; an int forces a fixed pass
        # count (1 = always the single-pass ``robust`` kernel).  Threshold
        # default 12: the upper-median scale statistic needs the inlier
        # bulk to dominate — at >=12 closures a <=30% wrong subset leaves
        # >=8 inliers on the median's side (streaming evidence:
        # tests/test_seq2loop_outliers.py).
        if isinstance(scale_passes, str) and scale_passes != "auto":
            raise ValueError(
                f"scale_passes must be an int or 'auto', got {scale_passes!r}"
            )
        self._scale_passes = scale_passes
        self._mapping_kernel = mapping_kernel
        self._mapping_threshold = mapping_threshold
        self._gn_iterations = gn_iterations or (30 if robust != "none" else 10)
        self._gn_solver = gn_solver
        self._closure_information = closure_information
        self._information_neighbors = information_neighbors

        self._kf_clouds: list[PointCloud] = []
        # Keyframe poses live as ONE stacked device transform (k, ...), not
        # a Python list: the refinement re-anchor then updates them with two
        # array ops instead of 2k per-pose slices — measured on the tunnel,
        # those eager per-pose dispatches (~5 ms each at k≈150) were the
        # largest remaining term of the accepting-refine stall after the
        # bucketed solve landed.  Fresh promotions go to ``_kf_pending``
        # (pure Python append, zero device ops on the hot path) and fold
        # into the stack lazily — one concatenate per refinement.
        self._kf_poses: RigidTransform | None = None
        self._kf_pending: list[RigidTransform] = []
        # Odometry / closure measurements and keyframe clouds follow the
        # same stack + pending-list discipline as ``_kf_poses``: the lists
        # take O(1) Python appends on the hot path; each refinement folds
        # them into the device stacks with ONE concatenate per array
        # (previously every refinement re-stacked O(k) per-edge device
        # arrays eagerly — measured on the tunnel, those ~5 ms dispatches
        # were the growing term of the accepting-refine stall).
        self._odo_meas: list[RigidTransform] = []  # pending, promotion-time
        self._odo_stack: RigidTransform | None = None  # folded (k-1, ...)
        self._loop_stack: RigidTransform | None = None  # folded accepted closures
        self._kf_cloud_stack: PointCloud | None = None  # folded (k, N, D)
        self._kf_cloud_folded = 0  # clouds already in the stack
        # Per-odometry-edge weight multipliers (x odometry_weight).  1.0
        # for every registration-derived edge; merge_sessions inserts one
        # low-trust bridge link (its measurement derives from drifted
        # estimates, so it must provide chain connectivity without
        # fighting the closures at odometry stiffness).
        self._odo_weight_scale: list[float] = []
        self._loop_edges: list[tuple[int, int]] = []
        self._loop_meas: list[RigidTransform] = []
        self._tried_pairs: set[tuple[int, int]] = set()
        self._kf_since_refine = 0
        self._cur_kf_pose: RigidTransform | None = None
        self._pose: RigidTransform | None = None
        self._cost_hist: list[float] = []
        self._retry_factor = 5.0  # cost anomaly threshold vs recent median

        # Pipelined mode (VERDICT round-3 item 2): scan t+1's fused device
        # step (scan-to-scan registration + device-median anomaly retry,
        # :func:`_online_step`) is DISPATCHED before scan t's result is
        # materialized, so the one remaining host sync per scan (the
        # promotion predicate) overlaps the next scan's device compute —
        # the stream_odometry_pipelined recipe (odometry.py) applied to
        # the full SLAM loop.  Semantics deltas vs serial, all pinned by
        # tests/test_online_slam.py:
        # * updates return with ONE scan of latency (add_scan yields scan
        #   t-1's update; flush() drains the last);
        # * odometry is scan-to-scan (chained device poses) instead of
        #   scan-to-keyframe — see _online_step for the measured basin
        #   argument; drift before loop closure is modestly higher (seq1:
        #   1.00 m vs 0.85 m) and loop closures absorb the difference;
        # * the promotion predicate is evaluated at materialization
        #   against the CURRENT keyframe pose (serial cadence), and a
        #   refinement that lands while a scan is in flight re-anchors it
        #   EXACTLY (left-compose by the keyframe correction: registration
        #   is pose-independent, and the predicate is invariant — rotation
        #   preserves the norm, conjugation preserves the angle).
        self._pipelined = pipelined
        self._pending = None  # (scan, pose) — in-flight device step
        self._prev_scan: PointCloud | None = None  # last dispatched scan
        self._hist = None  # (16,) device cost buffer (pipelined mode)
        self._hist_count = None
        self._correction: RigidTransform | None = None  # refine delta for pending
        self._device_step = _shared_device_step(
            method, config, self._retry_factor, aot_cache
        )
        # Bucketed refinement solves (see _refine / _shared_graph_solvers).
        self._graph_solve, self._graph_solve_two_pass = _shared_graph_solvers(
            self._robust, self._robust_scale, self._gn_iterations,
            self._gn_solver, self._mapping_kernel,
            2 if scale_passes == "auto" else int(scale_passes), aot_cache,
        )
        # Asynchronous refinement (round 5): ``async_refine=True`` removes
        # the solve from the add_scan critical path entirely.  JAX dispatch
        # is already asynchronous — what serializes the solve into the next
        # scan is the DATA DEPENDENCE (the next registration's pose chains
        # from the re-anchored keyframe).  With the knob on, _refine
        # dispatches the solve and returns WITHOUT re-anchoring; subsequent
        # scans chain from the stale estimate, and the first add_scan after
        # the device result is ready applies the exact left-compose
        # correction (the pipelined handoff math): for every pose X chained
        # after the snapshot, C ∘ X with C = solved_anchor ∘ stale_anchor⁻¹
        # equals what re-anchoring at the refine would have produced, to
        # one compose of fp roundoff.  Deltas vs synchronous: corrections
        # land 1+ scans late (the live pose was stale DURING the solve
        # anyway), and a refine cycle whose previous solve is still in
        # flight is deferred to the next keyframe.  finalize()/state_dict()
        # force-apply, so end-of-stream state is complete.
        self._async_refine = async_refine
        self._aot_cache = aot_cache
        # (poses[:k] slice, closure-weight slice, scale, k) — all device
        # values; no host sync until .is_ready() says the solve landed.
        self._async_solve = None
        # Bucket prefetch: compile the NEXT (node-bucket, closure-bucket)
        # solver shapes in a background thread BEFORE the stream crosses a
        # boundary.  A first-ever bucket shape otherwise pays its XLA
        # compile mid-stream (measured: a 28 s worst-scan outlier over the
        # tunnel when async application timing pushed the measured stream
        # across a bucket the warm-up never hit).  The dummy solve runs on
        # identity poses with all-zero edge weights (damping-only — cheap,
        # exactly inert padding semantics), the jit caches are
        # thread-safe, and nothing touches session state, so results are
        # bitwise unchanged.  Default: on whenever async_refine is on (the
        # mode whose worst scan the compile would otherwise own).
        self._prefetch = (
            async_refine if prefetch_buckets is None else prefetch_buckets
        )
        self._prefetched: set = set()
        self._closure_weights_dev = None  # (num closures,) device array
        self._robust_scale_used = None

    # -- public API ---------------------------------------------------------

    @staticmethod
    def _fold(stack: RigidTransform | None, pending: list) -> RigidTransform | None:
        """Fold a pending list of transforms into a stacked device array —
        one stack + one concatenate, regardless of how the stack has grown.
        (SO(D) re-projection happens once at promotion — ``_promote`` —
        so the stack, ``_cur_kf_pose``, and a checkpoint round-trip all
        hold the SAME array values bitwise; projecting here instead broke
        resume bit-identity at the 1e-14 level because projection is only
        idempotent up to roundoff.)"""
        if pending:
            pend_r = jnp.stack([p.rotation for p in pending])
            pend_t = jnp.stack([p.translation for p in pending])
            if stack is None:
                return RigidTransform(pend_r, pend_t)
            return RigidTransform(
                jnp.concatenate([stack.rotation, pend_r]),
                jnp.concatenate([stack.translation, pend_t]),
            )
        return stack

    @property
    def keyframe_poses(self) -> RigidTransform:
        """Current (refined) keyframe trajectory, stacked ``(K, ...)``."""
        self._kf_poses = self._fold(self._kf_poses, self._kf_pending)
        self._kf_pending = []
        if self._kf_poses is None:
            raise ValueError("no keyframes yet")
        return self._kf_poses

    def _folded_odo(self) -> RigidTransform | None:
        self._odo_stack = self._fold(self._odo_stack, self._odo_meas)
        self._odo_meas = []
        return self._odo_stack

    def _folded_loop(self) -> RigidTransform | None:
        """Accepted-closure measurements as one ``(L, ...)`` stack.  Pending
        entries may be batched (the per-refine accepted gather) or single
        transforms (tests inject closures by appending to ``_loop_meas``)."""
        if self._loop_meas:
            parts_r, parts_t = [], []
            if self._loop_stack is not None:
                parts_r.append(self._loop_stack.rotation)
                parts_t.append(self._loop_stack.translation)
            for m in self._loop_meas:
                batched = m.rotation.ndim == 3
                parts_r.append(m.rotation if batched else m.rotation[None])
                parts_t.append(m.translation if batched else m.translation[None])
            self._loop_stack = RigidTransform(
                jnp.concatenate(parts_r), jnp.concatenate(parts_t)
            )
            self._loop_meas = []
        return self._loop_stack

    def _folded_clouds(self) -> PointCloud:
        """Keyframe clouds as one stacked ``(k, N, D)`` device array,
        folded incrementally (same discipline as the pose stack)."""
        k = len(self._kf_clouds)
        if self._kf_cloud_folded < k:
            fresh = self._kf_clouds[self._kf_cloud_folded :]
            pts = jnp.stack([c.points for c in fresh])
            cnt = jnp.stack([c.count for c in fresh])
            if self._kf_cloud_stack is None:
                self._kf_cloud_stack = PointCloud(pts, cnt)
            else:
                self._kf_cloud_stack = PointCloud(
                    jnp.concatenate([self._kf_cloud_stack.points, pts]),
                    jnp.concatenate([self._kf_cloud_stack.count, cnt]),
                )
            self._kf_cloud_folded = k
        return self._kf_cloud_stack

    @property
    def closure_weights(self) -> np.ndarray | None:
        """Final robust IRLS weight per accepted closure (same order as the
        internal closure list) from the LAST refinement, or None before the
        first solve.  The :func:`icp_tpu.pose_graph.robust_edge_weights`
        diagnostic: a rejected (wrong-basin) closure sits near 0, inliers
        near 1 — what ``run_slam`` reports as ``SlamResult.edge_weights``,
        now available on the streaming surface too.  Accessing this syncs
        the device value; the refine path itself never does.

        Under ``async_refine`` the weights correspond to the last APPLIED
        refinement: between a dispatch and its application they can lag
        newly-accepted closures (length < the closure count).  Call
        :meth:`finalize` (or checkpoint) first when zipping them against
        the closure list."""
        if self._closure_weights_dev is None:
            return None
        return np.asarray(self._closure_weights_dev)

    def _dummy_solver_args(self, node_cap: int, loop_cap: int, dtype, dim: int):
        """Shape-correct inert inputs for a solver-bucket prefetch: identity
        poses/measurements, all edge weights zero (damping-only solve)."""
        eye = jnp.broadcast_to(
            jnp.eye(dim, dtype=dtype), (node_cap, dim, dim)
        )
        zeros_n = jnp.zeros((node_cap, dim), dtype=dtype)
        ij = jnp.zeros((loop_cap, 2), dtype=jnp.int32).at[:, 1].set(1)
        return (
            eye, zeros_n,
            eye[: node_cap - 1], zeros_n[: node_cap - 1],
            jnp.zeros((node_cap - 1,), dtype=dtype),
            ij,
            jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (loop_cap, dim, dim)),
            jnp.zeros((loop_cap, dim), dtype=dtype),
            jnp.zeros((loop_cap,), dtype=dtype),
            None,
        )

    def _prefetch_bucket(self, node_cap: int, loop_cap: int, two_pass: bool):
        key = (node_cap, loop_cap, two_pass)
        if key in self._prefetched:
            return
        self._prefetched.add(key)
        dtype = self._kf_clouds[0].dtype
        dim = self._kf_clouds[0].dim
        fn = self._graph_solve_two_pass if two_pass else self._graph_solve

        def build():
            try:
                import jax

                out = fn(*self._dummy_solver_args(node_cap, loop_cap, dtype, dim))
                jax.block_until_ready(out[0].translation)
            except Exception:  # noqa: BLE001 — a failed prefetch must not
                pass  # take the stream down; the shape compiles on demand.

        import threading

        # Non-daemon: a daemon thread killed mid-XLA-compile at interpreter
        # exit takes the process down with a C++ ``terminate`` (measured);
        # a normal thread simply finishes its compile and exits.
        threading.Thread(target=build, name="icp-prefetch").start()

    def _prefetch_converge(self, batch: int, cap: int, dim: int, dtype):
        """Background-compile the closure-batch converge at one batch
        bucket (inert inputs; see :meth:`_prefetch_bucket`)."""
        src = PointCloud(
            jnp.zeros((batch, cap, dim), dtype=dtype),
            jnp.full((batch,), cap, dtype=jnp.int32),
        )
        guess = geometry.identity(dim, (batch,), dtype=dtype)

        def build():
            try:
                import jax

                result, _ = self._fn(src, src, guess)
                jax.block_until_ready(result.cost)
            except Exception:  # noqa: BLE001
                pass

        import threading

        threading.Thread(target=build, name="icp-prefetch").start()

    def _maybe_prefetch(self, k: int, node_cap: int, n_loop: int, loop_cap: int):
        """Fire background compiles for bucket shapes the stream is about
        to need: the next node bucket (k grows ~1 keyframe per loop_every
        scans), the next closure bucket (n_loop grows up to
        loop_max_candidates per refine), and the two-pass variant just
        before the closure count crosses mapping_threshold."""
        from .cloud import bucket_capacity

        two_now = self._robust != "none" and self._scale_passes != 1 and (
            self._scale_passes != "auto" or n_loop >= self._mapping_threshold
        )
        targets = []
        if k + 2 * self._loop_every >= node_cap:
            targets.append((node_cap * 2, loop_cap, two_now))
        if n_loop + 2 * self._loop_max_cands >= loop_cap:
            targets.append((node_cap, bucket_capacity(loop_cap + 1, 8), two_now))
        if (
            not two_now
            and self._robust != "none"
            and self._scale_passes == "auto"
            and n_loop + self._loop_max_cands >= self._mapping_threshold
        ):
            # The solver SWITCHES at the threshold: pre-build the two-pass
            # executable at the shapes the switch will first see.
            targets.append((node_cap, loop_cap, True))
            targets.append(
                (node_cap, bucket_capacity(loop_cap + 1, 8), True)
            )
        for nc, lc, tp in targets:
            self._prefetch_bucket(nc, lc, tp)
        # Closure-batch converge buckets: the fresh-candidate count varies
        # refine to refine (0..loop_max_candidates, and nondeterministically
        # under async application timing), so a batch bucket the warm
        # stream never produced can first appear mid-stream — measured as
        # a ~3 s worst-scan compile after the solver buckets were already
        # prefetched.  The full set is tiny ({4, 8, ..., bucket(max)}):
        # build them all once.
        cap = self._kf_clouds[0].capacity
        dim = self._kf_clouds[0].dim
        dtype = self._kf_clouds[0].dtype
        b = 4
        while b <= bucket_capacity(self._loop_max_cands, min_capacity=4):
            key = ("converge", b)
            if key not in self._prefetched:
                self._prefetched.add(key)
                self._prefetch_converge(b, cap, dim, dtype)
            b *= 2

    def _maybe_apply_async(self, force: bool = False) -> bool:
        """Apply a finished asynchronous refinement (no-op if none pending
        or, unless ``force``, the device result is not ready yet)."""
        if self._async_solve is None:
            return False
        new_poses, w_slice, scale, k_snap = self._async_solve
        if not force and not new_poses.translation.is_ready():
            return False
        self._async_solve = None
        poses_now = self.keyframe_poses  # folds pending; (k_now >= k_snap,)
        k_now = poses_now.translation.shape[0]
        old_anchor = RigidTransform(
            poses_now.rotation[k_snap - 1], poses_now.translation[k_snap - 1]
        )
        new_anchor = RigidTransform(
            new_poses.rotation[k_snap - 1], new_poses.translation[k_snap - 1]
        )
        corr = geometry.compose(new_anchor, geometry.inverse(old_anchor))
        if k_now > k_snap:
            # Keyframes promoted while the solve was in flight chained from
            # the stale anchor: left-compose the correction (exact; see
            # the async_refine note in __init__).
            tail = geometry.compose(
                corr,
                RigidTransform(
                    poses_now.rotation[k_snap:], poses_now.translation[k_snap:]
                ),
            )
            self._kf_poses = RigidTransform(
                jnp.concatenate([new_poses.rotation, tail.rotation]),
                jnp.concatenate([new_poses.translation, tail.translation]),
            )
        else:
            self._kf_poses = new_poses
        self._cur_kf_pose = RigidTransform(
            self._kf_poses.rotation[-1], self._kf_poses.translation[-1]
        )
        self._pose = geometry.compose(corr, self._pose)
        if self._pipelined and self._pending is not None:
            # The in-flight scan's pose also chains from the stale frame.
            self._correction = (
                corr
                if self._correction is None
                else geometry.compose(corr, self._correction)
            )
        self._closure_weights_dev = w_slice
        self._robust_scale_used = scale
        return True

    def add_scan(self, scan: PointCloud) -> OnlineUpdate | None:
        """Feed one scan.  Serial mode returns this scan's update; pipelined
        mode returns the PREVIOUS scan's update (None on the second scan —
        the first in-flight dispatch) and :meth:`flush` drains the last."""
        if self._pipelined:
            return self._add_scan_pipelined(scan)
        if not self._kf_clouds:
            self._pose = geometry.identity(scan.dim, dtype=scan.dtype)
            self._promote(scan, self._pose)
            return OnlineUpdate(self._pose, True, False, len(self._loop_edges))
        # Register from IDENTITY (the proven stream_odometry behavior).
        # Seeding every step from the previous pose looks attractive but
        # builds a feedback loop: a registration that exits on
        # max_iterations leaves a small angular error, the next seed
        # carries it, and the error compounds geometrically (measured on
        # the circle trajectory: 0.1 -> 0.4 -> 1.3 -> ... -> 52 degrees in
        # seven scans, then the poses explode).  Failures are instead
        # RESCUED: when the converged cost is anomalous vs the recent
        # median, re-register once with the global coarse initializer and
        # keep the lower-cost result — no state feeds forward, so one bad
        # scan cannot poison the stream.
        pose, is_kf, result = odometry.stream_step(
            self._fn, self._kf_clouds[-1], self._cur_kf_pose, scan,
            self._tt, self._ta,
        )
        cost = float(result.cost)
        hist = self._cost_hist
        if len(hist) >= 4 and cost > self._retry_factor * float(np.median(hist)):
            from .ops.coarse import coarse_align_2d, coarse_align_3d

            coarse = coarse_align_2d if scan.dim == 2 else coarse_align_3d
            seed = coarse(self._kf_clouds[-1], scan)
            pose2, is_kf2, result2 = odometry.stream_step(
                self._fn, self._kf_clouds[-1], self._cur_kf_pose, scan,
                self._tt, self._ta, guess=seed,
            )
            if float(result2.cost) < cost:
                pose, is_kf, result = pose2, is_kf2, result2
                cost = float(result2.cost)
        hist.append(cost)
        if len(hist) > 16:
            hist.pop(0)
        self._pose = pose
        # A finished asynchronous solve corrects the pose we just chained
        # (non-blocking readiness check; ~free when nothing is pending).
        refined = self._maybe_apply_async()
        if is_kf:
            self._promote(scan, self._pose)
            self._kf_since_refine += 1
            if self._kf_since_refine >= self._loop_every:
                refined = self._refine() or refined
                self._kf_since_refine = 0
        return OnlineUpdate(self._pose, bool(is_kf), refined, len(self._loop_edges))

    def _add_scan_pipelined(self, scan: PointCloud) -> OnlineUpdate | None:
        if not self._kf_clouds:
            self._pose = geometry.identity(scan.dim, dtype=scan.dtype)
            self._promote(scan, self._pose)
            self._prev_scan = scan
            self._hist = jnp.zeros((16,), dtype=scan.dtype)
            self._hist_count = jnp.asarray(0, dtype=jnp.int32)
            return OnlineUpdate(self._pose, True, False, len(self._loop_edges))
        # Dispatch scan t against scan t-1 (scan-to-scan; the pose and cost
        # history chain device-side through the step, so the dispatch needs
        # no host value at all).  The in-flight previous pose lives in the
        # pre-refinement frame until it materializes — if a refinement
        # landed meanwhile, bring the chain into the refined frame first.
        if self._pending is not None:
            prev_pose = self._pending[1]
            if self._correction is not None:
                prev_pose = geometry.compose(self._correction, prev_pose)
        else:
            prev_pose = self._pose
        pose, _cost, self._hist, self._hist_count = self._device_step(
            self._prev_scan, prev_pose, scan, self._hist, self._hist_count
        )
        self._prev_scan = scan
        update = self._materialize_pending() if self._pending is not None else None
        self._pending = (scan, pose)
        return update

    def _materialize_pending(self) -> OnlineUpdate:
        """Resolve the in-flight scan: ONE host sync, overlapping whatever
        was just dispatched; then the usual promotion / periodic-refinement
        bookkeeping at serial-mode fidelity.

        The promotion predicate is recomputed HERE against the CURRENT
        keyframe pose, not taken from the dispatch-time device step: at
        dispatch the step only knows the keyframe as of one scan ago, and
        judging motion against that stale anchor promotes on ~every scan
        once per-scan motion exceeds half the threshold — measured on
        seq1: 119 keyframes vs the serial run's 75, i.e. 1.6x the keyframe
        hops, each hop spanning a 2-scan registration, compounding to a
        1.37 m end error vs serial's 6 mm.  Re-anchoring the predicate
        restores the serial promotion cadence exactly (same thresholds,
        same keyframe the decision is made against); the one remaining
        pipeline delta is that the scan REGISTERED against a one-scan-older
        keyframe (pose accuracy, not cadence)."""
        # A finished asynchronous solve first — while _pending is still
        # set, so the apply records the correction for exactly this
        # in-flight scan.
        applied = self._maybe_apply_async()
        scan, pose = self._pending
        self._pending = None
        if self._correction is not None:
            # A refinement ran while this scan was in flight: left-compose
            # the keyframe correction (exact — see the pipelined-mode note
            # in __init__).
            pose = geometry.compose(self._correction, pose)
            self._correction = None
        delta_t = jnp.linalg.norm(pose.translation - self._cur_kf_pose.translation)
        delta_a = geometry.rotation_angle(
            jnp.matmul(
                pose.rotation,
                jnp.swapaxes(self._cur_kf_pose.rotation, -1, -2),
                precision=geometry.HIGHEST,
            )
        )
        # ONE fused transfer for both predicate scalars — over the TPU
        # tunnel each materialization is a full round-trip, and this sync
        # is the pipelined path's entire per-scan host cost.
        dt_v, da_v = np.asarray(jnp.stack([delta_t, jnp.abs(delta_a)]))
        promoted = float(dt_v) > self._tt or float(da_v) > self._ta
        self._pose = pose
        refined = applied
        if promoted:
            self._promote(scan, pose)
            self._kf_since_refine += 1
            if self._kf_since_refine >= self._loop_every:
                old_kf = self._cur_kf_pose
                ran = self._refine()
                if ran:
                    # Synchronous re-anchor: correct the in-flight scan.
                    # (Async mode returns False here — its correction is
                    # recorded at application time instead.)
                    self._correction = geometry.compose(
                        self._cur_kf_pose, geometry.inverse(old_kf)
                    )
                refined = ran or refined
                self._kf_since_refine = 0
        return OnlineUpdate(self._pose, promoted, refined, len(self._loop_edges))

    def flush(self) -> OnlineUpdate | None:
        """Pipelined mode: materialize the in-flight scan (the stream is
        over / a checkpoint or finalize needs consistent state).  No-op
        returning None when nothing is pending."""
        if self._pending is None:
            return None
        return self._materialize_pending()

    def state_dict(self) -> dict:
        """Full streaming state as a flat dict of numpy arrays — the
        checkpoint payload for crash-resumable online SLAM
        (:func:`icp_tpu.resilient.resumable_online_slam`).  Restoring with
        :meth:`load_state` reproduces the uninterrupted run bit-identically
        (registration is deterministic; everything that affects future
        steps round-trips: keyframe clouds/poses, immutable odometry
        measurements, accepted closures, tried candidate pairs, the refine
        counter and the cost history).  Pipelined mode flushes the
        in-flight scan first (a checkpoint is a stream boundary)."""
        if self._pipelined:
            self.flush()
        self._maybe_apply_async(force=True)
        if not self._kf_clouds:
            return {"num_keyframes": np.asarray(0)}
        out = {
            "num_keyframes": np.asarray(len(self._kf_clouds)),
            "kf_points": np.stack([np.asarray(c.points) for c in self._kf_clouds]),
            "kf_counts": np.asarray([np.asarray(c.count) for c in self._kf_clouds]),
            "kf_rot": np.asarray(self.keyframe_poses.rotation),
            "kf_trans": np.asarray(self.keyframe_poses.translation),
            "pose_rot": np.asarray(self._pose.rotation),
            "pose_trans": np.asarray(self._pose.translation),
            "kf_since_refine": np.asarray(self._kf_since_refine),
            "cost_hist": self._cost_hist_np(),
            **(
                {
                    # Pipelined scan-to-scan chain anchor: the next scan
                    # registers against the LAST RAW scan (not necessarily
                    # a keyframe), so bit-identical resume must carry it.
                    "prev_points": np.asarray(self._prev_scan.points),
                    "prev_count": np.asarray(self._prev_scan.count),
                }
                if self._pipelined and self._prev_scan is not None
                else {}
            ),
            "tried_pairs": np.asarray(
                sorted(self._tried_pairs), dtype=np.int64
            ).reshape(-1, 2),
            "desc_queried": np.asarray(self._desc_queried),
            "loop_edges": np.asarray(self._loop_edges, dtype=np.int64).reshape(-1, 2),
        }
        odo = self._folded_odo()
        if odo is not None:
            out["odo_rot"] = np.asarray(odo.rotation)
            out["odo_trans"] = np.asarray(odo.translation)
            out["odo_weight_scale"] = np.asarray(
                self._odo_weight_scale, dtype=np.float64
            )
        loop = self._folded_loop()
        if loop is not None and loop.rotation.shape[0] > 0:
            out["loop_rot"] = np.asarray(loop.rotation)
            out["loop_trans"] = np.asarray(loop.translation)
        return out

    def load_state(self, state: dict) -> None:
        """Restore :meth:`state_dict` output (see its bit-identity note)."""
        k = int(state["num_keyframes"])
        if k == 0:
            return
        self._kf_clouds = [
            PointCloud(
                jnp.asarray(state["kf_points"][i]),
                jnp.asarray(state["kf_counts"][i]),
            )
            for i in range(k)
        ]
        self._kf_poses = RigidTransform(
            jnp.asarray(state["kf_rot"]), jnp.asarray(state["kf_trans"])
        )
        self._kf_pending = []
        self._odo_meas = []
        self._odo_stack = (
            RigidTransform(
                jnp.asarray(state["odo_rot"]), jnp.asarray(state["odo_trans"])
            )
            if "odo_rot" in state
            else None
        )
        n_odo = 0 if self._odo_stack is None else int(state["odo_rot"].shape[0])
        self._odo_weight_scale = [
            float(x)
            for x in np.asarray(state.get("odo_weight_scale", np.ones(n_odo)))
        ]
        self._loop_edges = [
            (int(i), int(j)) for i, j in np.asarray(state["loop_edges"])
        ]
        self._loop_meas = []
        self._loop_stack = (
            RigidTransform(
                jnp.asarray(state["loop_rot"]), jnp.asarray(state["loop_trans"])
            )
            if "loop_rot" in state
            else None
        )
        self._kf_cloud_stack = None
        self._kf_cloud_folded = 0
        self._tried_pairs = {
            (int(i), int(j)) for i, j in np.asarray(state["tried_pairs"])
        }
        self._kf_since_refine = int(state["kf_since_refine"])
        self._desc_queried = int(state.get("desc_queried", 0))
        self._cost_hist = [float(c) for c in np.asarray(state["cost_hist"])]
        if self._pipelined:
            dtype = state["kf_points"].dtype
            hist = np.zeros((16,), dtype=dtype)
            tail = np.asarray(state["cost_hist"], dtype=dtype)[-16:]
            if tail.size:
                hist[16 - tail.size :] = tail
            self._hist = jnp.asarray(hist)
            self._hist_count = jnp.asarray(min(tail.size, 16), dtype=jnp.int32)
            self._pending = None
            self._correction = None
            if "prev_points" in state:
                self._prev_scan = PointCloud(
                    jnp.asarray(state["prev_points"]),
                    jnp.asarray(state["prev_count"]),
                )
            else:
                # Serial-mode checkpoint: fall back to the last keyframe
                # (its pose is NOT the live pose, so re-anchor the chain).
                self._prev_scan = self._kf_clouds[-1]
                self._pose = self._cur_kf_pose
        self._cur_kf_pose = RigidTransform(
            self._kf_poses.rotation[-1], self._kf_poses.translation[-1]
        )
        self._pose = RigidTransform(
            jnp.asarray(state["pose_rot"]), jnp.asarray(state["pose_trans"])
        )
        if self._loop_detector == "descriptor":
            # Descriptors are a pure function of the restored clouds —
            # recompute rather than serialize (keeps checkpoints lean and
            # the resume bit-identity trivially intact).
            from .ops.descriptor import scan_context

            self._kf_descs = [
                scan_context(c.points, c.mask, max_radius=self._desc_range)
                for c in self._kf_clouds
            ]

    def relocalize(self, scan: PointCloud, **kwargs) -> "RelocResult | None":
        """Wake-up-lost recovery against this session's own keyframe map.

        Requires ``loop_detector='descriptor'`` (the incremental descriptor
        database doubles as the relocalization index — no recompute).
        Forwards to :func:`relocalize` with the current keyframe clouds,
        refined poses, and cached descriptors; ``kwargs`` override its
        gates (``max_distance``, ``top_k``, ``max_cost``).  Does NOT
        modify the SLAM state — the caller decides whether to trust the
        recovered pose (e.g. re-seed a fresh session from it).
        """
        if self._loop_detector != "descriptor":
            raise ValueError(
                "relocalize needs loop_detector='descriptor' (the keyframe "
                "descriptor database is only maintained in that mode)"
            )
        if not self._kf_clouds:
            return None
        stack = PointCloud(
            jnp.stack([c.points for c in self._kf_clouds]),
            jnp.stack([c.count for c in self._kf_clouds]),
        )
        return relocalize(
            scan, stack, self.keyframe_poses, self._method, self._config,
            descriptor_range=self._desc_range,
            keyframe_descriptors=jnp.stack(self._kf_descs),
            **kwargs,
        )

    def _cost_hist_np(self) -> np.ndarray:
        """Accepted-cost history as float64, newest last — from the host
        list (serial) or the device ring buffer (pipelined)."""
        if self._pipelined and self._hist is not None:
            count = int(self._hist_count)
            hist = np.asarray(self._hist, dtype=np.float64)
            return hist[16 - count :] if count else np.zeros((0,), np.float64)
        return np.asarray(self._cost_hist, dtype=np.float64)

    def finalize(self) -> bool:
        """Flush: run one final closure search + robust solve over whatever
        arrived since the last periodic refinement (revisits usually land in
        the FINAL keyframes — a stream that ends between refine boundaries
        would otherwise never register them).  Returns True if the solve
        ran; the live pose is re-anchored like any other refinement.
        Pipelined mode materializes the in-flight scan first."""
        if self._pipelined:
            self.flush()
        if len(self._kf_clouds) < 2:
            return False
        applied = self._maybe_apply_async(force=True)
        refined = self._refine()
        # Async mode: the final solve must land before returning.
        refined = self._maybe_apply_async(force=True) or refined
        self._kf_since_refine = 0
        return refined or applied

    # -- internals ----------------------------------------------------------

    def _promote(self, scan: PointCloud, pose: RigidTransform) -> None:
        # No SO(D) re-projection here: per-compose drift is ADDITIVE
        # (~1e-7/step in f32) and every long chain product — the one
        # multiplicative amplifier, measured at keyframe dets 2.6e-4 and
        # NaN Jacobians before the fix — is projected inside the jitted
        # two-pass solve (``_chain_init``).  An eager projection here
        # would also be ASYMMETRIC between the serial keyframe chain and
        # the pipelined scan chain, breaking the pipelined-vs-serial
        # bitwise pins at the 1-ulp level (measured).
        if self._kf_clouds:
            # The keyframe-to-keyframe odometry MEASUREMENT, captured at
            # promotion time (== the registration-derived relative
            # transform).  The graph must optimize against these immutable
            # measurements — re-deriving them from the current (refined)
            # poses each refinement ratchets any residual bend from a bad
            # closure INTO the measurements, and after a few refinements
            # the wrong edge is fully absorbed with nothing left to detect
            # (measured: injected-closure residual -> 0 over 10 refines).
            self._odo_meas.append(
                geometry.compose(geometry.inverse(self._cur_kf_pose), pose)
            )
            self._odo_weight_scale.append(1.0)
        self._kf_pending.append(pose)
        self._kf_clouds.append(scan)
        if self._loop_detector == "descriptor":
            # Descriptors are immutable per scan: compute once at promotion.
            from .ops.descriptor import scan_context

            self._kf_descs.append(
                scan_context(scan.points, scan.mask, max_radius=self._desc_range)
            )
        self._cur_kf_pose = pose

    def _refine(self) -> bool:
        """Detect + register new closures, robust-solve, re-anchor.

        Every shape in here is BUCKETED so successive refinements reuse
        executables instead of recompiling (the keyframe count grows a few
        nodes per refine; measured on the seq2loop stream, the per-refine
        XLA compile of the growing graph dominated the accepting-refine
        stall): the candidate search runs on a node-bucket-padded
        trajectory (padding poses placed ~1e9 m away so they can never be
        candidates), the closure batch pads to a power-of-two (as before),
        and the graph solve pads nodes (:func:`icp_tpu.pose_graph.pad_nodes`,
        edge-less ⇒ exactly inert) and edges (zero-weight ⇒ exactly inert)
        to capacity buckets before hitting the jitted solver built in
        ``__init__``.
        """
        from .cloud import bucket_capacity

        if self._async_solve is not None:
            # A previous asynchronous solve is still outstanding: apply it
            # if the device has finished, otherwise defer this whole
            # refine cycle to the next keyframe boundary (candidates found
            # now would seed from poses about to be corrected anyway).
            if not self._maybe_apply_async():
                return False
        poses = self.keyframe_poses
        k = len(self._kf_clouds)
        node_cap = bucket_capacity(k, min_capacity=16)
        yaw_by_pair: dict[tuple[int, int], float] = {}
        if self._loop_detector == "descriptor":
            # Incremental retrieval: descriptors are immutable, so only
            # pairs whose newer member arrived since the last refinement
            # can be fresh (older pairs are _tried_pairs-filtered anyway).
            # Scoring new-vs-all instead of all-vs-all keeps the per-refine
            # retrieval cost O(dT·T) (flat as the session grows) and — a
            # side benefit — spends the candidate budget entirely on fresh
            # pairs instead of re-ranking already-tried ones (ADVICE
            # round-3; VERDICT round-3 item 4).
            from .ops.descriptor import find_loop_candidates_descriptor_incremental

            exclude = None
            if self._tried_pairs:
                ex = np.zeros((k, k), dtype=bool)
                tried = np.asarray(sorted(self._tried_pairs), dtype=np.int64)
                ex[tried[:, 0], tried[:, 1]] = True
                exclude = jnp.asarray(ex)
            cands, yaws = find_loop_candidates_descriptor_incremental(
                jnp.stack(self._kf_descs), self._desc_queried,
                self._desc_max_dist,
                min_separation=self._loop_min_sep,
                max_candidates=self._loop_max_cands,
                exclude=exclude,
            )
            self._desc_queried = k
            yaw_by_pair = {
                (int(i), int(j)): float(y)
                for (i, j), y in zip(np.asarray(cands).reshape(-1, 2), np.asarray(yaws))
            }
        else:
            # Search on the node-bucket-padded trajectory so the O(T²)
            # distance matrix (and its top-k) compile once per bucket, not
            # once per keyframe count.  Padding poses sit i·1e9 m apart —
            # farther than any radius from every real pose and from each
            # other — so they produce no candidates.
            pad = node_cap - k
            if pad:
                far = (
                    jnp.arange(1, pad + 1, dtype=poses.dtype)[:, None] * 1e9
                ) * jnp.ones((1, poses.dim), dtype=poses.dtype)
                search_poses = RigidTransform(
                    jnp.concatenate(
                        [
                            poses.rotation,
                            jnp.broadcast_to(
                                jnp.eye(poses.dim, dtype=poses.dtype),
                                (pad, poses.dim, poses.dim),
                            ),
                        ]
                    ),
                    jnp.concatenate([poses.translation, far]),
                )
            else:
                search_poses = poses
            # Exclude already-tried pairs BEFORE the top-k truncation, so
            # the candidate budget is spent entirely on FRESH pairs —
            # without this, once the budget's-worth of closest pairs are
            # tried no new pair can ever surface (starves merge_sessions'
            # refine-to-saturation and wastes budget in long sessions).
            exclude = None
            if self._tried_pairs:
                ex = np.zeros((node_cap, node_cap), dtype=bool)
                tried = np.asarray(sorted(self._tried_pairs), dtype=np.int64)
                ex[tried[:, 0], tried[:, 1]] = True
                exclude = jnp.asarray(ex)
            cands = pose_graph.find_loop_candidates(
                search_poses, radius=self._loop_radius,
                min_separation=self._loop_min_sep,
                max_candidates=self._loop_max_cands,
                exclude=exclude,
            )
        fresh = [
            (int(i), int(j))
            for i, j in np.asarray(cands).reshape(-1, 2)
            if (int(i), int(j)) not in self._tried_pairs and int(j) < k
        ]
        if fresh:
            self._tried_pairs.update(fresh)
            # Pad the candidate batch to a power-of-two bucket (duplicate
            # last pair; extras dropped) so refinements reuse executables.
            pad_to = bucket_capacity(len(fresh), min_capacity=4)
            padded = fresh + [fresh[-1]] * (pad_to - len(fresh))
            stack = self._folded_clouds()
            guesses = None
            if self._loop_detector == "descriptor":
                from .ops.descriptor import yaw_seeds

                guesses = yaw_seeds(
                    stack,
                    jnp.asarray(padded, dtype=jnp.int32),
                    jnp.asarray([yaw_by_pair[p] for p in padded], stack.dtype),
                )
            edges, meas, _ = pose_graph.register_loop_closures(
                stack, poses, jnp.asarray(padded, dtype=jnp.int32),
                self._method, self._config, max_cost=self._loop_max_cost,
                coarse=self._loop_coarse and guesses is None,
                guesses=guesses,
                converge_fn=self._fn,
            )
            edges_np = np.asarray(edges)
            seen = set(self._loop_edges)
            accepted_rows = []
            for idx in range(edges_np.shape[0]):
                pair = (int(edges_np[idx, 0]), int(edges_np[idx, 1]))
                if pair in seen:
                    continue  # padding duplicates / already accepted
                seen.add(pair)
                self._loop_edges.append(pair)
                accepted_rows.append(idx)
            if accepted_rows:
                # One device gather + concat for the whole batch (not one
                # pair of slices per closure — stall discipline).
                rows = jnp.asarray(accepted_rows, dtype=jnp.int32)
                self._loop_meas.append(
                    RigidTransform(meas.rotation[rows], meas.translation[rows])
                )
        if not self._loop_edges:
            return False

        # --- bucket-padded inputs for the jitted assemble+solve ----------
        # Graph assembly itself (edge layout, weight concat, robust mask,
        # optional chain init) lives INSIDE the jitted solver; the eager
        # work here is a fixed handful of pad/fold dispatches, independent
        # of the keyframe count.  Layout: [odometry (node_cap-1, zero-weight
        # beyond k-1) | closures (loop_cap, zero-weight beyond n_loop)] —
        # zero-weight edges are exactly inert (pad_edges' proven property).
        n_loop = len(self._loop_edges)
        loop_cap = bucket_capacity(n_loop, min_capacity=8)
        dtype = poses.dtype
        dim = poses.dim
        eye = jnp.eye(dim, dtype=dtype)

        pad_n = node_cap - k
        poses_r = jnp.concatenate(
            [poses.rotation, jnp.broadcast_to(eye, (pad_n, dim, dim))]
        )
        poses_t = jnp.concatenate(
            [poses.translation, jnp.zeros((pad_n, dim), dtype=dtype)]
        )
        odo = self._folded_odo()
        pad_o = (node_cap - 1) - (k - 1)
        odo_r = jnp.concatenate(
            [odo.rotation, jnp.broadcast_to(eye, (pad_o, dim, dim))]
        )
        odo_t = jnp.concatenate(
            [odo.translation, jnp.zeros((pad_o, dim), dtype=dtype)]
        )
        odo_w_np = np.zeros((node_cap - 1,), dtype=np.float64)
        odo_w_np[: k - 1] = self._odometry_weight * np.asarray(self._odo_weight_scale)
        odo_w = jnp.asarray(odo_w_np, dtype=dtype)

        loop = self._folded_loop()
        pad_l = loop_cap - n_loop
        loop_r = jnp.concatenate(
            [loop.rotation, jnp.broadcast_to(eye, (pad_l, dim, dim))]
        )
        loop_t = jnp.concatenate(
            [loop.translation, jnp.zeros((pad_l, dim), dtype=dtype)]
        )
        ij_np = np.zeros((loop_cap, 2), dtype=np.int32)
        ij_np[:n_loop] = np.asarray(self._loop_edges, dtype=np.int32)
        ij_np[n_loop:, 1] = 1  # inert (0, 1) padding edges, always in range
        loop_ij = jnp.asarray(ij_np)
        loop_w_np = np.zeros((loop_cap,), dtype=np.float64)
        loop_w_np[:n_loop] = self._loop_weight
        loop_w = jnp.asarray(loop_w_np, dtype=dtype)

        loop_info = None
        if self._closure_information:
            from .ops.covariance import cloud_information

            # Information from each closure's TARGET keyframe geometry,
            # bucketed to loop_cap (duplicate-last target padding; padded
            # closures are zero-weight so their info block is inert).
            tgt_np = np.zeros((loop_cap,), dtype=np.int64)
            tgt_np[:n_loop] = [a for a, _ in self._loop_edges]
            tgt_np[n_loop:] = tgt_np[max(n_loop - 1, 0)]
            clouds = self._folded_clouds()
            tgt_idx = jnp.asarray(tgt_np)
            tgt = PointCloud(clouds.points[tgt_idx], clouds.count[tgt_idx])
            loop_info = cloud_information(tgt, k=self._information_neighbors)

        args = (poses_r, poses_t, odo_r, odo_t, odo_w,
                loop_ij, loop_r, loop_t, loop_w, loop_info)
        # Regime selection (see __init__): two-pass fused solve at mapping
        # scale (cold odometry-chain init), single-pass below.  Both are
        # bucketed jitted executables; the two-pass one folds the scale
        # re-estimation into the device program (no host sync, no
        # per-scale recompile).
        if self._robust != "none" and self._scale_passes != 1 and (
            self._scale_passes != "auto"
            or n_loop >= self._mapping_threshold
        ):
            new_poses, w, scale = self._graph_solve_two_pass(*args)
        else:
            new_poses, w, scale = self._graph_solve(*args)
        if self._prefetch:
            self._maybe_prefetch(k, node_cap, n_loop, loop_cap)
        # Closure weights sit after the padded odometry block.
        w_slice = w[node_cap - 1 : node_cap - 1 + n_loop]
        if self._async_refine:
            # Dispatch-only: the correction lands at the first add_scan
            # after the device result is ready (see __init__'s async note).
            self._async_solve = (
                RigidTransform(new_poses.rotation[:k], new_poses.translation[:k]),
                w_slice, scale, k,
            )
            return False
        self._closure_weights_dev = w_slice
        self._robust_scale_used = scale
        # Re-anchor: replace keyframe poses; shift the live pose by the
        # correction applied to the current keyframe (pose = kf ∘ rel keeps
        # the scan-relative offset).
        old_kf = self._cur_kf_pose
        # Two array ops, not 2k per-pose slices (the padded tail is dropped).
        self._kf_poses = RigidTransform(
            new_poses.rotation[:k], new_poses.translation[:k]
        )
        self._cur_kf_pose = RigidTransform(
            new_poses.rotation[k - 1], new_poses.translation[k - 1]
        )
        rel_live = geometry.compose(geometry.inverse(old_kf), self._pose)
        self._pose = geometry.compose(self._cur_kf_pose, rel_live)
        return True


@dataclasses.dataclass(frozen=True)
class MergeReport:
    """Evidence behind a :func:`merge_sessions` call."""

    anchor: RigidTransform  # world_a-from-world_b
    keyframes: tuple  # (k_a, k_b)
    new_closures: int  # closures the merge refinement added (mostly cross-session)
    refined: bool  # the joint robust solve ran


def merge_sessions(
    a: OnlineSlam,
    b: OnlineSlam,
    *,
    anchor: RigidTransform | None = None,
    refine: bool = True,
    relocalize_kwargs: dict | None = None,
) -> tuple[OnlineSlam, MergeReport]:
    """Merge two SLAM sessions into ONE continuing :class:`OnlineSlam`
    (multi-session / multi-robot mapping: two runs of the same environment
    become a single jointly-optimized map that keeps streaming).

    ``anchor`` is the rigid ``world_a``-from-``world_b`` transform.  Pass
    it when the rendezvous is known (e.g. both sessions started at the
    same dock, or an external fiducial ties them); leave it ``None`` to
    recover it by global relocalization of ``b``'s first keyframe against
    ``a``'s descriptor database (requires both sessions in
    ``loop_detector='descriptor'`` mode; raises ``ValueError`` when the
    appearance gate rejects every candidate — perceptually aliased worlds
    give retrieval no separation, the documented seq1 finding, and a wrong
    anchor is worse than no merge).

    The merge is state union + one ordinary refinement:

    * keyframe clouds/poses/descriptors concatenate (``b``'s poses mapped
      through ``anchor``); relative measurements (odometry + accepted
      closures) are frame-invariant and carry over verbatim;
    * one BRIDGE odometry edge ties ``a``'s last keyframe to ``b``'s
      first (measurement ``X_a_last^{-1} · anchor · X_b_0``) so the merged
      graph is a single chain — exactly the invariant
      :meth:`OnlineSlam._refine` optimizes;
    * ``refine=True`` then runs the standard (bucketed) refinement on the
      union: the radius/descriptor candidate search finds CROSS-SESSION
      revisits on its own (after anchoring they are just nearby keyframes
      with large index separation), registers them, and the robust kernel
      jointly solves both trajectories — a wrong cross closure is rejected
      the same way any wrong closure is.  In descriptor mode the merge
      resets the incremental-retrieval cursor to ``k_a``, so every ``b``
      keyframe is scored against the full merged database once (the
      cross-session pairs an incremental session never saw).

    The union goes through :meth:`state_dict`/:meth:`load_state` (the
    bit-identity-tested restore path), so pipelined sessions are drained
    exactly like a checkpoint, and the merged session keeps every
    streaming feature (add_scan, relocalize, resume).  Both sessions must
    share the cloud capacity and dimension; the merged session inherits
    ``a``'s method and every knob.  Returns ``(merged, MergeReport)``;
    ``a`` and ``b`` are left usable (flushed but otherwise untouched).

    No C++ counterpart: the reference registers one pair per run
    (``/root/reference/bench/bench.cpp:41-61``); net-new, like the rest of
    the SLAM surface.
    """
    if not a._kf_clouds or not b._kf_clouds:
        raise ValueError("both sessions need at least one keyframe")
    sa = a.state_dict()
    sb = b.state_dict()
    if sa["kf_points"].shape[1:] != sb["kf_points"].shape[1:]:
        raise ValueError(
            f"cloud capacities differ: {sa['kf_points'].shape[1:]} vs "
            f"{sb['kf_points'].shape[1:]} — pad both sessions alike"
        )
    k_a = int(sa["num_keyframes"])
    k_b = int(sb["num_keyframes"])

    anchor_kf = 0  # the session-a keyframe the anchor constraint ties to
    if anchor is None:
        if a._loop_detector != "descriptor" or b._loop_detector != "descriptor":
            raise ValueError(
                "anchor=None recovers the inter-session transform by "
                "relocalization, which needs both sessions in "
                "loop_detector='descriptor' mode; pass an explicit anchor "
                "otherwise"
            )
        first_b = PointCloud(
            jnp.asarray(sb["kf_points"][0]), jnp.asarray(sb["kf_counts"][0])
        )
        reloc = a.relocalize(first_b, **(relocalize_kwargs or {}))
        if reloc is None:
            raise ValueError(
                "relocalization found no appearance match for b's first "
                "keyframe in a's map — pass an explicit anchor"
            )
        # reloc.pose is b_kf0's pose in world_a; b_kf0's pose in world_b is
        # sb['kf_rot'][0] (identity for a fresh session, arbitrary after a
        # restore): anchor = pose_a ∘ pose_b^{-1}.
        b0 = RigidTransform(
            jnp.asarray(sb["kf_rot"][0]), jnp.asarray(sb["kf_trans"][0])
        )
        anchor = geometry.compose(reloc.pose, geometry.inverse(b0))
        anchor_kf = int(reloc.keyframe)

    ar = np.asarray(anchor.rotation, dtype=sa["kf_rot"].dtype)
    at = np.asarray(anchor.translation, dtype=sa["kf_trans"].dtype)
    rot_b = np.einsum("ij,kjl->kil", ar, sb["kf_rot"])
    trans_b = np.einsum("ij,kj->ki", ar, sb["kf_trans"]) + at

    # Bridge odometry measurement: a_last^{-1} ∘ (anchor ∘ b_0).  Its value
    # derives from session a's DRIFTED estimate of its last keyframe, so it
    # gets a ~zero weight below — connectivity only (graph_from_trajectory
    # needs one consecutive chain); the real inter-session constraint is
    # the ANCHOR LOOP EDGE, measured against the drift-free anchoring
    # keyframe (the gauge node for an explicit anchor, the relocalization
    # match otherwise) and robust-guarded like any closure.  With the
    # bridge at full odometry weight the merge measurably fails: seq2loop
    # two-lap merge left 0.36-0.40 m keyframe ATE (the bridge carried
    # lap-1's full 0.85 m drift into a quadratic, un-guarded edge that
    # fought 250+ accurate closures), vs 0.111 m for the single-session
    # run of the same data.
    a_last_r, a_last_t = sa["kf_rot"][-1], sa["kf_trans"][-1]
    br = a_last_r.T @ rot_b[0]
    bt = a_last_r.T @ (trans_b[0] - a_last_t)
    # Anchor loop edge: X_anchor_kf^{-1} ∘ (anchor ∘ b_0), all in world_a.
    ak_r, ak_t = sa["kf_rot"][anchor_kf], sa["kf_trans"][anchor_kf]
    anchor_edge_r = ak_r.T @ rot_b[0]
    anchor_edge_t = ak_r.T @ (trans_b[0] - ak_t)

    def _cat_meas(key_r, key_t, bridge_r, bridge_t):
        parts_r = [x for x in (sa.get(key_r), bridge_r, sb.get(key_r)) if x is not None]
        parts_t = [x for x in (sa.get(key_t), bridge_t, sb.get(key_t)) if x is not None]
        return np.concatenate(parts_r, axis=0), np.concatenate(parts_t, axis=0)

    odo_r, odo_t = _cat_meas("odo_rot", "odo_trans", br[None], bt[None])
    state = {
        "num_keyframes": np.asarray(k_a + k_b),
        "kf_points": np.concatenate([sa["kf_points"], sb["kf_points"]]),
        "kf_counts": np.concatenate([sa["kf_counts"], sb["kf_counts"]]),
        "kf_rot": np.concatenate([sa["kf_rot"], rot_b]),
        "kf_trans": np.concatenate([sa["kf_trans"], trans_b]),
        # Live pose: b's, carried into world_a.
        "pose_rot": ar @ sb["pose_rot"],
        "pose_trans": ar @ sb["pose_trans"] + at,
        "kf_since_refine": np.asarray(0),
        # Anomaly-retry baseline of the merged stream: the tail of BOTH
        # histories (b's most recent last, matching the live pose), so the
        # median the retry compares against reflects the union rather than
        # restarting from b's alone (ADVICE round-4).
        "cost_hist": np.concatenate([sa["cost_hist"], sb["cost_hist"]])[-16:],
        "tried_pairs": np.concatenate(
            [
                sa["tried_pairs"].reshape(-1, 2),
                sb["tried_pairs"].reshape(-1, 2) + k_a,
                np.asarray([[anchor_kf, k_a]], dtype=np.int64),
            ]
        ),
        # Descriptor-retrieval cursor: every b keyframe is "new" to the
        # merged database, so the next refinement scores all of them once
        # against the union (cross-session pairs included).
        "desc_queried": np.asarray(min(int(sa.get("desc_queried", 0)), k_a)),
        "loop_edges": np.concatenate(
            [
                sa["loop_edges"].reshape(-1, 2),
                sb["loop_edges"].reshape(-1, 2) + k_a,
                np.asarray([[anchor_kf, k_a]], dtype=np.int64),
            ]
        ),
        "odo_rot": odo_r,
        "odo_trans": odo_t,
        # The bridge link (index k_a - 1) provides chain connectivity at
        # ~zero stiffness; see the bridge note above.
        "odo_weight_scale": np.concatenate(
            [
                np.asarray(sa.get("odo_weight_scale", np.ones(max(k_a - 1, 0)))),
                np.asarray([1e-3]),
                np.asarray(sb.get("odo_weight_scale", np.ones(max(k_b - 1, 0)))),
            ]
        ),
    }
    state["loop_rot"] = np.concatenate(
        [
            x
            for x in (sa.get("loop_rot"), sb.get("loop_rot"), anchor_edge_r[None])
            if x is not None
        ],
        axis=0,
    )
    state["loop_trans"] = np.concatenate(
        [
            x
            for x in (sa.get("loop_trans"), sb.get("loop_trans"), anchor_edge_t[None])
            if x is not None
        ],
        axis=0,
    )
    if "prev_points" in sb:
        state["prev_points"] = sb["prev_points"]
        state["prev_count"] = sb["prev_count"]

    merged = OnlineSlam(
        a._method, a._config,
        translation_threshold=a._tt, angle_threshold=a._ta,
        loop_every=a._loop_every, loop_radius=a._loop_radius,
        loop_detector=a._loop_detector, descriptor_range=a._desc_range,
        descriptor_max_distance=a._desc_max_dist,
        loop_min_separation=a._loop_min_sep,
        loop_max_candidates=a._loop_max_cands, loop_max_cost=a._loop_max_cost,
        loop_coarse=a._loop_coarse,
        loop_weight=a._loop_weight, odometry_weight=a._odometry_weight,
        robust=a._robust, robust_scale=a._robust_scale,
        scale_passes=a._scale_passes, mapping_kernel=a._mapping_kernel,
        mapping_threshold=a._mapping_threshold,
        gn_iterations=a._gn_iterations, gn_solver=a._gn_solver,
        closure_information=a._closure_information,
        information_neighbors=a._information_neighbors,
        pipelined=a._pipelined,
        aot_cache=a._aot_cache,
        async_refine=a._async_refine,
    )
    merged.load_state(state)
    before = len(merged._loop_edges)
    refined = False
    if refine:
        # Refine to saturation: each solve pulls the trajectories closer,
        # which brings MORE cross-session pairs inside the candidate
        # radius (and the per-refine candidate budget is intentionally
        # small), so iterate until a round adds nothing — the same reason
        # finalize() exists for a single stream's tail.  Bounded: every
        # round must add >= 1 closure to continue, and closures are
        # finite.  (The tried-pair EXCLUSION in the candidate search is
        # what makes saturation terminate at the right point: without it,
        # once the budget's-worth of closest pairs are tried no fresh pair
        # can ever surface — measured: the seq2loop merge stalled at 21
        # closures with the trajectory tails un-pinned.)
        for _ in range(16):
            seen = len(merged._loop_edges)
            if merged._loop_detector == "descriptor":
                # Descriptors are immutable, so the incremental cursor
                # would stop after ONE candidate round (the first refine
                # scores everything and sets the cursor to k) and cap
                # cross-session closures at one budget's worth (ADVICE
                # round-4).  Re-lower it each saturation round: the
                # tried-pair EXCLUSION inside the retrieval keeps the
                # budget on fresh pairs, so this terminates exactly like
                # the radius path — when a full re-scan accepts nothing.
                merged._desc_queried = 0
            refined = merged._refine() or refined
            # Saturation is a batch loop: land any async solve before
            # deciding whether the round added closures.
            merged._maybe_apply_async(force=True)
            if len(merged._loop_edges) == seen:
                break
    return merged, MergeReport(
        anchor=anchor,
        keyframes=(k_a, k_b),
        new_closures=len(merged._loop_edges) - before,
        refined=refined,
    )


@dataclasses.dataclass(frozen=True)
class SlamResult:
    poses: RigidTransform  # optimized world-from-scan poses (T, ...)
    trajectory: odometry.Trajectory  # raw odometry (pre-optimization)
    loop_edges: jnp.ndarray  # (K, 2) accepted closures
    graph_costs: jnp.ndarray  # per-GN-iteration costs (+ final)
    edge_weights: jnp.ndarray | None = None  # (E,) final IRLS weights (robust only)


def run_slam(
    scans: PointCloud,
    method: Method,
    config: DriverConfig,
    *,
    coarse: bool = False,
    multiscale: bool = False,
    loop_radius: float | None = None,
    loop_detector: str = "radius",
    descriptor_range: float | None = None,
    descriptor_max_distance: float = 0.2,
    descriptor_seed: bool = True,
    loop_min_separation: int = 10,
    loop_max_candidates: int | None = 64,
    loop_max_cost: float | None = None,
    loop_coarse: bool = False,
    loop_weight: float = 10.0,
    gn_iterations: int | None = None,
    gn_solver: str = "dense",
    robust: str = "none",
    robust_scale: float | str = "auto",
    scale_passes: int | str = "auto",
    mapping_kernel: str = "welsch",
    mapping_threshold: int = 12,
    closure_information: bool = False,
    information_neighbors: int = 10,
    aot_cache: str | None = None,
) -> SlamResult:
    """Odometry + (optional) loop closure + pose-graph refinement.

    ``scans`` is the batched ``(T, N, D)`` scan stack.  With
    ``loop_radius=None`` only the odometry chain runs (poses ==
    trajectory.poses).  Returns optimized poses in the scan-0 frame.

    ``loop_detector='descriptor'`` retrieves loop candidates by Scan
    Context appearance matching (``descriptor_range`` = sensor range,
    ``descriptor_max_distance`` = acceptance threshold) instead of pose
    radius — immune to accumulated drift, with each closure registration
    seeded by the descriptor's yaw estimate (``descriptor_seed``).

    ``robust`` / ``robust_scale`` select a per-edge robust kernel for the
    graph solve (see :func:`icp_tpu.pose_graph.optimize`): ``max_cost`` only
    rejects closures whose ICP *cost* is high, but a closure can converge to
    a plausible cost in the wrong basin — the robust kernel (``'gnc_gm'``
    recommended) down-weights such edges by their graph inconsistency
    instead of trusting them.  The final per-edge weights are reported in
    ``SlamResult.edge_weights``.  ``gn_iterations`` defaults to 10 for the
    plain solve and 30 for robust kernels (the GNC anneal + post-rejection
    relaxation need the budget; see optimize's docstring).

    ``scale_passes='auto'`` (default): once the accepted-closure count
    reaches ``mapping_threshold``, the robust solve upgrades to the
    two-pass ``mapping_kernel`` recipe of
    :func:`icp_tpu.pose_graph.robust_solve` — the configuration validated
    against 10-30% random/clustered wrong closures (any single-pass auto
    scale inflates at the corrupted L2 anchor; BASELINE.md round-4 table).
    Below the threshold the single-pass ``robust`` kernel applies
    unchanged (robust_solve's scope note: on tiny graphs the re-estimation
    can overshoot).  ``scale_passes=1`` forces single-pass everywhere; an
    int >= 2 forces that many passes with ``mapping_kernel``.

    ``closure_information=True`` attaches an anisotropic information matrix
    to every accepted closure, estimated from the TARGET scan's surface
    geometry (:func:`icp_tpu.ops.covariance.cloud_information` — the
    normal-projected Censi form): a corridor-to-corridor closure then pins
    the lateral direction without asserting the along-corridor translation
    it cannot actually see.
    """
    if gn_iterations is None:
        gn_iterations = 10 if robust == "none" else 30
    # ``aot_cache`` (a directory; "" = the default cache dir): route the
    # odometry-chain converge (pair-count-bucketed) and the closure-batch
    # registrations through the disk-backed AOT executable cache, so a
    # fresh process skips the multi-minute XLA compiles — the offline twin
    # of OnlineSlam's knob (the 3D seq3d pipeline's wall is
    # compile-dominated: bench row ``seq3d_gicp_slam_end_error_m``).
    wrap = closure_fn = None
    if aot_cache is not None:
        from . import aot

        wrap = lambda f: aot.cached_jit(f, directory=aot_cache or None)  # noqa: E731
        closure_fn = _shared_converge_fn(method, config, aot_cache)
    traj = odometry.chain_scans(
        scans, method, config, coarse=coarse, multiscale=multiscale,
        wrap_converge=wrap, pad_pairs_to_bucket=wrap is not None,
    )

    if loop_detector not in ("radius", "descriptor"):
        raise ValueError(
            f"loop_detector must be 'radius' or 'descriptor', got {loop_detector!r}"
        )
    loop_edges = jnp.zeros((0, 2), dtype=jnp.int32)
    loop_meas = None
    if loop_detector == "descriptor":
        # Appearance-based retrieval (Scan Context): does NOT trust the
        # drifted poses — the fix for revisits whose pose estimate has
        # drifted beyond any radius (ops/descriptor.py module doc).  The
        # descriptor's yaw estimate seeds each registration (its own
        # basin-escape, independent of pose drift).
        from .ops.descriptor import (
            find_loop_candidates_descriptor,
            scan_context,
            yaw_seeds,
        )

        if descriptor_range is None:
            raise ValueError(
                "loop_detector='descriptor' needs descriptor_range "
                "(the sensor range; a common constant across scans)"
            )
        descs = scan_context(scans.points, scans.mask, max_radius=descriptor_range)
        cands, yaw = find_loop_candidates_descriptor(
            descs, descriptor_max_distance,
            min_separation=loop_min_separation,
            max_candidates=loop_max_candidates,
        )
        guesses = yaw_seeds(scans, cands, yaw) if descriptor_seed else None
        loop_edges, loop_meas, _ = pose_graph.register_loop_closures(
            scans, traj.poses, cands, method, config,
            max_cost=loop_max_cost, coarse=loop_coarse, guesses=guesses,
            converge_fn=closure_fn,
        )
    elif loop_radius is not None:
        cands = pose_graph.find_loop_candidates(
            traj.poses, radius=loop_radius,
            min_separation=loop_min_separation,
            max_candidates=loop_max_candidates,
        )
        loop_edges, loop_meas, _ = pose_graph.register_loop_closures(
            scans, traj.poses, cands, method, config,
            max_cost=loop_max_cost, coarse=loop_coarse,
            converge_fn=closure_fn,
        )

    if loop_edges.shape[0] == 0:
        # Odometry-only graphs are exactly satisfiable — optimization is a
        # numerical no-op; skip the O(T^2) dense solve entirely.
        return SlamResult(
            poses=traj.poses,
            trajectory=traj,
            loop_edges=loop_edges,
            graph_costs=jnp.zeros((0,)),
        )

    loop_info = None
    if closure_information and loop_edges.shape[0] > 0:
        from .ops.covariance import cloud_information

        tgt_idx = jnp.asarray(loop_edges)[:, 0]
        tgt_scans = PointCloud(scans.points[tgt_idx], scans.count[tgt_idx])
        loop_info = cloud_information(tgt_scans, k=information_neighbors)
    graph = pose_graph.graph_from_trajectory(
        traj.poses,
        geometry.inverse(traj.relative),
        loop_edges=loop_edges,
        loop_measurements=loop_meas,
        loop_weight=loop_weight,
        loop_information=loop_info,
    )
    # Robustify ONLY the loop-closure edges (the last K): odometry edges are
    # sequential scan matches — they can be noisy but not wrong associations
    # — and letting a redescending kernel cut them can disconnect the chain
    # (pose_graph.optimize docstring).
    robust_mask = None
    if robust != "none":
        n_odo = graph.num_edges - loop_edges.shape[0]
        robust_mask = jnp.arange(graph.num_edges) >= n_odo
    if isinstance(scale_passes, str) and scale_passes != "auto":
        raise ValueError(
            f"scale_passes must be an int or 'auto', got {scale_passes!r}"
        )
    two_pass = robust != "none" and scale_passes != 1 and (
        scale_passes != "auto" or int(loop_edges.shape[0]) >= mapping_threshold
    )
    weights = None
    if two_pass:
        # Mapping-scale regime: the validated two-pass recipe (see the
        # docstring).  Offline path — the host-side driver is fine here
        # (run_slam is one-shot; the stall-aware fused twin backs the
        # streaming surface).
        graph, costs, robust_scale, weights = pose_graph.robust_solve(
            graph, kernel=mapping_kernel, robust_edges=robust_mask,
            iterations=gn_iterations, solver=gn_solver,
            robust_scale=robust_scale,
            scale_passes=2 if scale_passes == "auto" else int(scale_passes),
        )
    else:
        if robust != "none" and isinstance(robust_scale, str):
            # 'auto': resolve once, reuse for the weights diagnostic below.
            robust_scale = pose_graph.auto_robust_scale(
                graph, iterations=gn_iterations, solver=gn_solver,
                robust_edges=robust_mask,
            )
        graph, costs = pose_graph.optimize(
            graph, iterations=gn_iterations, solver=gn_solver,
            robust=robust, robust_scale=robust_scale, robust_edges=robust_mask,
        )
        if robust != "none":
            weights, _ = pose_graph.robust_edge_weights(
                graph, robust, robust_scale, robust_edges=robust_mask
            )
    return SlamResult(
        poses=graph.poses,
        trajectory=traj,
        loop_edges=loop_edges,
        graph_costs=costs,
        edge_weights=weights,
    )


@dataclasses.dataclass(frozen=True)
class RelocResult:
    """Outcome of :func:`relocalize`: the recovered WORLD pose of the
    query scan, the matched keyframe, and the evidence behind the match."""

    pose: RigidTransform
    keyframe: int
    cost: float
    descriptor_distance: float


def relocalize(
    scan: PointCloud,
    keyframes: PointCloud,
    keyframe_poses: RigidTransform,
    method: Method,
    config: DriverConfig,
    *,
    descriptor_range: float,
    max_distance: float = 0.3,
    top_k: int = 3,
    max_cost: float | None = None,
    keyframe_descriptors=None,
) -> RelocResult | None:
    """Global relocalization (the "kidnapped robot" recovery): find where
    a scan is in an existing keyframe map with NO pose prior.

    Scan Context retrieval proposes the ``top_k`` most similar keyframes
    (``max_distance`` gates the appearance match), each candidate
    registration is seeded with the descriptor's yaw estimate, and the
    lowest-cost registration (optionally gated by ``max_cost``) wins.  The
    returned pose is the scan's WORLD pose: ``keyframe_pose ∘ T`` where T
    registers the scan onto the matched keyframe (the
    :func:`icp_tpu.pose_graph.register_loop_closures` convention).

    ``keyframe_descriptors`` (``(K, R, S)``, from
    :func:`icp_tpu.ops.descriptor.scan_context` with the SAME
    ``descriptor_range``) skips recomputing the database — an online
    system keeps it incrementally (as :class:`OnlineSlam` does).  Returns
    None when no keyframe passes the appearance gate (or ``max_cost``).
    No C++ counterpart: the reference has no retrieval at all.
    """
    from .driver import converge
    from .ops.descriptor import descriptor_query, scan_context, yaw_seeds

    if keyframe_descriptors is None:
        keyframe_descriptors = scan_context(
            keyframes.points, keyframes.mask, max_radius=descriptor_range
        )
    q_desc = scan_context(scan.points, scan.mask, max_radius=descriptor_range)
    # Keyframes on the QUERY axis, the scan on the DB axis: shift[k, 0]
    # then aligns the scan to keyframe k — exactly the "source j relative
    # to target i" convention yaw_seeds expects (the transposed call would
    # hand it the inverse rotation).
    dist, shift = descriptor_query(keyframe_descriptors, q_desc[None])
    dist = np.asarray(dist[:, 0])
    shift = np.asarray(shift[:, 0])
    k = min(top_k, dist.shape[0])
    order = np.argsort(dist)[:k]
    order = order[dist[order] < max_distance]
    if order.size == 0:
        return None

    sectors = keyframe_descriptors.shape[-1]
    yaw = shift[order].astype(np.float64) * (2 * np.pi / sectors)
    yaw = np.where(yaw > np.pi, yaw - 2 * np.pi, yaw)
    # Pairs in register_loop_closures' (i=target kf, j=source scan) layout:
    # stack the scan behind the keyframes so yaw_seeds sees one cloud set.
    kf_idx = jnp.asarray(order, dtype=jnp.int32)
    nkf = keyframes.points.shape[0]
    all_pts = jnp.concatenate([keyframes.points, scan.points[None]], axis=0)
    all_cnt = jnp.concatenate(
        [keyframes.count, jnp.asarray([scan.count], dtype=keyframes.count.dtype)]
    )
    stack = PointCloud(all_pts, all_cnt)
    pairs = jnp.stack(
        [kf_idx, jnp.full((order.size,), nkf, dtype=jnp.int32)], axis=-1
    )
    seeds = yaw_seeds(stack, pairs, jnp.asarray(yaw, scan.dtype))

    src = PointCloud(
        jnp.broadcast_to(scan.points, (order.size,) + scan.points.shape),
        jnp.broadcast_to(scan.count, (order.size,)),
    )
    tgt = PointCloud(keyframes.points[kf_idx], keyframes.count[kf_idx])
    result, _ = converge(method, src, tgt, seeds, config)
    costs = np.asarray(result.cost)
    best = int(np.argmin(costs))
    if max_cost is not None and costs[best] > max_cost:
        return None
    kf = int(order[best])
    t_rel = RigidTransform(
        result.transform.rotation[best], result.transform.translation[best]
    )
    kf_pose = RigidTransform(
        keyframe_poses.rotation[kf], keyframe_poses.translation[kf]
    )
    return RelocResult(
        pose=geometry.compose(kf_pose, t_rel),
        keyframe=kf,
        cost=float(costs[best]),
        descriptor_distance=float(dist[kf]),
    )
