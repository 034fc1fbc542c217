"""Sequential scan odometry: trajectories from chained registrations.

Net-new vs the reference (which registers exactly one pair per run).  The
TPU formulation registers ALL consecutive pairs of a scan sequence in one
batched ``converge`` (the (T-1)-pair fleet is the batch axis), then composes
the relative poses into a trajectory with a **log-depth associative scan**
over SE(D) — ``jax.lax.associative_scan`` on (rotation, translation)
compose, instead of a serial T-step loop.

Keyframing thins the trajectory for the pose-graph back-end: a scan becomes
a keyframe when its pose has moved beyond a translation/angle threshold
since the last keyframe (computed on host over the returned trajectory —
selection is data-dependent and feeds graph construction, not compiled
compute).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .cloud import PointCloud
from .driver import ConvergenceState, DriverConfig, converge
from .geometry import RigidTransform
from .methods.base import Method

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Trajectory:
    """Absolute poses ``world_from_scan[t]`` for each scan, plus the
    per-step relative registrations they were composed from."""

    poses: RigidTransform  # (T, D, D) / (T, D)
    relative: RigidTransform  # (T-1, ...) scan_{t} -> scan_{t+1} frame
    registration: ConvergenceState  # per-pair costs / iteration counts


def compose_chain(relative: RigidTransform, initial: RigidTransform) -> RigidTransform:
    """Prefix-compose relative poses into absolute ones, log-depth.

    ``poses[0] = initial``; ``poses[t+1] = poses[t] ∘ inv(relative[t])`` —
    registering scan t (source) onto scan t+1 (target) yields the transform
    taking frame-t points into frame t+1, so the world pose of frame t+1
    advances by its inverse.
    """
    rel_inv = geometry.inverse(relative)

    def combine(a, b):
        # Associative pairwise compose on (rotation, translation) pytrees:
        # elementwise a then b in the *prefix* order handled by
        # associative_scan (left-to-right composition).
        rot_a, trans_a = a
        rot_b, trans_b = b
        rot = jnp.matmul(rot_a, rot_b, precision=geometry.HIGHEST)
        trans = jnp.einsum("...ij,...j->...i", rot_a, trans_b, precision=geometry.HIGHEST) + trans_a
        return rot, trans

    rots = jnp.concatenate([initial.rotation[None], rel_inv.rotation], axis=0)
    trans = jnp.concatenate([initial.translation[None], rel_inv.translation], axis=0)
    prot, ptrans = jax.lax.associative_scan(combine, (rots, trans))
    return RigidTransform(prot, ptrans)


def chain_scans(
    scans: PointCloud,
    method: Method,
    config: DriverConfig,
    initial: RigidTransform | None = None,
    guesses: RigidTransform | None = None,
    coarse: bool = False,
    multiscale: bool = False,
    wrap_converge=None,
    pad_pairs_to_bucket: bool = False,
) -> Trajectory:
    """Register every consecutive pair of a ``(T, N, D)`` scan stack and
    compose the trajectory.

    ``guesses`` (batch T-1) seeds each registration — constant-velocity
    seeding is the caller's choice; identity by default.  ``coarse=True``
    (2D) seeds every pair with the global bearing-histogram rotation search
    (``ops/coarse.py``), making sharp turns between consecutive scans (30+
    degrees, outside plain ICP's basin from identity) recoverable; 3D uses
    the principal-axes candidates (``coarse_align_3d``).
    ``multiscale=True`` registers each pair through the coarse-to-fine
    pyramid (``icp_tpu.multiscale``, ~3x cheaper per pair at scan scale).

    ``wrap_converge`` decorates the traced ``(sources, targets, guesses) ->
    (ConvergenceState, state)`` registration callable before invocation —
    e.g. ``icp_tpu.aot.cached_jit`` for an AOT-cached odometry run.
    ``pad_pairs_to_bucket=True`` pads the pair-batch axis to the power-of-
    two bucket (duplicating the last pair; results sliced back) so
    different-length sequences share one compiled/cached program — worth
    the padded lanes' extra compute only when a multi-minute compile is on
    the line, hence off by default.
    """
    t_total = scans.points.shape[0]
    if t_total < 2:
        raise ValueError("need at least two scans")
    dim = scans.dim
    t_pairs = t_total - 1
    pad = 0
    if pad_pairs_to_bucket:
        from .cloud import bucket_capacity

        pad = bucket_capacity(t_pairs, min_capacity=8) - t_pairs

    def _pad_tail(x):
        # Duplicate the final element into the padded lanes (valid inputs,
        # so the padded registrations converge normally; sliced off below).
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
        )

    if pad:
        # Pad the SCAN STACK itself, so every derived shape (pairs,
        # precomputed aux, coarse guesses) is bucket-stable — the
        # precompute executable is then shared across sequence lengths
        # too, not just the converge.
        scans = jax.tree.map(_pad_tail, scans)
        if guesses is not None:
            guesses = jax.tree.map(_pad_tail, guesses)
    sources = PointCloud(scans.points[:-1], scans.count[:-1])
    targets = PointCloud(scans.points[1:], scans.count[1:])
    src_aux = tgt_aux = None
    if method.precompute is not None and method.with_precomputed is not None and not multiscale:
        # Scan t is the target of pair t-1 AND the source of pair t: derive
        # per-scan data (surfel covariances, normals) ONCE for the stack
        # instead of twice per interior scan — the init-dominating cost for
        # gicp/point_to_plane/symmetric (BASELINE.md "Net-new method
        # throughput").  Skipped under multiscale: the pyramid registers
        # DECIMATED clouds, and full-resolution aux is shape-incompatible
        # with (gicp/symmetric) or silently misindexed by (point_to_plane)
        # the decimated levels — each level derives its own aux instead.
        precompute = (
            wrap_converge(method.precompute)
            if wrap_converge is not None
            else jax.jit(method.precompute)
        )
        aux = precompute(scans)
        src_aux = jax.tree.map(lambda x: x[:-1], aux)
        tgt_aux = jax.tree.map(lambda x: x[1:], aux)
    if guesses is None and coarse:
        from .ops.coarse import coarse_align_2d, coarse_align_3d

        guesses = (coarse_align_2d if dim == 2 else coarse_align_3d)(sources, targets)
    elif guesses is None:
        guesses = geometry.identity(dim, (t_pairs + pad,), dtype=scans.dtype)
    if initial is None:
        initial = geometry.identity(dim, dtype=scans.dtype)

    def _register(s, t, g, sa, ta):
        # Aux enters as traced OPERANDS, not closure constants: a
        # wrap_converge AOT cache then fingerprints the program, not the
        # data, and one cached executable serves every same-shape sequence
        # (closure constants would bake each dataset's covariances into
        # the StableHLO and miss the cache every run).
        m = method if sa is None else method.with_precomputed(sa, ta)
        if multiscale:
            from .multiscale import converge_multiscale

            return converge_multiscale(
                m, s, t, g, config, factors=(4,), coarse_max_iterations=30
            )
        return converge(m, s, t, g, config)

    run = wrap_converge(_register) if wrap_converge is not None else _register
    result, _ = run(sources, targets, guesses, src_aux, tgt_aux)
    if pad:
        result = jax.tree.map(lambda x: x[:t_pairs], result)
    poses = compose_chain(result.transform, initial)
    return Trajectory(poses=poses, relative=result.transform, registration=result)


def select_keyframes(
    trajectory: Trajectory,
    translation_threshold: float,
    angle_threshold: float,
) -> np.ndarray:
    """Indices of keyframe scans (always includes 0 and the last scan).

    A new keyframe is declared when the pose has moved by more than the
    translation OR angle threshold since the previous keyframe.
    """
    rots = np.asarray(trajectory.poses.rotation)
    trans = np.asarray(trajectory.poses.translation)
    keep = [0]
    for t in range(1, len(trans)):
        k = keep[-1]
        dt = np.linalg.norm(trans[t] - trans[k])
        rel = rots[k].T @ rots[t]  # host NumPy (full precision; no MXU)
        if rots.shape[-1] == 2:
            ang = abs(np.arctan2(rel[1, 0], rel[0, 0]))
        else:
            ang = abs(np.arccos(np.clip((np.trace(rel) - 1) / 2, -1, 1)))
        if dt > translation_threshold or ang > angle_threshold:
            keep.append(t)
    if keep[-1] != len(trans) - 1:
        keep.append(len(trans) - 1)
    return np.asarray(keep, dtype=np.int64)


def stream_step(
    fn,
    keyframe: PointCloud,
    kf_pose: RigidTransform,
    scan: PointCloud,
    translation_threshold: float,
    angle_threshold: float,
    guess: RigidTransform | None = None,
):
    """One streaming-odometry advance: register ``keyframe -> scan`` and
    decide keyframe promotion.  Returns ``(pose, is_keyframe, result)``.

    ``guess`` seeds the registration (default identity — the historical
    behavior).  Callers whose keyframe gap spans real rotation should seed
    from the previous scan's keyframe-relative pose
    (``inv(kf_pose) ∘ prev_pose``): with a 30-degree gap the identity seed
    leaves trimmed ICP's basin (measured on the circle trajectory —
    :class:`icp_tpu.slam.OnlineSlam` does exactly this).

    The single source of the streaming registration semantics — shared by
    :func:`stream_odometry` and the crash-resumable runner
    (:func:`icp_tpu.resilient.resumable_stream_odometry`), so the
    bit-identical-resume contract cannot drift.
    """
    if guess is None:
        guess = geometry.identity(scan.dim, dtype=scan.dtype)
    result, _ = fn(keyframe, scan, guess)
    # keyframe->scan registration transform T: pose advances by inv(T).
    pose = geometry.compose(kf_pose, geometry.inverse(result.transform))
    delta_t = float(jnp.linalg.norm(pose.translation - kf_pose.translation))
    delta_a = abs(
        float(
            geometry.rotation_angle(
                jnp.matmul(
                    pose.rotation,
                    jnp.swapaxes(kf_pose.rotation, -1, -2),
                    precision=geometry.HIGHEST,
                )
            )
        )
    )
    is_kf = delta_t > translation_threshold or delta_a > angle_threshold
    return pose, is_kf, result


def stream_odometry(
    scans,
    method: Method,
    config: DriverConfig,
    translation_threshold: float = 0.5,
    angle_threshold: float = 0.1,
    metrics=None,
):
    """Online odometry: register each incoming scan against the current
    keyframe, yielding ``(pose, is_keyframe, ConvergenceState)`` per scan.

    The serving-mode counterpart of :func:`chain_scans` (which is the
    offline/batch formulation): scans arrive one at a time (an iterable of
    :class:`PointCloud`), each is registered keyframe->scan with the jitted
    converge (one compilation per cloud capacity), and the keyframe advances
    when the pose moves beyond the thresholds — bounding drift accumulation
    the way keyframe selection does for the pose graph.

    ``metrics``: optional :class:`icp_tpu.utils.metrics.MetricsLogger`.
    """
    from .driver import make_converge_fn

    fn = make_converge_fn(method, config)  # jit specializes per shape itself
    keyframe = None
    kf_pose = None
    pose = None
    for t, scan in enumerate(scans):
        if keyframe is None:
            keyframe = scan
            dim = scan.dim
            kf_pose = geometry.identity(dim, dtype=scan.dtype)
            pose = kf_pose
            yield pose, True, None
            continue
        pose, is_kf, result = stream_step(
            fn, keyframe, kf_pose, scan, translation_threshold, angle_threshold
        )
        if metrics is not None:
            metrics.log(
                "odometry_step",
                scan=t,
                iterations=int(result.iteration_count),
                cost=float(result.cost),
                keyframe=is_kf,
            )
        if is_kf:
            keyframe = scan
            kf_pose = pose
        yield pose, is_kf, result


def stream_step_device(
    fn,
    keyframe: PointCloud,
    kf_pose: RigidTransform,
    scan: PointCloud,
    translation_threshold: float,
    angle_threshold: float,
    guess: RigidTransform | None = None,
):
    """Device-side :func:`stream_step`: identical math, but the keyframe
    predicate is returned as a traced boolean instead of being materialized
    with ``float(...)`` — no host synchronization.  Jittable; the building
    block of :func:`stream_odometry_pipelined` and the fused online-SLAM
    step (:func:`icp_tpu.slam._online_step`).
    """
    if guess is None:
        guess = geometry.identity(scan.dim, dtype=scan.dtype)
    result, _ = fn(keyframe, scan, guess)
    pose = geometry.compose(kf_pose, geometry.inverse(result.transform))
    delta_t = jnp.linalg.norm(pose.translation - kf_pose.translation)
    delta_a = jnp.abs(
        geometry.rotation_angle(
            jnp.matmul(
                pose.rotation,
                jnp.swapaxes(kf_pose.rotation, -1, -2),
                precision=geometry.HIGHEST,
            )
        )
    )
    is_kf = (delta_t > translation_threshold) | (delta_a > angle_threshold)
    return pose, is_kf, result


def stream_odometry_pipelined(
    scans,
    method: Method,
    config: DriverConfig,
    translation_threshold: float = 0.5,
    angle_threshold: float = 0.1,
    metrics=None,
):
    """Pipelined online odometry: same per-scan tuple as
    :func:`stream_odometry`, but scan t+1's registration is DISPATCHED
    before scan t's result is materialized on host.

    :func:`stream_odometry` pays a full host round-trip per scan: the
    ``float(...)`` keyframe predicate in :func:`stream_step` blocks until
    the registration finishes, so device compute and host/tunnel latency
    serialize (measured over the TPU tunnel: hundreds of ms of sync against
    1.4-35 ms of compute — VERDICT round-2 item 3).  Here the predicate is
    computed on device (:func:`stream_step_device`), scan t+1's step is
    enqueued against the CURRENT keyframe, and only then is scan t's
    decision materialized — the host sync overlaps scan t+1's device
    compute, keeping the device queue full.

    The price is pipeline semantics, stated precisely:

    * results are yielded with ONE SCAN of latency (scan t's tuple comes
      back after scan t+1 has been pulled from the iterator and enqueued;
      the final scan flushes at iterator exhaustion);
    * a keyframe promotion decided at scan t takes effect from scan t+2's
      registration (t+1 already launched against the old keyframe) — the
      deferred-promotion semantics pinned by
      ``tests/test_odometry_posegraph.py::test_stream_pipelined_matches_serial_reference``.

    Between promotions the math is identical to :func:`stream_odometry`
    (same registrations, same composition), so poses agree exactly except
    on the (one-scan-shifted) promotion boundaries.
    """
    import jax

    from .driver import make_converge_fn

    fn = make_converge_fn(method, config)
    step = jax.jit(
        lambda kf, kf_pose, scan: stream_step_device(
            fn, kf, kf_pose, scan, translation_threshold, angle_threshold
        )
    )

    keyframe = kf_pose = None
    pending = None  # (scan, pose, is_kf, result) — scan t while t+1 dispatches
    for t, scan in enumerate(scans):
        if keyframe is None:
            keyframe = scan
            kf_pose = geometry.identity(scan.dim, dtype=scan.dtype)
            yield kf_pose, True, None
            continue
        pose, is_kf, result = step(keyframe, kf_pose, scan)  # async dispatch
        if pending is not None:
            p_scan, p_pose, p_is_kf, p_result = pending
            promoted = bool(p_is_kf)  # host sync overlaps scan t's compute
            if promoted:
                keyframe, kf_pose = p_scan, p_pose
            if metrics is not None:
                metrics.log(
                    "odometry_step",
                    scan=t - 1,
                    iterations=int(p_result.iteration_count),
                    cost=float(p_result.cost),
                    keyframe=promoted,
                )
            yield p_pose, promoted, p_result
        pending = (scan, pose, is_kf, result)
    if pending is not None:
        promoted = bool(pending[2])
        if metrics is not None:
            metrics.log(
                "odometry_step",
                scan=-1,
                iterations=int(pending[3].iteration_count),
                cost=float(pending[3].cost),
                keyframe=promoted,
            )
        yield pending[1], promoted, pending[3]


def relative_pose(poses: RigidTransform, i, j) -> RigidTransform:
    """``pose_i^{-1} ∘ pose_j`` — the frame-i-relative pose of frame j."""
    pi = RigidTransform(poses.rotation[i], poses.translation[i])
    pj = RigidTransform(poses.rotation[j], poses.translation[j])
    return geometry.compose(geometry.inverse(pi), pj)
