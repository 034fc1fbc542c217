"""Elastic restart: checkpointed odometry + a bounded-retry supervisor.

The reference is a single-process CLI with no recovery story (SURVEY §5:
"failure detection / elastic recovery: none").  A TPU deployment runs on
preemptible workers, so the long-running jobs here — streaming odometry
over an unbounded scan log — need to survive kill-anywhere restarts:

* :class:`CheckpointManager` — atomic, rotating, corruption-tolerant
  on-disk checkpoints of arbitrary array pytrees (tmp + rename, keep-K,
  unreadable-latest falls back to the previous generation).
* :func:`resumable_stream_odometry` — :func:`icp_tpu.odometry.stream_odometry`
  wrapped with periodic checkpoints of its full streaming state (scan
  index, keyframe cloud, keyframe/current poses, trajectory so far).  A
  restarted process fast-forwards to the first unprocessed scan and
  continues; the resumed trajectory is **bit-identical** to an
  uninterrupted run (registration is deterministic and the keyframe state
  round-trips exactly) — pinned by ``tests/test_resilient.py``.
* :func:`run_with_retries` — fail-fast supervisor: re-invokes a job on
  exception with bounded restarts.  Combined with the resumable runner,
  each retry loses at most ``checkpoint_every - 1`` scans of work.

The multi-host model stays fail-fast (jax.distributed's assumption): any
worker death kills the job; the supervisor restarts it and every worker
reloads the same checkpoint (the manager's files are plain ``.npz`` on a
shared filesystem).
"""

from __future__ import annotations

import json
import os
import time
import warnings

import numpy as np

from . import geometry
from .cloud import PointCloud

__all__ = [
    "CheckpointManager",
    "resumable_stream_odometry",
    "run_with_retries",
]


class CheckpointManager:
    """Atomic rotating checkpoints of ``(step, arrays dict)`` on disk.

    Files are ``ckpt_<step>.npz`` written via tmp + ``os.replace`` (a
    reader never sees a half-written file); ``keep`` newest generations
    are retained.  ``latest()`` skips unreadable entries, so a crash
    *during* a save (or disk corruption) degrades to the previous
    generation instead of poisoning the run.
    """

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step:09d}.npz")

    def _steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("ckpt_") and name.endswith(".npz"):
                try:
                    out.append(int(name[5:-4]))
                except ValueError:
                    continue
        return sorted(out)

    def save(self, step: int, arrays: dict) -> str:
        """Atomically persist ``arrays`` (str -> np.ndarray) as ``step``."""
        path = self._path(step)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, path)
        for old in self._steps()[: -self.keep]:
            try:
                os.remove(self._path(old))
            except OSError:
                pass
        return path

    def latest(self) -> tuple[int, dict] | None:
        """Newest readable checkpoint as ``(step, arrays)``, or ``None``."""
        for step in reversed(self._steps()):
            path = self._path(step)
            try:
                with np.load(path) as data:
                    return step, {k: data[k] for k in data.files}
            except Exception as e:  # noqa: BLE001 - fall back a generation
                warnings.warn(f"icp_tpu.resilient: skipping unreadable {path}: {e}")
        return None


def _pack_state(t, keyframe, kf_pose, pose, poses_so_far, dim):
    return {
        "t": np.asarray(t),
        "dim": np.asarray(dim),
        "kf_points": np.asarray(keyframe.points),
        "kf_count": np.asarray(keyframe.count),
        "kf_rot": np.asarray(kf_pose.rotation),
        "kf_trans": np.asarray(kf_pose.translation),
        "rot": np.asarray(pose.rotation),
        "trans": np.asarray(pose.translation),
        "traj_rot": np.stack([np.asarray(p.rotation) for p in poses_so_far]),
        "traj_trans": np.stack([np.asarray(p.translation) for p in poses_so_far]),
    }


def resumable_stream_odometry(
    scans,
    method,
    config,
    checkpoint_dir: str,
    checkpoint_every: int = 10,
    translation_threshold: float = 0.5,
    angle_threshold: float = 0.1,
    metrics=None,
):
    """Streaming keyframe odometry with crash-resume.

    ``scans`` must be an indexable sequence of :class:`PointCloud` (resume
    needs random access to fast-forward).  Yields ``(t, pose, is_keyframe,
    result)`` for every scan processed *by this process* — already-
    checkpointed scans are skipped on restart.  Checkpoints the complete
    streaming state every ``checkpoint_every`` scans and at stream end.

    Semantics match :func:`icp_tpu.odometry.stream_odometry` exactly
    (keyframe->scan registration, threshold-advanced keyframes,
    ``icp.h:120-168`` steppability analogue); the resumed trajectory is
    bit-identical to an uninterrupted run.
    """
    import jax.numpy as jnp

    from .driver import make_converge_fn
    from .odometry import stream_step

    manager = CheckpointManager(checkpoint_dir)
    fn = make_converge_fn(method, config)

    start_t = 0
    keyframe = None
    kf_pose = pose = None
    poses_so_far: list[geometry.RigidTransform] = []

    loaded = manager.latest()
    if loaded is not None:
        step, s = loaded
        start_t = int(s["t"]) + 1
        keyframe = PointCloud(jnp.asarray(s["kf_points"]), jnp.asarray(s["kf_count"]))
        kf_pose = geometry.RigidTransform(
            jnp.asarray(s["kf_rot"]), jnp.asarray(s["kf_trans"])
        )
        pose = geometry.RigidTransform(jnp.asarray(s["rot"]), jnp.asarray(s["trans"]))
        poses_so_far = [
            geometry.RigidTransform(
                jnp.asarray(s["traj_rot"][i]), jnp.asarray(s["traj_trans"][i])
            )
            for i in range(s["traj_rot"].shape[0])
        ]

    for t in range(start_t, len(scans)):
        scan = scans[t]
        if keyframe is None:
            dim = scan.dim
            keyframe = scan
            kf_pose = geometry.identity(dim, dtype=scan.dtype)
            pose = kf_pose
            poses_so_far.append(pose)
            manager.save(t, _pack_state(t, keyframe, kf_pose, pose, poses_so_far, dim))
            yield t, pose, True, None
            continue

        pose, is_kf, result = stream_step(
            fn, keyframe, kf_pose, scan, translation_threshold, angle_threshold
        )
        if is_kf:
            keyframe = scan
            kf_pose = pose
        poses_so_far.append(pose)
        if metrics is not None:
            metrics.log(
                "odometry_step",
                scan=t,
                iterations=int(result.iteration_count),
                cost=float(result.cost),
                keyframe=is_kf,
            )
        if (t - start_t) % checkpoint_every == checkpoint_every - 1 or t == len(scans) - 1:
            manager.save(t, _pack_state(t, keyframe, kf_pose, pose, poses_so_far, scan.dim))
        yield t, pose, is_kf, result


def run_with_retries(
    job,
    max_restarts: int = 3,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    backoff_s: float = 0.0,
    on_restart=None,
):
    """Fail-fast supervisor: call ``job()``; on a ``retry_on`` exception,
    re-invoke up to ``max_restarts`` times (the job is expected to resume
    from its own checkpoints, e.g. :func:`resumable_stream_odometry`).

    Returns the successful call's result.  Re-raises the last exception
    once the restart budget is exhausted.  ``on_restart(attempt, exc)`` is
    invoked before each retry (logging/metrics hook).
    """
    attempt = 0
    while True:
        try:
            return job()
        except retry_on as e:  # noqa: PERF203 - supervisor loop
            attempt += 1
            if attempt > max_restarts:
                raise
            if on_restart is not None:
                on_restart(attempt, e)
            if backoff_s:
                time.sleep(backoff_s * attempt)


def job_status(checkpoint_dir: str) -> dict:
    """Inspection helper: progress of a (possibly dead) resumable run."""
    manager = CheckpointManager(checkpoint_dir)
    loaded = manager.latest()
    if loaded is None:
        return {"checkpointed": False}
    step, s = loaded
    return {
        "checkpointed": True,
        "last_scan": int(s["t"]),
        "trajectory_length": int(s["traj_rot"].shape[0]),
        "position": [float(x) for x in s["trans"]],
    }


def _json_default(o):
    return o.tolist() if isinstance(o, np.ndarray) else str(o)


def format_status(checkpoint_dir: str) -> str:
    return json.dumps(job_status(checkpoint_dir), default=_json_default)


def resumable_online_slam(
    scans,
    method,
    config,
    manager: CheckpointManager,
    checkpoint_every: int = 5,
    **online_kwargs,
):
    """Crash-resumable :class:`icp_tpu.slam.OnlineSlam`: yields one
    :class:`icp_tpu.slam.OnlineUpdate` per scan, checkpointing the FULL
    streaming state (keyframes, poses, immutable odometry measurements,
    closures, candidate bookkeeping) every ``checkpoint_every`` scans.

    A restarted process fast-forwards to the first unprocessed scan and
    continues; the resumed keyframe trajectory is bit-identical to an
    uninterrupted run (pinned by ``tests/test_resilient.py``).  Yields
    ``(scan_index, online, update)`` — the OnlineSlam object is exposed so
    the caller can ``online.finalize()`` after the iterable is exhausted
    (and checkpoint the finalized state if desired).
    """
    from .slam import OnlineSlam

    online = OnlineSlam(method, config, **online_kwargs)
    start = 0
    latest = manager.latest()
    if latest is not None:
        step, state = latest
        online.load_state(state)
        start = step
    for t, scan in enumerate(scans):
        if t < start:
            continue  # fast-forward past checkpointed work
        update = online.add_scan(scan)
        if (t + 1) % checkpoint_every == 0:
            manager.save(t + 1, online.state_dict())
        yield t, online, update
