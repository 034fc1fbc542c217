"""Micro-batching registration server (host-side serving runtime).

The TPU earns its throughput on batches (bench: ~15k pairs/s at B=1024 vs
~60 pairs/s if pairs were registered one-by-one at ~70 ms/dispatch), but
serving clients submit single pairs.  :class:`BatchingRegistrar` bridges the
two: requests queue on the host, a worker thread drains up to
``max_batch_size`` of them (waiting at most ``max_delay`` for stragglers),
pads them into one fixed-capacity batch, runs the jitted batched converge,
and resolves per-request futures.

Shape discipline keeps compiles bounded: ``capacity`` may be a single
value or an ascending tuple of bucket capacities — each request is padded
to the smallest bucket that fits it, batches are padded up to
``max_batch_size`` with duplicate lanes, and each bucket owns exactly one
compiled program shape, so steady-state serving reuses a small fixed set
of programs (one per active bucket).  ``max_pending`` bounds the request
queue: beyond it, ``submit`` sheds load with ``ServerOverloaded`` instead
of queueing unboundedly (production back-pressure).

This is deliberately a small, dependency-free piece of host runtime (queue +
thread + futures) — transport (gRPC/HTTP) is the caller's choice.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError

import numpy as np

from .cloud import PointCloud
from .driver import DriverConfig, make_converge_fn
from .geometry import RigidTransform
from .methods.base import Method


@dataclasses.dataclass
class RegistrationResult:
    rotation: np.ndarray
    translation: np.ndarray
    iterations: int
    cost: float


@dataclasses.dataclass
class _Request:
    source: np.ndarray  # (n, D)
    target: np.ndarray  # (m, D)
    guess_rotation: np.ndarray
    guess_translation: np.ndarray
    future: Future
    bucket: int = 0  # capacity bucket this request pads to


class ServerOverloaded(RuntimeError):
    """Raised by ``submit`` when the bounded request queue is full."""


class BatchingRegistrar:
    """Thread-backed micro-batcher over the jitted batched converge."""

    def __init__(
        self,
        method: Method,
        config: DriverConfig,
        capacity: int | tuple[int, ...] = 1024,
        max_batch_size: int = 256,
        max_delay: float = 0.005,
        dtype=np.float32,
        max_pending: int | None = None,
        converge_fn=None,
    ):
        self._method = method
        self._buckets = tuple(sorted({int(c) for c in np.atleast_1d(capacity)}))
        self._capacity = self._buckets[-1]
        self._max_batch = max_batch_size
        self._max_delay = max_delay
        self._dtype = dtype
        # Injectable converge (e.g. a mesh-sharded fn from
        # parallel.make_sharded_converge_fn) — default is the single-device
        # jitted batched converge.
        self._fn = converge_fn if converge_fn is not None else make_converge_fn(method, config)
        self._queue: queue.Queue[_Request | None] = queue.Queue(
            maxsize=0 if max_pending is None else max_pending
        )
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._lock = threading.Lock()
        self._started = False
        self._closed = False

    # -- client API --------------------------------------------------------

    def submit(
        self,
        source: np.ndarray,
        target: np.ndarray,
        guess: RigidTransform | None = None,
    ) -> Future:
        """Queue one pair; returns a Future[RegistrationResult]."""
        source = np.asarray(source, dtype=self._dtype)
        target = np.asarray(target, dtype=self._dtype)
        size = max(len(source), len(target))
        if size > self._capacity:
            raise ValueError(
                f"cloud exceeds server capacity {self._capacity}"
            )
        bucket = next(b for b in self._buckets if size <= b)
        dim = source.shape[1]
        # Per-request validation: a malformed request must fail alone, not
        # poison the whole batch it would be co-batched with.
        if target.shape[1] != dim or dim != self._method.dim:
            raise ValueError(
                f"dimension mismatch: source {dim}D, target {target.shape[1]}D, "
                f"server method is {self._method.dim}D"
            )
        if guess is None:
            gr = np.eye(dim, dtype=self._dtype)
            gt = np.zeros(dim, dtype=self._dtype)
        else:
            gr = np.asarray(guess.rotation, dtype=self._dtype)
            gt = np.asarray(guess.translation, dtype=self._dtype)
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("registrar is closed")
            if not self._started:
                self._started = True
                self._worker.start()
            try:
                self._queue.put_nowait(_Request(source, target, gr, gt, fut, bucket))
            except queue.Full:
                raise ServerOverloaded(
                    f"request queue full ({self._queue.maxsize} pending)"
                ) from None
        return fut

    def register(self, source, target, guess=None, timeout=None) -> RegistrationResult:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(source, target, guess).result(timeout=timeout)

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            started = self._started
        if started:
            while True:  # a full bounded queue must still accept shutdown
                try:
                    self._queue.put(None, timeout=0.1)
                    break
                except queue.Full:
                    continue
        if started:
            self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- worker ------------------------------------------------------------

    def _drain(self) -> list[_Request] | None:
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        # One deadline from the FIRST request — a trickle of stragglers must
        # not keep extending the window.
        deadline = time.monotonic() + self._max_delay
        while len(batch) < self._max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-post shutdown for the outer loop
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        import jax.numpy as jnp

        while True:
            drained = self._drain()
            if drained is None:
                return
            # Group by capacity bucket: each bucket is one compiled program
            # shape; a mixed drain becomes a few back-to-back launches.
            groups: dict[int, list[_Request]] = {}
            for r in drained:
                groups.setdefault(r.bucket, []).append(r)
            for cap, batch in sorted(groups.items()):
                self._run_bucket(cap, batch)

    def _run_bucket(self, cap: int, batch: list[_Request]) -> None:
        import jax.numpy as jnp

        n = len(batch)
        # Pad the batch to max_batch_size with duplicates of lane 0 so
        # steady-state serving reuses one compiled program per bucket.
        padded = batch + [batch[0]] * (self._max_batch - n)
        dim = batch[0].source.shape[1]

        def stack_clouds(key):
            pts = np.zeros((self._max_batch, cap, dim), dtype=self._dtype)
            counts = np.zeros(self._max_batch, dtype=np.int32)
            for i, r in enumerate(padded):
                arr = getattr(r, key)
                pts[i, : len(arr)] = arr
                counts[i] = len(arr)
            return PointCloud(jnp.asarray(pts), jnp.asarray(counts))

        try:
            src = stack_clouds("source")
            tgt = stack_clouds("target")
            guess = RigidTransform(
                jnp.asarray(np.stack([r.guess_rotation for r in padded])),
                jnp.asarray(np.stack([r.guess_translation for r in padded])),
            )
            result, _ = self._fn(src, tgt, guess)
            rot = np.asarray(result.transform.rotation)
            trans = np.asarray(result.transform.translation)
            iters = np.asarray(result.iteration_count)
            costs = np.asarray(result.cost)
        except Exception as exc:  # resolve futures rather than dying
            for r in batch:
                try:
                    r.future.set_exception(exc)
                except InvalidStateError:
                    pass  # client cancelled; never kill the worker
            return
        for i, r in enumerate(batch):
            try:
                r.future.set_result(
                    RegistrationResult(
                        rotation=rot[i],
                        translation=trans[i],
                        iterations=int(iters[i]),
                        cost=float(costs[i]),
                    )
                )
            except InvalidStateError:
                pass  # client cancelled mid-flight
