"""Micro-batching registration server tests."""

import threading

import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu.serve import BatchingRegistrar


def make_pair(rng, shift):
    a = rng.uniform(-20, 20, (48, 2))
    return a, a + shift


def test_single_request(rng):
    a, b = make_pair(rng, np.array([1.5, -0.5]))
    with BatchingRegistrar(
        icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0)),
        icp.DriverConfig(max_iterations=30, angle_tolerance=1e-4, translation_tolerance=1e-4),
        capacity=64,
        max_batch_size=8,
        dtype=np.float64,
    ) as server:
        result = server.register(a, b, timeout=120)
    np.testing.assert_allclose(result.translation, [1.5, -0.5], atol=1e-3)
    assert result.iterations > 0


def test_concurrent_clients_batched(rng):
    """Many threads submit different pairs; every client gets ITS answer."""
    shifts = [np.array([0.5 * k, -0.25 * k]) for k in range(12)]
    pairs = [make_pair(rng, s) for s in shifts]
    server = BatchingRegistrar(
        icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0)),
        icp.DriverConfig(max_iterations=30, angle_tolerance=1e-4, translation_tolerance=1e-4),
        capacity=64,
        max_batch_size=8,
        max_delay=0.05,
        dtype=np.float64,
    )
    results = [None] * len(pairs)

    def client(k):
        a, b = pairs[k]
        results[k] = server.register(a, b, timeout=300)

    threads = [threading.Thread(target=client, args=(k,)) for k in range(len(pairs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.close()
    for k, s in enumerate(shifts):
        np.testing.assert_allclose(results[k].translation, s, atol=1e-3)


def test_oversized_cloud_rejected(rng):
    server = BatchingRegistrar(
        icp.from_method("trimmed", 2),
        icp.DriverConfig(max_iterations=5),
        capacity=32,
        dtype=np.float64,
    )
    big = rng.uniform(-5, 5, (100, 2))
    with pytest.raises(ValueError, match="exceeds server capacity"):
        server.submit(big, big)
    server.close()


def test_submit_after_close_raises(rng):
    server = BatchingRegistrar(
        icp.from_method("trimmed", 2), icp.DriverConfig(max_iterations=5),
        capacity=32, dtype=np.float64,
    )
    a, b = make_pair(rng, np.array([0.1, 0.1]))
    server.register(a[:20], b[:20], timeout=120)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit(a[:20], b[:20])


def test_cancelled_future_does_not_kill_worker(rng):
    """Regression: resolving a client-cancelled Future must not raise inside
    the worker thread (InvalidStateError would kill it and hang all later
    requests)."""
    server = BatchingRegistrar(
        icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0)),
        icp.DriverConfig(max_iterations=10, angle_tolerance=1e-3, translation_tolerance=1e-2),
        capacity=64,
        max_batch_size=4,
        max_delay=0.2,
        dtype=np.float64,
    )
    a, b = make_pair(rng, np.array([0.4, 0.2]))
    doomed = server.submit(a, b)
    assert doomed.cancel()  # queued, not yet running -> cancels
    # The server must still serve subsequent requests.
    result = server.register(a, b, timeout=300)
    server.close()
    np.testing.assert_allclose(result.translation, [0.4, 0.2], atol=1e-2)


def test_dimension_mismatch_rejected_per_request(rng):
    server = BatchingRegistrar(
        icp.from_method("trimmed", 2),
        icp.DriverConfig(max_iterations=5),
        capacity=64,
        dtype=np.float64,
    )
    bad3d = rng.uniform(-5, 5, (10, 3))
    with pytest.raises(ValueError, match="dimension mismatch"):
        server.submit(bad3d, bad3d)
    server.close()


def test_capacity_buckets(rng):
    """Requests pad to the smallest bucket that fits; both buckets serve."""
    server = BatchingRegistrar(
        icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0)),
        icp.DriverConfig(max_iterations=20, angle_tolerance=1e-4, translation_tolerance=1e-4),
        capacity=(32, 128),
        max_batch_size=4,
        dtype=np.float64,
    )
    small = rng.uniform(-5, 5, (20, 2))
    big = rng.uniform(-5, 5, (100, 2))
    with server:
        r_small = server.register(small, small + [0.1, 0.0], timeout=120)
        r_big = server.register(big, big + [0.0, 0.2], timeout=120)
    np.testing.assert_allclose(r_small.translation, [0.1, 0.0], atol=1e-3)
    np.testing.assert_allclose(r_big.translation, [0.0, 0.2], atol=1e-3)


def test_bounded_queue_sheds_load(rng):
    """max_pending back-pressure: overflow raises ServerOverloaded."""
    from icp_tpu.serve import ServerOverloaded

    server = BatchingRegistrar(
        icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0)),
        icp.DriverConfig(max_iterations=5, angle_tolerance=1e-4, translation_tolerance=1e-4),
        capacity=32,
        max_batch_size=2,
        max_pending=1,
        dtype=np.float64,
    )
    a = rng.uniform(-5, 5, (16, 2))
    # Fill the 1-slot queue faster than the worker can drain; at least one
    # submit must shed (the worker may drain some first — race is fine, the
    # contract is "bounded, sheds instead of queueing forever").
    shed = 0
    futures = []
    try:
        for _ in range(200):
            try:
                futures.append(server.submit(a, a))
            except ServerOverloaded:
                shed += 1
    finally:
        for f in futures:
            f.result(timeout=120)
        server.close()
    assert shed > 0


def test_injected_converge_fn(rng):
    """converge_fn injection point (e.g. a mesh-sharded fn) is honored."""
    calls = []
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(max_iterations=10, angle_tolerance=1e-4, translation_tolerance=1e-4)
    inner = icp.make_converge_fn(method, cfg)

    def spy(src, tgt, guess):
        calls.append(src.points.shape)
        return inner(src, tgt, guess)

    server = BatchingRegistrar(
        method, cfg, capacity=32, max_batch_size=2, dtype=np.float64, converge_fn=spy
    )
    a = rng.uniform(-5, 5, (16, 2))
    with server:
        server.register(a, a + [0.05, 0.0], timeout=120)
    assert calls and calls[0] == (2, 32, 2)
