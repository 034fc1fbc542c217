"""Benchmark: batched 2D registration throughput on the real scan1 pair.

Replicates the reference's bench protocol (``bench/bench.cpp:108-119``:
``trimmed`` on scan1, driver at max 50 iterations, 0.1 deg angle / 0.01
translation tolerance) but batched — the TPU registers a fleet of pairs per
``converge`` invocation.

The registration path is the coarse-to-fine pyramid
(``icp_tpu.multiscale``, decimation factor 4 then full resolution) — the
same termination tolerances are enforced at full resolution, so the
workload contract is unchanged while the path to the basin is ~3x cheaper
(measured: full-res-only ~4.9k pairs/s, multiscale ~15.5k pairs/s).

Baseline: the reference's only published number, ~63 ``converge``
invocations/s single-core CPU (v1.1.1 bench screenshot; see BASELINE.md).
``vs_baseline`` = our pairs-registered-per-second / 63.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_CONVERGES_PER_SEC = 63.0  # BASELINE.md (v1.1.1bench.png)
BATCH = 1024
CAPACITY = 1024
REPEATS = 5


def main():
    import os

    import jax

    # Persistent compilation cache: the batched while-loop converge takes
    # minutes to compile over the TPU tunnel; cache it across bench runs.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import icp_tpu as icp

    repo = os.path.dirname(os.path.abspath(__file__))
    data_dir = "/root/reference/ex_data"
    if not os.path.isdir(data_dir):
        # Standalone checkouts: the bundled synthetic scan pair. Numbers are
        # only comparable across runs using the same dataset.
        data_dir = os.path.join(repo, "ex_data")
    a_pts = icp.io.parse_lidar_scan_array(f"{data_dir}/scan1/first.csv")
    b_pts = icp.io.parse_lidar_scan_array(f"{data_dir}/scan1/second.csv")

    a1 = icp.from_points(a_pts, capacity=CAPACITY, dtype=np.float32)
    b1 = icp.from_points(b_pts, capacity=CAPACITY, dtype=np.float32)
    # A fleet of pairs: the scan1 pair under BATCH random initial-guess
    # perturbations (realistic divergent per-lane iteration counts).
    rng = np.random.default_rng(0)
    angles = rng.uniform(-0.05, 0.05, BATCH).astype(np.float32)
    shifts = rng.uniform(-0.2, 0.2, (BATCH, 2)).astype(np.float32)
    guess = icp.geometry.from_angle_2d(jnp.asarray(angles), jnp.asarray(shifts))

    import jax.tree as jtree

    a = jtree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), a1)
    b = jtree.map(lambda x: jnp.broadcast_to(x, (BATCH,) + x.shape), b1)

    from icp_tpu.multiscale import converge_multiscale

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )

    @jax.jit
    def fn(source, tgt, g):
        return converge_multiscale(
            method, source, tgt, g, cfg, factors=(4,), coarse_max_iterations=30
        )

    # Warmup / compile.
    result, _ = fn(a, b, guess)
    float(jnp.sum(result.cost))  # force full execution (block_until_ready
    # can return early over remote-tunnel backends)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        result, _ = fn(a, b, guess)
        float(jnp.sum(result.cost))  # materialize every invocation
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * REPEATS / dt
    print(
        json.dumps(
            {
                "metric": "scan1_trimmed_pairs_per_sec",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_CONVERGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
