#!/usr/bin/env python3
"""Multi-device scaling-efficiency benchmark.

Measures batched-registration throughput while growing the ``data`` mesh
axis (and optionally the ``points`` axis), reporting per-size throughput and
efficiency vs linear scaling — the measurement behind the >=80%-at-N-hosts
target (BASELINE.md north star).

On a multi-chip TPU slice run as-is (devices = all local chips); across
hosts launch with ``jax.distributed`` env vars set and it initializes the
runtime first.  On CPU it still runs (virtual devices via
``--virtual N``) to validate the harness, though CPU wall-clock is not a
scaling signal.

Prints one JSON line per mesh size:
  {"devices": d, "pairs_per_sec": ..., "efficiency_vs_1": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, help="force N virtual CPU devices")
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--multihost", action="store_true")
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import icp_tpu as icp
    from icp_tpu.parallel import (
        initialize_multihost,
        make_mesh,
        make_sharded_converge_fn,
        shard_batch,
    )

    if args.multihost:
        initialize_multihost()

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    base = None

    sizes = [d for d in [1, 2, 4, 8, 16, 32, 64] if d <= n_dev]
    for d in sizes:
        batch = args.batch_per_device * d
        cap = args.capacity
        a_pts = rng.uniform(-30, 30, (batch, cap, 2)).astype(np.float32)
        b_pts = rng.uniform(-30, 30, (batch, cap, 2)).astype(np.float32)
        a = icp.PointCloud(jnp.asarray(a_pts), jnp.full((batch,), cap - 10, jnp.int32))
        b = icp.PointCloud(jnp.asarray(b_pts), jnp.full((batch,), cap - 5, jnp.int32))
        guess = icp.identity(2, (batch,), dtype=np.float32)

        mesh = make_mesh(data=d, points=1, devices=np.asarray(jax.devices()[:d]))
        method = icp.from_method("trimmed", 2)
        cfg = icp.DriverConfig(min_iterations=args.iterations, max_iterations=args.iterations)
        fn = make_sharded_converge_fn(method, cfg, mesh, shard_points=False)
        src, tgt, g = shard_batch((a, b, guess), mesh)

        result, _ = fn(src, tgt, g)
        jax.block_until_ready(result)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            result, _ = fn(src, tgt, g)
        jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        pps = batch * args.repeats / dt
        if base is None:
            base = pps
        print(
            json.dumps(
                {
                    "devices": d,
                    "pairs_per_sec": round(pps, 2),
                    "efficiency_vs_1": round(pps / (base * d), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
