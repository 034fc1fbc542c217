#!/usr/bin/env python3
"""Measure grid NN vs the fused (N, M) brute-force reduce on the real chip.

The decision gate for `ops/grid_nn.py` (pallas_nn rule: integration follows
measurement).  Times both ops across target sizes at registration-realistic
densities, device-chained (n reps in a fori_loop, best-of-3 — the queen
protocol; per-dispatch tunnel variance otherwise dominates).

Run on TPU:   python scripts/grid_nn_probe.py
Run on CPU:   JAX_PLATFORMS=cpu python scripts/grid_nn_probe.py  (sanity only)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from icp_tpu.ops.grid_nn import build_grid, grid_nearest_neighbors
    from icp_tpu.ops.nn import nearest_neighbors

    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    rng = np.random.default_rng(0)
    reps = 50

    # (N queries, M targets, extent, cell, capacity): seq3d-scan scale,
    # queen scale, local-map scale, big-map scale.
    cases = [
        (1536, 2048, 20.0, 1.0, 64),
        (8192, 16384, 30.0, 1.0, 64),
        (8192, 65536, 60.0, 1.0, 64),
        (16384, 131072, 80.0, 1.0, 64),
    ]
    for n, m, extent, cell, cap in cases:
        q = jnp.asarray(rng.uniform(-extent, extent, (n, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-extent, extent, (m, 3)).astype(np.float32))
        mask = jnp.ones((m,), dtype=bool)

        grid = jax.jit(lambda tt, mm: build_grid(tt, mm, cell))(t, mask)

        @jax.jit
        def run_grid(qq, gg):
            def body(_, acc):
                sq, idx, _ = grid_nearest_neighbors(qq, gg, cap)
                return acc + jnp.sum(sq == 0.0) + idx[0]

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        @jax.jit
        def run_brute(qq, tt, mm):
            def body(_, acc):
                sq, idx = nearest_neighbors(qq, tt, mm)
                return acc + jnp.sum(sq == 0.0).astype(jnp.int32) + idx[0]

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        def timed(fn, *args):
            int(fn(*args))  # compile + materialize
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                int(fn(*args))
                best = min(best, (time.perf_counter() - t0) / reps * 1e3)
            return best

        # Overflow sanity at this density before timing.
        _, _, overflow = grid_nearest_neighbors(q, grid, cap)
        ms_build = timed(jax.jit(lambda tt, mm: build_grid(tt, mm, cell)[0].sum()), t, mask)
        ms_grid = timed(run_grid, q, grid)
        ms_brute = timed(run_brute, q, t, mask)
        print(
            json.dumps(
                {
                    "n": n,
                    "m": m,
                    "cell": cell,
                    "capacity": cap,
                    "overflowed": bool(overflow),
                    "grid_query_ms": round(ms_grid, 3),
                    "grid_build_ms": round(ms_build, 3),
                    "brute_ms": round(ms_brute, 3),
                    "speedup_query": round(ms_brute / ms_grid, 2),
                }
            )
        )


if __name__ == "__main__":
    main()
