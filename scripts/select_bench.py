"""On-chip radix-select vs rank-matrix trim measurement at bench shapes.

Times ``trim_weights`` under both selectors at (B, N) = (1024, 1024) f32 on
the real TPU, plus the full trimmed iterate (whose default selector is
radix), for comparison with the rank-path iterate recorded by
``scripts/iterate_breakdown.py``.  Records go to BASELINE.md
"Radix-select trim".

Run on TPU: ``python scripts/select_bench.py`` (backgrounded; remote
compiles are slow).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, M = 1024, 1024, 1024
REPEATS = 20


def timed(fn, *args):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    _ = [float(jnp.sum(jnp.ravel(x)[:1])) for x in jax.tree.leaves(out)]
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
        _ = [float(jnp.sum(jnp.ravel(x)[:1])) for x in jax.tree.leaves(out)[:1]]
    return (time.perf_counter() - t0) / REPEATS * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    import icp_tpu as icp
    from icp_tpu.methods.trimmed import trim_weights

    print(f"backend: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    sq = jnp.asarray(rng.uniform(0, 100, (B, N)), dtype=jnp.float32)
    count = jnp.full((B,), N, dtype=jnp.int32)

    results = {}
    for sel in ("rank", "radix"):
        f = jax.jit(lambda s, c, sel=sel: trim_weights(s, c, 0.9, jnp.float32, sel))
        results[f"trim_{sel}_ms"] = timed(f, sq, count)
        print(f"trim_{sel}:", results[f"trim_{sel}_ms"], file=sys.stderr, flush=True)

    # full iterate with the current default (radix); compare against the
    # rank-path iterate from iterate_breakdown.py (48.07 ms at this shape).
    a = jnp.asarray(rng.uniform(-5, 5, (B, N, 2)), dtype=jnp.float32)
    b = jnp.asarray(rng.uniform(-5, 5, (B, M, 2)), dtype=jnp.float32)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    src = icp.cloud.PointCloud(a, count)
    tgt = icp.cloud.PointCloud(b, jnp.full((B,), M, dtype=jnp.int32))
    state0 = jax.jit(method.init)(src, tgt, icp.identity(2, (B,)))
    f_it = jax.jit(method.iterate)
    results["full_iterate_radix_ms"] = timed(f_it, state0)
    print("iterate:", results["full_iterate_radix_ms"], file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
