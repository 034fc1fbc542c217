"""On-chip probe: radix-select vs top_k neighborhood moments; gicp converge.

Measures (1) ``neighborhood_moments`` under both selectors at the gicp bench
shape — the init-time covariance estimation that dominated gicp's round-1
throughput (BASELINE.md "Net-new method throughput") — and (2) the full
gicp converge pairs/s on a scan1-like workload with the new default.

Run on TPU: ``python scripts/gicp_probe.py`` (background; slow compiles).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N = 256, 1024
REPEATS = 10


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
    from icp_tpu.methods.point_to_plane import neighborhood_moments

    print(f"backend: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    results = {}

    for dim in (2, 3):
        pts = jnp.asarray(rng.uniform(-5, 5, (B, N, dim)), dtype=jnp.float32)
        mask = jnp.ones((B, N), dtype=bool)
        for sel in ("topk", "select"):
            f = jax.jit(lambda p, m, s=sel: neighborhood_moments(p, m, 20, selector=s))
            key = f"moments_{dim}d_{sel}_ms"
            results[key] = timed(f, pts, mask)
            print(f"{key}: {results[key]:.2f}", file=sys.stderr, flush=True)

    # full gicp converge, scan1, B=256, bench config (round-1 self-baseline
    # ~520 pairs/s with the top_k path).
    data_dir = "/root/reference/ex_data"
    if not os.path.isdir(data_dir):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        data_dir = os.path.join(repo, "ex_data")
    import jax.tree as jtree

    a_pts = icp.io.parse_lidar_scan_array(f"{data_dir}/scan1/first.csv")
    b_pts = icp.io.parse_lidar_scan_array(f"{data_dir}/scan1/second.csv")
    a1 = icp.from_points(a_pts, capacity=N, dtype=np.float32)
    b1 = icp.from_points(b_pts, capacity=N, dtype=np.float32)
    a = jtree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), a1)
    b = jtree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), b1)
    angles = np.random.default_rng(0).uniform(-0.05, 0.05, B).astype(np.float32)
    shifts = np.random.default_rng(1).uniform(-0.2, 0.2, (B, 2)).astype(np.float32)
    guess = icp.geometry.from_angle_2d(jnp.asarray(angles), jnp.asarray(shifts))
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    method = icp.from_method("gicp", 2, icp.Config(dim=2))
    fn = icp.make_converge_fn(method, cfg)

    def run(a, b, g):
        result, _ = fn(a, b, g)
        return result

    print("compiling gicp converge ...", file=sys.stderr, flush=True)
    ms = timed(run, a, b, guess)
    results["gicp_converge_ms"] = ms
    results["gicp_pairs_per_sec"] = B / (ms / 1e3)
    print(f"gicp: {results['gicp_pairs_per_sec']:.0f} pairs/s", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
