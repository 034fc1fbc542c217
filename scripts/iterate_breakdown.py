"""On-chip phase breakdown of the trimmed-2D iterate at bench shapes.

Times each stage of the hot loop separately (B, N, M) = (1024, 1024, 1024)
f32 on the real TPU: NN distance+argmin, trim rank/weights, indexed rigid
fit, the full iterate, and the standalone Pallas NN for reference.  Guides
the fused-iteration kernel design (ROADMAP #2 / VERDICT item 1): fusion pays
where phases serialize VPU-bound and MXU-bound work that could overlap.

Run on TPU: ``python scripts/iterate_breakdown.py`` (backgrounded; first
compiles are remote and slow).
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
    import jax.numpy as jnp

    out = fn(*args)
    # materialize (block_until_ready unreliable over the tunnel)
    _ = [float(jnp.sum(jnp.ravel(x)[:1])) for x in jax.tree.leaves(out)]
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
        _ = [float(jnp.sum(jnp.ravel(x)[:1])) for x in jax.tree.leaves(out)[:1]]
    return (time.perf_counter() - t0) / REPEATS * 1e3  # ms


import jax  # noqa: E402


def main():
    import jax.numpy as jnp

    import icp_tpu as icp
    from icp_tpu.methods.trimmed import stable_ranks, trim_weights
    from icp_tpu.ops.nn import nearest_neighbors
    from icp_tpu.ops.rigid_fit import fit_rigid, fit_rigid_indexed

    print(f"backend: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-5, 5, (B, N, 2)), dtype=jnp.float32)
    b = jnp.asarray(rng.uniform(-5, 5, (B, M, 2)), dtype=jnp.float32)
    bmask = jnp.ones((B, M), dtype=bool)
    count = jnp.full((B,), N, dtype=jnp.int32)
    smask = jnp.ones((B, N), dtype=bool)

    results = {}

    f_nn = jax.jit(lambda a, b, m: nearest_neighbors(a, b, m))
    results["nn_distance_argmin_ms"] = timed(f_nn, a, b, bmask)
    print("nn:", results["nn_distance_argmin_ms"], file=sys.stderr, flush=True)

    sq, idx = f_nn(a, b, bmask)
    sq = jnp.where(smask, sq, jnp.inf)

    f_rank = jax.jit(stable_ranks)
    results["stable_ranks_ms"] = timed(f_rank, sq)
    print("rank:", results["stable_ranks_ms"], file=sys.stderr, flush=True)

    f_tw = jax.jit(lambda s, c: trim_weights(s, c, 0.9, jnp.float32))
    results["trim_weights_ms"] = timed(f_tw, sq, count)
    print("trim:", results["trim_weights_ms"], file=sys.stderr, flush=True)

    w = f_tw(sq, count)

    f_fit = jax.jit(lambda a, b, i, w: fit_rigid_indexed(a, b, i, w))
    results["fit_rigid_indexed_onehot_ms"] = timed(f_fit, a, b, idx, w)
    print("fit:", results["fit_rigid_indexed_onehot_ms"], file=sys.stderr, flush=True)

    # gather-based fit (take_along_axis + centered sums)
    def fit_take(a, bp, i, w):
        matched = jnp.take_along_axis(bp, i[..., None], axis=-2)
        return fit_rigid(a, matched, w)

    f_fit_take = jax.jit(fit_take)
    results["fit_rigid_take_ms"] = timed(f_fit_take, a, b, idx, w)
    print("fit_take:", results["fit_rigid_take_ms"], file=sys.stderr, flush=True)

    # full iterate (init must run under jit: eager mode would materialize the
    # (B, N, M, D) broadcast-difference tensor in HBM — 8 GB at these shapes,
    # which ResourceExhausted the chip on the first run of this script)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    src = icp.cloud.PointCloud(a, count)
    tgt = icp.cloud.PointCloud(b, jnp.full((B,), M, dtype=jnp.int32))
    state0 = jax.jit(method.init)(src, tgt, icp.identity(2, (B,)))
    f_it = jax.jit(method.iterate)
    results["full_iterate_ms"] = timed(f_it, state0)
    print("iterate:", results["full_iterate_ms"], file=sys.stderr, flush=True)

    # standalone pallas NN (vmapped), for the record
    try:
        from icp_tpu.ops.pallas_nn import nearest_neighbors_pallas

        f_pnn = jax.jit(jax.vmap(lambda q, t: nearest_neighbors_pallas(q, t)))
        results["pallas_nn_ms"] = timed(f_pnn, a, b)
        print("pallas_nn:", results["pallas_nn_ms"], file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        results["pallas_nn_error"] = str(e)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
