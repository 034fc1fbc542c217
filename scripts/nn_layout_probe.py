"""On-chip probe for the layout-optimized fused NN kernel (VERDICT #1).

Compares, at the bench shape (B, N, M) = (1024, 1024, 1024) f32:

* ``jnp``        — the current default (ops/nn.py, XLA variadic reduce)
* ``two_stage``  — XLA-only: per-lane block min then exact cross-lane fold
* ``fused``      — ops/fused_nn.py kernel (sq, idx)
* ``fused_c``    — same kernel carrying matched coordinates
* ``iter_cur``   — full trimmed iterate, current default path
* ``iter_fused`` — full trimmed iterate with fused NN + no-gather fit

plus exactness checks of every variant against ``jnp`` (bit-equal sq, equal
idx) on the chip itself.  Run: ``python scripts/nn_layout_probe.py``
(backgrounded, generous timeout; remote compiles).
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


def two_stage_nn(query, targets, target_mask):
    """XLA-only analogue of the kernel's reduction structure."""
    import jax.numpy as jnp

    from icp_tpu.ops.nn import pairwise_sq_dists

    d2 = pairwise_sq_dists(query, targets)  # (..., N, M)
    if target_mask is not None:
        d2 = jnp.where(target_mask[..., None, :], d2, jnp.inf)
    *lead, n, m = d2.shape
    g = m // 128
    blk = d2.reshape(*lead, n, g, 128)
    lane_min = jnp.min(blk, axis=-2)  # (..., N, 128)
    lane_arg = jnp.argmin(blk, axis=-2).astype(jnp.int32)  # block of the min
    lanes = jnp.arange(128, dtype=jnp.int32)
    lane_idx = lane_arg * 128 + lanes  # global index per lane
    min_val = jnp.min(lane_min, axis=-1)
    big = jnp.iinfo(jnp.int32).max
    tied = jnp.where(lane_min == min_val[..., None], lane_idx, big)
    idx = jnp.min(tied, axis=-1)
    return min_val, idx


def main():
    import jax
    import jax.numpy as jnp

    import icp_tpu as icp
    from icp_tpu.methods.trimmed import trim_weights
    from icp_tpu.ops.fused_nn import fused_nearest_neighbors
    from icp_tpu.ops.nn import nearest_neighbors
    from icp_tpu.ops.rigid_fit import fit_rigid

    print(f"backend: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-5, 5, (B, N, 2)), dtype=jnp.float32)
    b = jnp.asarray(rng.uniform(-5, 5, (B, M, 2)), dtype=jnp.float32)
    bmask = jnp.ones((B, M), dtype=bool)
    count = jnp.full((B,), N, dtype=jnp.int32)

    results = {}

    f_jnp = jax.jit(lambda a, b, m: nearest_neighbors(a, b, m))
    results["jnp_ms"] = timed(f_jnp, a, b, bmask)
    print("jnp:", results["jnp_ms"], file=sys.stderr, flush=True)
    sq_ref, idx_ref = jax.tree.map(np.asarray, f_jnp(a, b, bmask))

    f_two = jax.jit(lambda a, b, m: two_stage_nn(a, b, m))
    results["two_stage_ms"] = timed(f_two, a, b, bmask)
    sq2, idx2 = jax.tree.map(np.asarray, f_two(a, b, bmask))
    results["two_stage_exact"] = bool((sq2 == sq_ref).all() and (idx2 == idx_ref).all())
    print("two_stage:", results["two_stage_ms"], results["two_stage_exact"],
          file=sys.stderr, flush=True)

    f_fused = jax.jit(
        jax.vmap(lambda q, t, m: fused_nearest_neighbors(q, t, m))
    )
    results["fused_ms"] = timed(f_fused, a, b, bmask)
    sqf, idxf = jax.tree.map(np.asarray, f_fused(a, b, bmask))
    results["fused_exact"] = bool((sqf == sq_ref).all() and (idxf == idx_ref).all())
    print("fused:", results["fused_ms"], results["fused_exact"],
          file=sys.stderr, flush=True)

    f_fused_c = jax.jit(
        jax.vmap(lambda q, t, m: fused_nearest_neighbors(q, t, m, return_coords=True))
    )
    results["fused_coords_ms"] = timed(f_fused_c, a, b, bmask)
    sqc, idxc, coords = jax.tree.map(np.asarray, f_fused_c(a, b, bmask))
    gathered = np.take_along_axis(np.asarray(b), idx_ref[..., None], axis=-2)
    results["fused_coords_exact"] = bool(
        (sqc == sq_ref).all() and (idxc == idx_ref).all() and (coords == gathered).all()
    )
    print("fused_coords:", results["fused_coords_ms"], results["fused_coords_exact"],
          file=sys.stderr, flush=True)

    # -- full iterate comparison ------------------------------------------
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    src = icp.cloud.PointCloud(a, count)
    tgt = icp.cloud.PointCloud(b, jnp.full((B,), M, dtype=jnp.int32))
    state0 = jax.jit(method.init)(src, tgt, icp.identity(2, (B,)))
    f_it = jax.jit(method.iterate)
    results["iter_current_ms"] = timed(f_it, state0)
    print("iter_cur:", results["iter_current_ms"], file=sys.stderr, flush=True)

    def fused_iterate(state):
        src, tgt = state.source, state.target
        a_cur = icp.geometry.apply(state.transform, src.points)
        sq, idx, coords = jax.vmap(
            lambda q, t, m: fused_nearest_neighbors(q, t, m, return_coords=True)
        )(a_cur, tgt.points, tgt.mask)
        sq = jnp.where(src.mask, sq, jnp.inf)
        w = trim_weights(sq, src.count, 0.9, src.dtype)
        step = fit_rigid(a_cur, coords, w)
        return state.__class__(
            icp.geometry.compose(step, state.transform), src, tgt, idx, sq
        )

    f_itf = jax.jit(fused_iterate)
    results["iter_fused_ms"] = timed(f_itf, state0)
    s_cur = f_it(state0)
    s_fused = f_itf(state0)
    results["iter_fused_idx_exact"] = bool(
        (np.asarray(s_cur.match_idx) == np.asarray(s_fused.match_idx)).all()
        and (np.asarray(s_cur.match_cost) == np.asarray(s_fused.match_cost)).all()
    )
    dt = np.abs(
        np.asarray(s_cur.transform.translation) - np.asarray(s_fused.transform.translation)
    ).max()
    results["iter_fused_translation_maxdiff"] = float(dt)
    print("iter_fused:", results["iter_fused_ms"], results["iter_fused_idx_exact"], dt,
          file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
