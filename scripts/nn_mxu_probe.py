"""On-chip probe: MXU matmul-expansion NN vs the direct VPU distance NN.

``argmin_m ||a_n - b_m||^2 = argmin_m (||b_m||^2 - 2 a_n . b_m)`` — the
per-row ``||a_n||^2`` constant cannot change the argmin, so the O(N*M*D)
work can ride the MXU as a (N, D)@(D, M) cross-term matmul, leaving only an
O(N*M) add + variadic min/argmin on the VPU.  ``ops/nn.py`` rejected this on
paper (K=D=2 underutilizes the MXU; cancellation); this script measures it:

* runtime of the direct path vs the expansion at each matmul precision
  (DEFAULT = bf16 1-pass, HIGH = bf16 3-pass, HIGHEST = f32 6-pass),
* argmin agreement vs the direct path (count + the true squared-distance
  regret of every disagreement — near-ties have regret ~0),
* the cost of recovering exact squared distances for the winners
  (gather winner, exact subtract-square on O(N) points).

Shapes: (B, N, M) = (1024, 1024, 1024) f32 (the bench iterate shape).
Run on TPU: ``python scripts/nn_mxu_probe.py`` (background; slow compiles).
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

    from icp_tpu.ops.nn import nearest_neighbors

    print(f"backend: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(-5, 5, (B, N, 2)), dtype=jnp.float32)
    b = jnp.asarray(rng.uniform(-5, 5, (B, M, 2)), dtype=jnp.float32)

    results = {}

    f_direct = jax.jit(lambda a, b: nearest_neighbors(a, b, None))
    results["direct_ms"] = timed(f_direct, a, b)
    print("direct:", results["direct_ms"], file=sys.stderr, flush=True)
    sq_ref, idx_ref = f_direct(a, b)

    def expand(a, b, precision):
        nb2 = jnp.sum(b * b, axis=-1)  # (B, M)
        s = jnp.einsum("bnd,bmd->bnm", a, b, precision=precision)
        score = nb2[:, None, :] - 2.0 * s
        idx = jnp.argmin(score, axis=-1).astype(jnp.int32)
        na2 = jnp.sum(a * a, axis=-1)
        sq = jnp.min(score, axis=-1) + na2
        return sq, idx

    for name, prec in [
        ("default", jax.lax.Precision.DEFAULT),
        ("high", jax.lax.Precision.HIGH),
        ("highest", jax.lax.Precision.HIGHEST),
    ]:
        f = jax.jit(lambda a, b, p=prec: expand(a, b, p))
        results[f"expand_{name}_ms"] = timed(f, a, b)
        sq_e, idx_e = f(a, b)
        mism = idx_e != idx_ref
        n_mismatch = int(jnp.sum(mism))
        results[f"expand_{name}_mismatch_frac"] = n_mismatch / (B * N)
        # regret: true squared distance at the expansion's pick minus the
        # true minimum — how much worse the wrong winner actually is.
        picked = jnp.take_along_axis(b, idx_e[..., None], axis=-2)
        true_sq_at_pick = jnp.sum((a - picked) ** 2, axis=-1)
        regret = jnp.where(mism, true_sq_at_pick - sq_ref, 0.0)
        results[f"expand_{name}_max_regret"] = float(jnp.max(regret))
        results[f"expand_{name}_max_sq_err"] = float(
            jnp.max(jnp.abs(sq_e - true_sq_at_pick))
        )
        print(
            f"expand_{name}: {results[f'expand_{name}_ms']:.3f} ms, "
            f"mismatch {n_mismatch}/{B*N}, "
            f"max_regret {results[f'expand_{name}_max_regret']:.3e}",
            file=sys.stderr,
            flush=True,
        )

    # exact-sq recovery variant: argmin from the expansion (HIGHEST), winner
    # distances recomputed exactly — removes the cancellation worry for the
    # cost/trim values at O(N) extra work.
    def expand_exact_sq(a, b):
        nb2 = jnp.sum(b * b, axis=-1)
        s = jnp.einsum("bnd,bmd->bnm", a, b, precision=jax.lax.Precision.HIGHEST)
        score = nb2[:, None, :] - 2.0 * s
        idx = jnp.argmin(score, axis=-1).astype(jnp.int32)
        picked = jnp.take_along_axis(b, idx[..., None], axis=-2)
        sq = jnp.sum((a - picked) ** 2, axis=-1)
        return sq, idx

    f_ex = jax.jit(expand_exact_sq)
    results["expand_highest_exact_sq_ms"] = timed(f_ex, a, b)
    print(
        "expand_highest_exact_sq:", results["expand_highest_exact_sq_ms"],
        file=sys.stderr, flush=True,
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
