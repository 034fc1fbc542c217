"""Cold/warm compile-time probe for the batched converge (ROADMAP #4).

Measures, on the current backend:

1. trace time (jit lower) vs backend compile time for the bench converge,
2. whether the persistent compilation cache produces cross-process warm
   starts (run this script twice; the second run reports the warm number),
3. whether PJRT executable serialization round-trips
   (``jax.experimental.serialize_executable``) — the AOT path that skips
   the remote compile service entirely.

Usage::

    python scripts/compile_time_probe.py [--batch 256] [--tag cold]

Prints one JSON line with the timings.  Round-1 context: first compile of
the B=1024 converge takes 5-8 minutes over the TPU tunnel; local CPU
traces+compiles the same program in ~0.4 s, so the service is the
bottleneck and caching/serialization is the only lever.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--tag", default="run")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--serialize", action="store_true", help="probe executable serialization")
    ap.add_argument(
        "--aot",
        action="store_true",
        help="use icp_tpu.aot.cached_jit (cross-process AOT cache); run twice — "
        "the second process should report aot_hits=1 and a sub-second start",
    )
    args = ap.parse_args()

    import jax

    # sitecustomize pins the axon platform; honor an explicit CPU request.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if not args.no_cache:
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_explain_cache_misses", True)

    import jax.numpy as jnp
    import numpy as np

    import icp_tpu as icp

    out = {"tag": args.tag, "backend": jax.default_backend(), "batch": args.batch}

    rng = np.random.default_rng(0)
    a_pts = rng.uniform(-10, 10, (args.batch, args.capacity, 2)).astype(np.float32)
    a = icp.PointCloud(
        jnp.asarray(a_pts), jnp.full((args.batch,), args.capacity, dtype=jnp.int32)
    )
    b = icp.PointCloud(
        jnp.asarray(a_pts + 0.1), jnp.full((args.batch,), args.capacity, dtype=jnp.int32)
    )
    guess = icp.identity(2, (args.batch,), dtype=jnp.float32)

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )

    if args.aot:
        from icp_tpu import aot

        cached = aot.cached_jit(
            lambda s, t, g: icp.converge(method, s, t, g, cfg),
            directory=os.path.join(REPO, ".aot_cache"),
        )
        t0 = time.perf_counter()
        result, _ = cached(a, b, guess)
        float(jnp.sum(result.cost))
        out["aot_total_first_run_s"] = round(time.perf_counter() - t0, 3)
        out["aot_hits"] = cached.cache.hits
        out["aot_misses"] = cached.cache.misses
        out["aot_errors"] = cached.cache.errors
        print(json.dumps(out))
        return

    fn = jax.jit(lambda s, t, g: icp.converge(method, s, t, g, cfg))

    t0 = time.perf_counter()
    lowered = fn.lower(a, b, guess)
    out["trace_lower_s"] = round(time.perf_counter() - t0, 3)
    print(f"[probe] lowered in {out['trace_lower_s']}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    out["compile_s"] = round(time.perf_counter() - t0, 3)
    print(f"[probe] compiled in {out['compile_s']}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    result, _ = compiled(a, b, guess)
    float(jnp.sum(result.cost))
    out["first_run_s"] = round(time.perf_counter() - t0, 3)

    if args.serialize:
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
                serialize,
            )

            t0 = time.perf_counter()
            payload, in_tree, out_tree = serialize(compiled)
            out["serialize_s"] = round(time.perf_counter() - t0, 3)
            out["serialized_bytes"] = len(payload)
            t0 = time.perf_counter()
            reloaded = deserialize_and_load(payload, in_tree, out_tree)
            out["deserialize_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            r2, _ = reloaded(a, b, guess)
            float(jnp.sum(r2.cost))
            out["reloaded_run_s"] = round(time.perf_counter() - t0, 3)
            out["reloaded_matches"] = bool(
                jnp.all(r2.transform.translation == result.transform.translation)
            )
        except Exception as e:  # noqa: BLE001 - probe must report, not die
            out["serialize_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
