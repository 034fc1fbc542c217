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
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(
    r"(f64|f32|bf16|f16|f8e4m3fn|f8e5m2|s64|u64|s32|u32"
    r"|s16|u16|s8|u8|pred|c64|c128)\[([\d,]*)\]"
)


def _shape_bytes(text: str) -> int:
    """Total bytes of every typed shape in an HLO result-type string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> dict:
    """Static collective census of optimized HLO, split per-call vs
    per-loop-iteration.

    Parses computation blocks, records every collective op's result bytes,
    then attributes ops in computations referenced as a ``while`` body (or
    reachable from one via ``to_apply``/branch calls) to the per-iteration
    bucket.  Result bytes are the standard proxy for data moved per
    collective per device (all-gather output = the gathered tensor;
    collective-permute output = the shard received).
    """
    comps: dict[str, list[tuple[str, int]]] = {}
    calls: dict[str, set[str]] = {}
    bodies: set[str] = set()
    cur = None
    for raw in hlo_text.splitlines():
        s = raw.strip()
        if not s:
            continue
        # Computation header: "[ENTRY ]%name (params...) -> ... {" — params
        # may nest parens (tuple types), so key off "no assignment".
        m = re.match(r"^(?:ENTRY\s+)?%([\w.\-]+)\s*\(", s)
        if m and " = " not in s:
            cur = m.group(1)
            comps.setdefault(cur, [])
            calls.setdefault(cur, set())
            continue
        if cur is None:
            continue
        for op in _COLLECTIVES:
            marker = f" {op}("
            if " = " in s and marker in s:
                result_type = s.split(" = ", 1)[1].split(marker, 1)[0]
                comps[cur].append((op, _shape_bytes(result_type)))
                break
        for key in ("body", "condition", "to_apply"):
            for ref in re.findall(rf"{key}=%([\w.\-]+)", s):
                calls[cur].add(ref)
                if key == "body":
                    bodies.add(ref)
        for ref in re.findall(r"branch_computations=\{([^}]*)\}", s):
            for name in re.findall(r"%([\w.\-]+)", ref):
                calls[cur].add(name)
    # Transitively mark computations reachable from a while body.
    in_loop = set()
    frontier = list(bodies)
    while frontier:
        c = frontier.pop()
        if c in in_loop:
            continue
        in_loop.add(c)
        frontier.extend(calls.get(c, ()))
    per_call: dict[str, int] = {}
    per_iter: dict[str, int] = {}
    for comp, ops in comps.items():
        bucket = per_iter if comp in in_loop else per_call
        for op, nbytes in ops:
            bucket[op] = bucket.get(op, 0) + nbytes
    return {
        "per_call_bytes": per_call,
        "per_iteration_bytes": per_iter,
        "per_call_total": sum(per_call.values()),
        "per_iteration_total": sum(per_iter.values()),
    }


def run_comm_analysis(args):
    """--comm mode: compile every sharded path on the virtual mesh and
    report collective bytes + a predicted efficiency curve (BASELINE.md
    'Scaling prediction')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import icp_tpu as icp
    from icp_tpu import pose_graph
    from icp_tpu.parallel import make_mesh, make_sharded_converge_fn, shard_batch
    from icp_tpu.parallel.ring_nn import ring_nearest_neighbors

    n_dev = len(jax.devices())
    d = min(8, n_dev)
    rng = np.random.default_rng(0)
    batch = args.batch if args.batch else 32 * d
    cap = args.capacity
    want = set(args.paths.split(",")) if args.paths else None

    def wanted(name):
        return want is None or name in want
    a_pts = rng.uniform(-30, 30, (batch, cap, 2)).astype(np.float32)
    b_pts = rng.uniform(-30, 30, (batch, cap, 2)).astype(np.float32)
    a = icp.PointCloud(jnp.asarray(a_pts), jnp.full((batch,), cap - 10, jnp.int32))
    b = icp.PointCloud(jnp.asarray(b_pts), jnp.full((batch,), cap - 5, jnp.int32))
    guess = icp.identity(2, (batch,), dtype=np.float32)
    method = icp.from_method("trimmed", 2)
    cfg = icp.DriverConfig(min_iterations=8, max_iterations=8)

    out = []

    def analyze(name, compiled, note):
        stats = collective_stats(compiled.as_text())
        rec = {"path": name, **stats, "note": note}
        out.append(rec)
        print(json.dumps(rec))

    if wanted("dp_converge"):
        # 1. Pure data parallel: expect ZERO collectives inside the iterate loop.
        mesh = make_mesh(data=d, points=1, devices=np.asarray(jax.devices()[:d]))
        fn = make_sharded_converge_fn(method, cfg, mesh, shard_points=False)
        src, tgt, g = shard_batch((a, b, guess), mesh)
        analyze(
            "dp_converge",
            jax.jit(fn).lower(src, tgt, g).compile(),
            f"B={batch} sharded over data={d}; per-iteration bytes should be 0",
        )

    mesh_sp = make_mesh(data=1, points=d, devices=np.asarray(jax.devices()[:d]))

    if wanted("sp_converge"):
        # 2. GSPMD sequence parallel: points axis sharded, psum-combined.
        fn_sp = make_sharded_converge_fn(method, cfg, mesh_sp, shard_points=True)
        src_sp, tgt_sp, g_sp = shard_batch((a, b, guess), mesh_sp, shard_points=True)
        analyze(
            "sp_converge",
            jax.jit(fn_sp).lower(src_sp, tgt_sp, g_sp).compile(),
            f"B={batch} cap={cap} points sharded {d}-way (argmin-combine + "
            "rigid-solve psums per iteration)",
        )

    if wanted("ring_nn"):
        # 3. Ring NN (both clouds sharded; collective-permute per rotation).
        n_pts = 4096
        q = jnp.asarray(rng.uniform(-1, 1, (n_pts, 2)).astype(np.float32))
        t = jnp.asarray(rng.uniform(-1, 1, (n_pts, 2)).astype(np.float32))
        mask = jnp.ones((n_pts,), dtype=bool)
        ring = jax.jit(lambda q_, t_, m_: ring_nearest_neighbors(q_, t_, m_, mesh_sp))
        analyze(
            "ring_nn",
            ring.lower(q, t, mask).compile(),
            f"N=M={n_pts} both sharded {d}-way; permute bytes/rotation = M/P*D*4",
        )

    if wanted("pose_graph_pcg"):
        # 4. Pose-graph PCG (edges sharded; segment_sum psums per matvec).
        t_nodes, n_loops = 1024, 256
        twists = rng.uniform(-0.3, 0.3, (t_nodes - 1, 3))
        from icp_tpu import geometry, lie

        gt = [icp.identity(2, dtype=np.float32)]
        for k in range(t_nodes - 1):
            gt.append(
                geometry.compose(gt[-1], lie.se2_exp(jnp.asarray(twists[k], dtype=jnp.float32)))
            )
        poses0 = icp.RigidTransform(
            jnp.stack([p.rotation for p in gt]), jnp.stack([p.translation for p in gt])
        )
        meas = lie.se2_exp(jnp.asarray(twists, dtype=jnp.float32))
        li = rng.integers(0, t_nodes - 1, n_loops)
        lj = np.minimum(li + rng.integers(2, t_nodes, n_loops), t_nodes - 1)
        rels = geometry.compose(
            geometry.inverse(
                icp.RigidTransform(poses0.rotation[li], poses0.translation[li])
            ),
            icp.RigidTransform(poses0.rotation[lj], poses0.translation[lj]),
        )
        graph = pose_graph.graph_from_trajectory(
            poses0, meas, loop_edges=jnp.asarray(np.stack([li, lj], -1), jnp.int32),
            loop_measurements=rels,
        )
        graph_sh = pose_graph.shard_over_edges(graph, mesh_sp, axis="points")
        solve = jax.jit(
            lambda g_: pose_graph.optimize(g_, iterations=4, solver="pcg", cg_iterations=16)
        )
        analyze(
            "pose_graph_pcg",
            solve.lower(graph_sh).compile(),
            f"T={t_nodes} E~{t_nodes - 1 + n_loops} edges sharded {d}-way; "
            "psum(T*dof) per CG matvec",
        )

    # Predicted efficiency: eff(P) = t_comp / (t_comp + bytes/BW), with the
    # per-iteration collective bytes scaled by the mesh-size model of each
    # path and the single-chip iterate time measured in bench_results.json.
    comp_ms = args.compute_ms
    bw = args.ici_gbps * 1e9
    sp = next((r for r in out if r["path"] == "sp_converge"), None)
    if sp is None:
        return out
    print("\npredicted efficiency vs mesh size "
          f"(compute {comp_ms} ms/iter, ICI {args.ici_gbps} GB/s):")
    for p in (2, 4, 8, 16, 32):
        # SP per-iteration bytes measured at d devices; the combine volume
        # per device is ~independent of P (B*dof-sized partials), compute
        # shrinks as 1/P.
        t_comp = comp_ms / 1e3 / p * d
        t_comm = sp["per_iteration_total"] / bw
        eff = t_comp / (t_comp + t_comm)
        print(json.dumps({"devices": p, "path": "sp_converge",
                          "predicted_efficiency": round(eff, 4)}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, help="force N virtual CPU devices")
    ap.add_argument("--batch-per-device", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=None,
                    help="--comm: total batch for the converge paths "
                    "(default 32 per device; big-cloud cells want small B)")
    ap.add_argument("--paths", default=None,
                    help="--comm: comma filter of census paths (dp_converge,"
                    "sp_converge,ring_nn,pose_graph_pcg)")
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument(
        "--comm", action="store_true",
        help="communication-volume analysis: compile each sharded path and "
        "report collective bytes from the optimized HLO + a predicted "
        "efficiency curve (no timing; runs fine on the virtual CPU mesh)",
    )
    ap.add_argument("--ici-gbps", type=float, default=90.0,
                    help="assumed per-link ICI bandwidth for the prediction")
    ap.add_argument("--compute-ms", type=float, default=3.8,
                    help="measured single-chip iterate ms (bench_results.json "
                    "roofline row) used in the prediction")
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

    if args.comm:
        run_comm_analysis(args)
        return
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
