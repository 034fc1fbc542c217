"""Command-line interface.

Replaces the reference's two executables with one CLI:

* ``view``     — the SDL GUI driver (``vis/main.cpp:75-153``) as an offline
                 frame renderer (TPU hosts are headless); same flags
                 (``-S/-D`` scans, ``-m`` method, ``--basic-mode``, ``-l``).
* ``register`` — one-shot registration (2D CSV scans or 3D PLY clouds) with
                 driver knobs; the ``test_ply`` pipeline
                 (``tests/test_ply.cpp:89-131``) is ``register --ply``.
* ``bench``    — the benchmark harness (``bench/bench.cpp:108-142``): every
                 registered 2D method x scans 1-3, 10 invocations each,
                 same statistics; plus ``--batch`` for batched-throughput
                 mode (net-new).
* ``methods``  — list the registry (printed by the reference on an unknown
                 method, ``vis/main.cpp:133-139``).
* ``odometry`` — batch or ``--online`` trajectory estimation with loop
                 closure + robust pose-graph refinement (net-new).
* ``graph``    — standalone g2o pose-graph optimizer (net-new; the
                 framework's analogue of the ``g2o`` binary).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _parse_config(pairs) -> "Config":
    from .config import Config

    params = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"error: config entry {pair!r} is not key=value")
        key, value = pair.split("=", 1)
        try:
            params[key] = int(value)
        except ValueError:
            try:
                params[key] = float(value)
            except ValueError:
                params[key] = value
        # Method string params (e.g. solver=quat) stay strings.
    return Config(params)


def _make_method(name: str, dim: int, config):
    from .methods import from_method, registered_methods

    try:
        return from_method(name, dim, config)
    except KeyError:
        print(f"error: unknown ICP method '{name}'. expected one of:", file=sys.stderr)
        for m in registered_methods(dim):
            print(f"* {m}", file=sys.stderr)
        raise SystemExit(1)


def _driver_config(args):
    from .driver import DriverConfig

    return DriverConfig(
        max_iterations=args.max_iterations,
        angle_tolerance=np.deg2rad(args.angle_tolerance_deg)
        if args.angle_tolerance_deg is not None
        else None,
        translation_tolerance=args.translation_tolerance,
        stop_cost=args.stop_cost,
        absolute_cost_tolerance=args.absolute_cost_tolerance,
        relative_cost_tolerance=args.relative_cost_tolerance,
    )


def _add_driver_flags(p):
    p.add_argument("--max-iterations", type=int, default=100)
    p.add_argument(
        "--angle-tolerance-deg", type=float, default=0.1,
        help="angle tolerance in degrees (with --translation-tolerance)",
    )
    p.add_argument("--translation-tolerance", type=float, default=0.1)
    p.add_argument("--stop-cost", type=float, default=None)
    p.add_argument("--absolute-cost-tolerance", type=float, default=None)
    p.add_argument("--relative-cost-tolerance", type=float, default=None)


def _load_scan(path: str, capacity=None):
    """Load a 2D scan by extension: ``.conf`` polar sweep, else CSV."""
    import icp_tpu as icp

    if path.endswith(".conf"):
        from .io import parse_sweep

        return parse_sweep(path, capacity=capacity)
    return icp.parse_lidar_scan(path, capacity=capacity)


def cmd_register(args):
    import icp_tpu as icp

    config = _parse_config(args.config)
    # Power-of-two capacity buckets by default: different-size inputs land
    # on a handful of compiled programs (one remote-TPU compile costs
    # minutes; results are capacity-invariant by the masking contract).
    cap = None if args.exact_capacity else "bucket"
    if args.ply:
        source = icp.from_points(icp.read_ply(args.src), capacity=cap, dtype=np.float32)
        target = icp.from_points(icp.read_ply(args.dst), capacity=cap, dtype=np.float32)
        dim = 3
    else:
        source = _load_scan(args.src, capacity=cap)
        target = _load_scan(args.dst, capacity=cap)
        dim = 2
    if args.sor:
        from .ops.filters import remove_statistical_outliers

        source = remove_statistical_outliers(source)
        target = remove_statistical_outliers(target)
    method = _make_method(args.method, dim, config)
    cfg = _driver_config(args)

    guess = icp.identity(dim)
    if args.coarse:
        from .ops.coarse import coarse_align_2d, coarse_align_3d

        guess = (coarse_align_2d if dim == 2 else coarse_align_3d)(source, target)

    t0 = time.perf_counter()
    if args.multiscale:
        from .multiscale import converge_multiscale

        def converge_fn(s, t, g):
            return converge_multiscale(
                method, s, t, g, cfg, factors=(4,), coarse_max_iterations=30
            )

    else:

        def converge_fn(s, t, g):
            return icp.converge(method, s, t, g, cfg)

    if args.aot_cache is not None:
        # Composes with --multiscale: the whole (possibly pyramid) program
        # is one traced function, so it AOT-caches like any other.
        from . import aot

        converge_fn = aot.cached_jit(converge_fn, directory=args.aot_cache or None)
    result, _ = converge_fn(source, target, guess)
    rotation = np.asarray(result.transform.rotation)
    dt = time.perf_counter() - t0

    out = {
        "method": args.method,
        "iterations": int(result.iteration_count),
        "cost": float(result.cost),
        "rotation": rotation.tolist(),
        "translation": np.asarray(result.transform.translation).tolist(),
        "seconds": round(dt, 4),
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(f"converged in {out['iterations']} iterations, cost {out['cost']:.6f}")
        print("rotation:")
        for row in out["rotation"]:
            print("  " + "  ".join(f"{v: .8f}" for v in row))
        print("translation: " + "  ".join(f"{v: .8f}" for v in out["translation"]))
    if args.out_ply:
        from . import geometry
        from .io import write_ply

        moved = np.asarray(geometry.apply(result.transform, source.points))[
            : int(source.count)
        ]
        if moved.shape[1] == 2:  # PLY vertices are xyz; pad z = 0 for 2D scans
            moved = np.column_stack([moved, np.zeros(len(moved), dtype=moved.dtype)])
        write_ply(args.out_ply, moved)
        print(f"wrote {args.out_ply}")


def _parse_view_conf(path: str) -> dict:
    """Parse the reference's display conf (``view.conf:1-7``: window_width/
    height, x/y_displace, view_scale as ``key = value`` lines)."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            try:
                out[key.strip()] = float(value.strip())
            except ValueError:
                pass
    return out


def cmd_view(args):
    import icp_tpu as icp
    from .vis import render_registration

    view_conf = _parse_view_conf(args.view_conf) if args.view_conf else {}
    config = _parse_config(args.config)
    source = _load_scan(args.src)
    target = _load_scan(args.dst)
    method = _make_method(args.method, 2, config)

    def log(dump):
        if args.log:
            print(
                f"iteration={dump.iteration} cost={dump.cost:.6f} "
                f"t={dump.translation.tolist()}"
            )

    dumps = render_registration(
        method,
        source,
        target,
        icp.identity(2),
        out_dir=args.out,
        iterations=args.iterations,
        every=args.every,
        light_mode=args.basic_mode,
        log=log,
        view_conf=view_conf,
    )
    print(f"wrote {len(range(0, args.iterations + 1, args.every))} frames to {args.out}")
    print(f"final cost {dumps[-1].cost:.6f}")
    if args.animate:
        from .vis import assemble_animation

        out = assemble_animation(args.out, args.animate, dumps, fps=args.fps)
        print(f"wrote animation {out}")


def cmd_bench(args):
    import icp_tpu as icp
    from .methods import registered_methods

    methods = args.methods or registered_methods(2)
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=np.deg2rad(0.1),
        translation_tolerance=0.01,
    )

    for name in methods:
        for scan_id in args.scans:
            src = icp.parse_lidar_scan(f"{args.data_dir}/scan{scan_id}/first.csv")
            dst = icp.parse_lidar_scan(f"{args.data_dir}/scan{scan_id}/second.csv")
            method = _make_method(name, 2, _parse_config(args.config))
            fn = icp.make_converge_fn(method, cfg)
            guess = icp.identity(2)

            # Warmup compile (excluded, as the reference excludes process start).
            import jax

            jax.block_until_ready(fn(src, dst, guess)[0].cost)

            costs, iters = [], []
            t0 = time.perf_counter()
            for _ in range(args.invocations):
                result, _ = fn(src, dst, guess)
                costs.append(float(result.cost))
                iters.append(int(result.iteration_count))
            dt = time.perf_counter() - t0

            batched_line = ""
            if args.batch:
                import jax.numpy as jnp
                import jax.tree as jtree

                bsz = args.batch
                ab = jtree.map(lambda x: jnp.broadcast_to(x, (bsz,) + x.shape), src)
                bb = jtree.map(lambda x: jnp.broadcast_to(x, (bsz,) + x.shape), dst)
                gb = icp.identity(2, (bsz,))
                rb, _ = fn(ab, bb, gb)
                float(jnp.sum(rb.cost))  # compile+materialize
                t0b = time.perf_counter()
                for _ in range(3):
                    rb, _ = fn(ab, bb, gb)
                    float(jnp.sum(rb.cost))
                dtb = time.perf_counter() - t0b
                batched_line = (
                    f"* Batched throughput ({bsz} pairs/invocation): "
                    f"{bsz * 3 / dtb:.1f} pairs/s"
                )

            costs_sorted, iters_sorted = sorted(costs), sorted(iters)
            print(f"ICP method: {name}, scan {scan_id}")
            print(f"* Number of invocations: {args.invocations}")
            print(f"* Min cost: {costs_sorted[0]:.6g}")
            print(f"* Max cost: {costs_sorted[-1]:.6g}")
            print(f"* Median cost: {costs_sorted[len(costs) // 2]:.6g}")
            print(f"* Mean cost: {np.mean(costs):.6g}")
            print(f"* Min iterations: {iters_sorted[0]}")
            print(f"* Max iterations: {iters_sorted[-1]}")
            print(f"* Median iterations: {iters_sorted[len(iters) // 2]}")
            print(f"* Mean iterations: {np.mean(iters):.4g}")
            print(f"* Average time per invocation: {dt / args.invocations:.6g}s")
            print(f"* Average time per iteration: {dt / max(sum(iters), 1):.6g}s")
            if batched_line:
                print(batched_line)


def _cli_capacity(cap: int, args) -> int:
    """Bucketed capacity unless --exact-capacity (see cloud.bucket_capacity:
    different-size sequences then share compiled programs / AOT entries)."""
    from .cloud import bucket_capacity

    return cap if getattr(args, "exact_capacity", False) else bucket_capacity(cap)


def _eval_against_tum(poses, gt_path: str, dim: int) -> None:
    """ATE (Umeyama-aligned) + RPE of ``poses`` against a TUM ground-truth
    file, as one JSON line on stdout (the `--eval` contract)."""
    from . import eval as _ev
    from .io.trajectory import read_tum

    _, gt = read_tum(gt_path, dim=dim)
    n_gt = np.asarray(gt.translation).shape[0]
    n_est = np.asarray(poses.translation).shape[0]
    if n_gt != n_est:
        raise SystemExit(
            f"--eval: ground truth has {n_gt} poses but the trajectory has "
            f"{n_est} (one TUM line per scan required)"
        )
    record = {"eval_against": gt_path}
    record.update(_ev.ate(poses, gt).as_dict())
    record.update(_ev.rpe(poses, gt).as_dict())
    print(json.dumps(record))


def cmd_odometry(args):
    import jax.numpy as jnp

    import icp_tpu as icp
    from . import odometry

    dim = 3 if args.ply else 2

    if args.ply:
        clouds = [
            icp.from_points(icp.read_ply(p), dtype=np.float32) for p in args.scans
        ]
        cap = _cli_capacity(max(c.capacity for c in clouds), args)
        clouds = [icp.pad_to(c, cap) for c in clouds]
        if not args.scan_to_map:
            scans = icp.stack(clouds)
    if args.scan_to_map:
        from . import mapping

        if args.method in ("trimmed", "vanilla", "feature_aware"):
            print(
                f"hint: method '{args.method}' is a hard-overlap method; the "
                "aggregated map always contains unobserved regions, so "
                "'robust' tracks scan-to-map far better (see docs/deployment.md)",
                file=sys.stderr,
            )
        for flag in ("optimize", "loop_radius", "coarse", "multiscale"):
            if getattr(args, flag):
                print(
                    f"warning: --{flag.replace('_', '-')} is not supported with "
                    "--scan-to-map and is ignored",
                    file=sys.stderr,
                )
        if not args.ply:
            clouds = [_load_scan(p) for p in args.scans]
            cap = _cli_capacity(max(c.capacity for c in clouds), args)
            clouds = [icp.pad_to(c, cap) for c in clouds]
        cfg = _driver_config(args)
        method = _make_method(args.method, dim, _parse_config(args.config))
        poses_list = []
        for t, (pose, is_kf, result) in enumerate(
            mapping.scan_to_map_odometry(
                clouds, method, cfg,
                voxel_size=args.voxel_size, map_capacity=args.map_capacity,
                device_map=args.device_map,
            )
        ):
            poses_list.append(pose)
            rec = {
                "scan": args.scans[t],
                "rotation": np.asarray(pose.rotation).tolist(),
                "translation": np.asarray(pose.translation).tolist(),
                "keyframe": bool(is_kf),
            }
            if result is not None:
                rec["iterations"] = int(result.iteration_count)
                rec["cost"] = float(result.cost)
            print(json.dumps(rec))
        import jax.numpy as _jnp

        poses = icp.RigidTransform(
            _jnp.stack([p.rotation for p in poses_list]),
            _jnp.stack([p.translation for p in poses_list]),
        )
        if args.render:
            from .vis import render_trajectory

            render_trajectory(args.render, poses, scans=icp.stack(clouds))
            print(f"wrote {args.render}", file=sys.stderr)
        if args.save:
            from .checkpoint import save_pytree

            save_pytree(args.save, {"rotation": poses.rotation, "translation": poses.translation})
            print(f"saved trajectory to {args.save}", file=sys.stderr)
        if args.eval:
            _eval_against_tum(poses, args.eval, dim)
        return

    if not args.ply:
        if all(not p.endswith(".conf") for p in args.scans):
            # Bulk path: the native threaded loader parses all CSVs in parallel.
            from .io import parse_lidar_scan_batch

            scans = parse_lidar_scan_batch(args.scans)
            scans = icp.pad_to(scans, _cli_capacity(scans.capacity, args))
        else:
            clouds = [_load_scan(p) for p in args.scans]
            cap = _cli_capacity(max(c.capacity for c in clouds), args)
            scans = icp.stack([icp.pad_to(c, cap) for c in clouds])
    method = _make_method(args.method, dim, _parse_config(args.config))
    cfg = _driver_config(args)

    if args.online:
        # Streaming mode: scan-by-scan OnlineSlam with periodic robust loop
        # closure and live re-anchoring (slam.OnlineSlam); one JSON record
        # per scan as it would arrive on a robot.
        from .slam import OnlineSlam

        if args.ply:
            stream_clouds = clouds
        else:
            stream_clouds = [
                icp.PointCloud(scans.points[t], scans.count[t])
                for t in range(scans.points.shape[0])
            ]
        online = OnlineSlam(
            method, cfg,
            translation_threshold=args.keyframe_translation,
            angle_threshold=args.keyframe_angle,
            loop_every=args.loop_every,
            loop_radius=args.loop_radius or 2.0,
            loop_detector="descriptor" if args.loop_descriptor else "radius",
            descriptor_range=args.loop_descriptor,
            descriptor_max_distance=args.descriptor_max_distance,
            loop_min_separation=args.loop_min_separation,
            loop_max_cost=args.loop_max_cost,
            loop_weight=args.loop_weight,
            odometry_weight=args.odometry_weight,
            robust=args.robust_kernel,
            robust_scale=args.robust_scale,
            scale_passes=args.scale_passes,
            mapping_threshold=args.mapping_threshold,
            closure_information=args.closure_information,
            pipelined=args.pipelined,
            aot_cache=getattr(args, "aot_cache", None),
            async_refine=args.async_refine,
        )
        live_poses = []

        def emit(u):
            t = len(live_poses)
            live_poses.append(u.pose)
            print(json.dumps({
                "scan": args.scans[t],
                "rotation": np.asarray(u.pose.rotation).tolist(),
                "translation": np.asarray(u.pose.translation).tolist(),
                "keyframe": bool(u.is_keyframe),
                "refined": bool(u.refined),
                "closures": int(u.num_closures),
            }))

        for scan in stream_clouds:
            u = online.add_scan(scan)
            # Pipelined updates arrive with one scan of latency (the first
            # dispatch returns None); each record still streams as soon as
            # its scan materializes.
            if u is not None:
                emit(u)
        if args.pipelined:
            u = online.flush()
            if u is not None:
                emit(u)
        flushed = online.finalize()
        kf = online.keyframe_poses
        print(
            f"online slam: {len(np.asarray(kf.translation))} keyframes, "
            f"{len(online._loop_edges)} closures"
            + (" (finalize ran a refinement)" if flushed else ""),
            file=sys.stderr,
        )
        w = online.closure_weights
        if w is not None and len(w):
            # The robust diagnostic (SlamResult.edge_weights' streaming
            # twin): rejected closures sit near 0, inliers near 1.
            print(
                f"closure robust weights: min {float(np.min(w)):.4g} "
                f"median {float(np.median(w)):.4g} "
                f"(kept >=0.5: {int((w >= 0.5).sum())}/{len(w)}; "
                f"scale {float(np.asarray(online._robust_scale_used)):.4g})",
                file=sys.stderr,
            )
        if args.save:
            from .checkpoint import save_pytree

            save_pytree(args.save, {"rotation": kf.rotation, "translation": kf.translation})
            print(f"saved keyframe trajectory to {args.save}", file=sys.stderr)
        if args.eval:
            # Evaluate the LIVE per-scan poses (what the robot acted on),
            # not the post-hoc keyframe graph — the online-latency contract.
            live = icp.RigidTransform(
                jnp.stack([p.rotation for p in live_poses]),
                jnp.stack([p.translation for p in live_poses]),
            )
            _eval_against_tum(live, args.eval, dim)
        return

    wrap = None
    if getattr(args, "aot_cache", None) is not None:
        # AOT-cache the whole batched registration; pair-count bucketing
        # makes different-length sequences land on the same executable
        # (worth the padded lanes only when a multi-minute compile is on
        # the line, so it is tied to the flag).
        from . import aot

        wrap = lambda f: aot.cached_jit(f, directory=args.aot_cache or None)  # noqa: E731
    traj = odometry.chain_scans(
        scans, method, cfg, coarse=args.coarse, multiscale=args.multiscale,
        wrap_converge=wrap, pad_pairs_to_bucket=wrap is not None,
    )
    loop_descriptor = getattr(args, "loop_descriptor", None)
    if args.optimize or args.loop_radius or loop_descriptor:
        from . import geometry as _geo
        from . import pose_graph

        loop_edges = loop_meas = None
        cands = guesses = None
        if loop_descriptor:
            from .ops.descriptor import (
                find_loop_candidates_descriptor,
                scan_context,
                yaw_seeds,
            )

            descs = scan_context(scans.points, scans.mask, max_radius=loop_descriptor)
            cands, yaw = find_loop_candidates_descriptor(
                descs, args.descriptor_max_distance,
                min_separation=args.loop_min_separation,
            )
            guesses = yaw_seeds(scans, cands, yaw)
        elif args.loop_radius:
            cands = pose_graph.find_loop_candidates(
                traj.poses, radius=args.loop_radius,
                min_separation=args.loop_min_separation,
            )
        if cands is not None and len(np.asarray(cands)):
            loop_edges, loop_meas, lc_costs = pose_graph.register_loop_closures(
                scans, traj.poses, cands, method, cfg,
                max_cost=args.loop_max_cost, coarse=args.loop_coarse,
                guesses=guesses,
            )
            print(
                f"loop closures: {len(np.asarray(loop_edges))} of "
                f"{len(np.asarray(cands))} candidates accepted "
                f"(costs {np.round(np.asarray(lc_costs), 4).tolist()})",
                file=sys.stderr,
            )
        loop_info = None
        if args.closure_information and loop_edges is not None:
            from .ops.covariance import cloud_information

            tgt_idx = np.asarray(loop_edges)[:, 0]
            tgt_scans = icp.PointCloud(
                scans.points[tgt_idx], scans.count[tgt_idx]
            )
            loop_info = cloud_information(tgt_scans)
        # Edge measurements are frame-t-relative poses of frame t+1 — the
        # INVERSE of the registration transform (see odometry.compose_chain).
        graph = pose_graph.graph_from_trajectory(
            traj.poses,
            _geo.inverse(traj.relative),
            loop_edges=loop_edges,
            loop_measurements=loop_meas,
            loop_weight=args.loop_weight,
            loop_information=loop_info,
        )
        # Robust kernels act on loop-closure edges only (see
        # pose_graph.optimize: a redescending kernel on odometry edges can
        # disconnect the chain).
        robust_mask = None
        robust_scale = args.robust_scale
        gn_iterations = args.gn_iterations
        if gn_iterations is None:
            gn_iterations = 10 if args.robust_kernel == "none" else 30
        n_loop = 0 if loop_edges is None else len(np.asarray(loop_edges))
        two_pass = (
            args.robust_kernel != "none"
            and n_loop > 0
            and args.scale_passes != 1
            and (args.scale_passes != "auto" or n_loop >= args.mapping_threshold)
        )
        if args.robust_kernel != "none" and loop_edges is not None:
            import jax.numpy as jnp

            robust_mask = jnp.arange(graph.num_edges) >= graph.num_edges - n_loop
            if not two_pass and isinstance(robust_scale, str):  # 'auto'
                robust_scale = pose_graph.auto_robust_scale(
                    graph, iterations=gn_iterations, robust_edges=robust_mask
                )
                print(f"robust scale (auto): {float(robust_scale):.4g}",
                      file=sys.stderr)
        if two_pass:
            # Mapping-scale regime: the validated two-pass welsch recipe
            # (run_slam's scale_passes='auto' semantics; BASELINE.md
            # round-4 protocol table).
            passes = 2 if args.scale_passes == "auto" else int(args.scale_passes)
            graph, costs, robust_scale, w = pose_graph.robust_solve(
                graph, robust_edges=robust_mask, iterations=gn_iterations,
                robust_scale=robust_scale, scale_passes=passes,
            )
            print(
                f"robust scale (two-pass welsch, {n_loop} closures): "
                f"{float(robust_scale):.4g}",
                file=sys.stderr,
            )
        else:
            graph, costs = pose_graph.optimize(
                graph, iterations=gn_iterations,
                robust=args.robust_kernel, robust_scale=robust_scale,
                robust_edges=robust_mask,
            )
        poses = graph.poses
        print(f"pose-graph cost: {float(costs[0]):.6g} -> {float(costs[-1]):.6g}",
              file=sys.stderr)
        if args.robust_kernel != "none" and loop_edges is not None:
            if not two_pass:
                w, _ = pose_graph.robust_edge_weights(
                    graph, args.robust_kernel, robust_scale,
                    robust_edges=robust_mask,
                )
            loop_w = np.asarray(w)[-len(np.asarray(loop_edges)):]
            print(
                "loop-closure robust weights: "
                f"{np.round(loop_w, 4).tolist()}",
                file=sys.stderr,
            )
    else:
        poses = traj.poses

    for t in range(len(args.scans)):
        rec = {
            "scan": args.scans[t],
            "rotation": np.asarray(poses.rotation[t]).tolist(),
            "translation": np.asarray(poses.translation[t]).tolist(),
        }
        if t > 0:
            rec["iterations"] = int(traj.registration.iteration_count[t - 1])
            rec["cost"] = float(traj.registration.cost[t - 1])
        print(json.dumps(rec))
    if args.render:
        from .vis import render_trajectory

        render_trajectory(args.render, poses, scans=scans)
        print(f"wrote {args.render}", file=sys.stderr)
    if args.save:
        from .checkpoint import save_pytree

        save_pytree(args.save, {"rotation": poses.rotation, "translation": poses.translation})
        print(f"saved trajectory to {args.save}", file=sys.stderr)
    if args.eval:
        _eval_against_tum(poses, args.eval, dim)


def cmd_graph(args):
    """Standalone pose-graph optimizer over g2o files (the framework's
    analogue of the ``g2o`` command-line binary): load, robust-solve on the
    accelerator, report chi^2, write back."""
    import numpy as np

    from . import pose_graph
    from .io import read_g2o, write_g2o, write_tum

    graph = read_g2o(args.input)
    print(
        f"loaded {graph.num_nodes} vertices, {graph.num_edges} edges "
        f"({'matrix' if graph.sqrt_information is not None else 'scalar'} "
        "information)",
        file=sys.stderr,
    )
    if args.outlier_protocol:
        # Vertigo-style adversarial evaluation (icp_tpu.robustness): inject
        # wrong closures at the requested rates/structures, solve with each
        # kernel, report closure precision/recall + ATE vs the clean-solve
        # oracle.  One JSON record per line (machine-greppable).
        from . import robustness

        recs = robustness.run_protocol(
            graph,
            rates=tuple(float(r) for r in args.outlier_rates.split(",")),
            modes=tuple(args.outlier_modes.split(",")),
            kernels=tuple(args.protocol_kernels.split(",")),
            iterations=args.iterations,
            solver=args.solver,
            cg_iterations=args.cg_iterations,
            seed=args.protocol_seed,
            scale_passes=args.scale_passes,
        )
        for rec in recs:
            print(json.dumps(rec))
        return
    robust_mask = None
    robust_scale = args.robust_scale
    if args.robust_kernel != "none" and args.robust_min_separation > 0:
        import jax.numpy as jnp

        ij = np.asarray(graph.edges_ij)
        robust_mask = jnp.asarray(
            (ij[:, 1] - ij[:, 0] < 0)
            | (np.abs(ij[:, 1] - ij[:, 0]) >= args.robust_min_separation)
        )
    if args.robust_kernel != "none" and args.scale_passes > 1:
        opt, costs, scale, _ = pose_graph.robust_solve(
            graph, kernel=args.robust_kernel, robust_edges=robust_mask,
            iterations=args.iterations, solver=args.solver,
            cg_iterations=args.cg_iterations,
            robust_scale=args.robust_scale, scale_passes=args.scale_passes,
        )
        print(f"robust scale (pass {args.scale_passes}): {scale:.4g}",
              file=sys.stderr)
        # robust_solve's cost trace belongs to the LAST pass; report the
        # true chi2 at the INPUT poses so chi2_initial keeps its meaning.
        import jax.numpy as jnp

        r0 = pose_graph.edge_residuals(graph, graph.poses)
        costs = jnp.concatenate(
            [jnp.sum(r0 * r0)[None], jnp.asarray(costs)[1:]]
        )
    else:
        if robust_mask is not None and isinstance(robust_scale, str):  # 'auto'
            robust_scale = pose_graph.auto_robust_scale(
                graph, iterations=args.iterations, solver=args.solver,
                robust_edges=robust_mask,
            )
            print(f"robust scale (auto): {float(robust_scale):.4g}",
                  file=sys.stderr)
        opt, costs = pose_graph.optimize(
            graph, iterations=args.iterations, solver=args.solver,
            cg_iterations=args.cg_iterations,
            robust=args.robust_kernel, robust_scale=robust_scale,
            robust_edges=robust_mask,
        )
    print(
        f"chi2: {float(costs[0]):.6g} -> {float(costs[-1]):.6g} "
        f"({args.iterations} GN iterations, solver {args.solver})",
        file=sys.stderr,
    )
    if args.output:
        write_g2o(args.output, opt)
        print(f"wrote {args.output}", file=sys.stderr)
    if args.tum:
        write_tum(args.tum, opt.poses)
        print(f"wrote {args.tum}", file=sys.stderr)
    print(json.dumps({
        "vertices": graph.num_nodes,
        "edges": graph.num_edges,
        "chi2_initial": float(costs[0]),
        "chi2_final": float(costs[-1]),
    }))


def cmd_methods(args):
    from .methods import registered_methods

    for dim in (2, 3):
        print(f"{dim}D: " + ", ".join(registered_methods(dim)))


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="icp-tpu", description="TPU-native scan matching / odometry engine"
    )
    from . import __version__

    parser.add_argument(
        "--version", action="version", version=f"icp-tpu {__version__}"
    )
    parser.add_argument(
        "--platform", choices=["cpu", "tpu"], default=None,
        help="cpu forces the host backend (overrides any pinned "
        "JAX_PLATFORMS); tpu uses the default accelerator selection",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_reg = sub.add_parser("register", help="register one scan/cloud pair")
    p_reg.add_argument("-S", "--src", required=True, help="source scan CSV (or PLY with --ply)")
    p_reg.add_argument("-D", "--dst", required=True, help="destination scan CSV (or PLY)")
    p_reg.add_argument("-m", "--method", default="vanilla")
    p_reg.add_argument("-c", "--config", nargs="*", help="method config key=value")
    p_reg.add_argument("--ply", action="store_true", help="inputs are 3D PLY clouds")
    p_reg.add_argument(
        "--sor", action="store_true",
        help="statistical outlier removal on both clouds before registration",
    )
    p_reg.add_argument(
        "--multiscale", action="store_true",
        help="coarse-to-fine pyramid (decimate 4x, then full resolution)",
    )
    p_reg.add_argument(
        "--coarse", action="store_true",
        help="global rotation initializer: bearing-histogram correlation (2D) "
        "or principal-axes candidates (3D)",
    )
    p_reg.add_argument(
        "--aot-cache",
        nargs="?",
        const="",
        metavar="DIR",
        help="disk-cache the compiled executable (icp_tpu.aot); "
        "optional DIR overrides the default cache directory",
    )
    p_reg.add_argument(
        "--exact-capacity", action="store_true",
        help="pad clouds to their exact (sublane-aligned) size instead of "
        "power-of-two buckets (buckets let different-size inputs share "
        "compiled programs / AOT cache entries)",
    )
    p_reg.add_argument("--json", action="store_true")
    p_reg.add_argument("--out-ply", help="write transformed source cloud")
    _add_driver_flags(p_reg)
    p_reg.set_defaults(fn=cmd_register)

    p_view = sub.add_parser("view", help="render registration frames (offline LidarView)")
    p_view.add_argument("-S", "--src", required=True)
    p_view.add_argument("-D", "--dst", required=True)
    p_view.add_argument("-m", "--method", default="vanilla")
    p_view.add_argument("-c", "--config", nargs="*")
    p_view.add_argument("--basic-mode", action="store_true", help="light background")
    p_view.add_argument(
        "--view-conf", help="display conf file (view.conf format: window size, scale)"
    )
    p_view.add_argument("-l", "--log", action="store_true", help="per-iteration debug dump")
    p_view.add_argument("--out", default="view_frames")
    p_view.add_argument("--iterations", type=int, default=20)
    p_view.add_argument("--every", type=int, default=1)
    p_view.add_argument(
        "--animate",
        help="assemble frames into .gif or interactive .html "
        "(SPACE run / I step / D dump, like the SDL viewer)",
    )
    p_view.add_argument("--fps", type=int, default=5)
    p_view.set_defaults(fn=cmd_view)

    p_bench = sub.add_parser("bench", help="benchmark registered methods on example scans")
    p_bench.add_argument("--methods", nargs="*", help="default: all registered 2D methods")
    p_bench.add_argument("--scans", nargs="*", type=int, default=[1, 2, 3])
    p_bench.add_argument("--invocations", type=int, default=10)
    p_bench.add_argument("--data-dir", default="/root/reference/ex_data")
    p_bench.add_argument("-c", "--config", nargs="*")
    p_bench.add_argument(
        "--batch", type=int, default=0,
        help="also measure batched throughput at this many pairs/invocation",
    )
    p_bench.set_defaults(fn=cmd_bench)

    p_odo = sub.add_parser("odometry", help="chain a scan sequence into a trajectory")
    p_odo.add_argument(
        "--scans", nargs="+", required=True, help="ordered scan CSVs (or PLYs with --ply)"
    )
    p_odo.add_argument("--ply", action="store_true", help="scans are 3D PLY clouds")
    p_odo.add_argument(
        "--exact-capacity", action="store_true",
        help="pad to the exact max scan size instead of power-of-two buckets",
    )
    p_odo.add_argument(
        "--aot-cache",
        nargs="?",
        const="",
        metavar="DIR",
        help="disk-cache the compiled batched registration (icp_tpu.aot) "
        "with pair-count bucketing, so repeat runs and different-length "
        "sequences skip the compile",
    )
    p_odo.add_argument("-m", "--method", default="trimmed")
    p_odo.add_argument("-c", "--config", nargs="*")
    p_odo.add_argument("--optimize", action="store_true", help="pose-graph refine")
    p_odo.add_argument(
        "--gn-iterations", type=int, default=None,
        help="Gauss-Newton iterations for --optimize (default 10; 30 when "
        "--robust-kernel is set — the GNC anneal needs the budget)",
    )
    p_odo.add_argument(
        "--loop-radius", type=float, default=0.0,
        help="detect + register loop closures within this pose radius",
    )
    p_odo.add_argument("--loop-min-separation", type=int, default=10)
    p_odo.add_argument("--loop-weight", type=float, default=10.0)
    p_odo.add_argument(
        "--loop-max-cost", type=float, default=None,
        help="reject loop closures whose registration cost exceeds this "
        "(one bad closure can corrupt the optimized trajectory)",
    )
    p_odo.add_argument(
        "--loop-coarse", action="store_true",
        help="seed closure registrations with the global initializer "
        "(use when accumulated drift is large)",
    )
    p_odo.add_argument(
        "--loop-descriptor", type=float, default=None, metavar="RANGE",
        help="detect loop closures by Scan Context appearance matching "
        "instead of pose radius (RANGE = sensor range, the descriptor's "
        "radial extent); immune to pose drift, and each closure is seeded "
        "with the descriptor's yaw estimate",
    )
    p_odo.add_argument(
        "--descriptor-max-distance", type=float, default=0.2,
        help="Scan Context distance acceptance threshold for "
        "--loop-descriptor (smaller = stricter place match)",
    )
    p_odo.add_argument(
        "--robust-kernel", default="none",
        choices=["none", "huber", "cauchy", "welsch", "gnc_gm"],
        help="robust loss on pose-graph edges: down-weights wrong loop "
        "closures (plausible ICP cost, wrong basin) by their graph "
        "inconsistency; gnc_gm = graduated non-convexity (recommended)",
    )
    p_odo.add_argument(
        "--online", action="store_true",
        help="streaming mode: scan-by-scan OnlineSlam (periodic robust loop "
        "closure, live re-anchoring) instead of the offline batch pipeline",
    )
    p_odo.add_argument(
        "--async-refine", action="store_true",
        help="(--online) dispatch loop-closure refinements asynchronously: "
        "the solve leaves the add_scan critical path and the exact "
        "left-compose correction lands when the device result is ready "
        "(bucket prefetch compiles upcoming solver shapes in the "
        "background)",
    )
    p_odo.add_argument(
        "--pipelined", action="store_true",
        help="(--online) fused device step with one deferred host sync per "
        "scan: records stream with one scan of latency; over a remote "
        "accelerator the sync overlap dominates per-scan latency",
    )
    p_odo.add_argument("--loop-every", type=int, default=8,
                       help="(--online) refine every N keyframes")
    p_odo.add_argument("--keyframe-translation", type=float, default=0.5)
    p_odo.add_argument("--keyframe-angle", type=float, default=0.1)
    p_odo.add_argument("--odometry-weight", type=float, default=1.0,
                       help="graph information weight of odometry edges "
                       "(~1/sigma^2; raise it when the front-end tracks well)")
    p_odo.add_argument(
        "--closure-information", action="store_true",
        help="anisotropic closure edges: per-closure information matrices "
        "from the target scan's surface geometry (Censi form) — a corridor "
        "closure then pins only the directions it can actually see",
    )
    p_odo.add_argument(
        "--robust-scale", default="auto",
        type=lambda s: s if s == "auto" else float(s),
        help="inlier threshold for --robust-kernel in plain residual units "
        "(meters+radians); 'auto' (default) derives it from an L2 pre-solve "
        "(2x the upper-median closure residual, outlier-tolerant to 50%)",
    )
    p_odo.add_argument(
        "--scale-passes", default="auto",
        type=lambda s: s if s == "auto" else int(s),
        help="robust-scale re-estimation passes: 'auto' (default) upgrades "
        "to the two-pass welsch recipe (pose_graph.robust_solve) once "
        "--mapping-threshold closures accumulate — the multi-outlier "
        "protocol's validated configuration; 1 forces single-pass",
    )
    p_odo.add_argument(
        "--mapping-threshold", type=int, default=12,
        help="accepted-closure count at which --scale-passes 'auto' "
        "switches to the two-pass mapping-scale solve",
    )
    p_odo.add_argument(
        "--scan-to-map", action="store_true",
        help="register each scan against an aggregated voxel map (less drift)",
    )
    p_odo.add_argument("--voxel-size", type=float, default=0.1)
    p_odo.add_argument("--map-capacity", type=int, default=8192)
    p_odo.add_argument(
        "--device-map", action="store_true",
        help="keep the aggregated map on device (jitted static-shape voxel "
        "merge) instead of host NumPy — for large maps / accelerators",
    )
    p_odo.add_argument("--render", help="write a trajectory/map PNG to this path")
    p_odo.add_argument("--save", help="checkpoint the trajectory poses (.npz)")
    p_odo.add_argument(
        "--coarse", action="store_true",
        help="seed every pair with the global 2D rotation search (sharp turns)",
    )
    p_odo.add_argument(
        "--multiscale", action="store_true",
        help="register pairs through the coarse-to-fine pyramid",
    )
    p_odo.add_argument(
        "--eval", metavar="GT_TUM",
        help="evaluate the trajectory against a TUM ground-truth file "
        "(one line per scan): prints one JSON record with Umeyama-aligned "
        "ATE and delta-1 RPE (icp_tpu.eval)",
    )
    _add_driver_flags(p_odo)
    p_odo.set_defaults(fn=cmd_odometry)

    p_g = sub.add_parser(
        "graph", help="optimize a g2o pose graph (robust kernels, PCG)"
    )
    p_g.add_argument("input", help="input .g2o file (SE2 or SE3:QUAT)")
    p_g.add_argument("-o", "--output", help="write the optimized graph (.g2o)")
    p_g.add_argument("--tum", help="also write the optimized trajectory (TUM)")
    p_g.add_argument("--iterations", type=int, default=30)
    p_g.add_argument("--solver", default="auto",
                     choices=["auto", "dense", "cg", "pcg"])
    p_g.add_argument("--cg-iterations", type=int, default=50)
    p_g.add_argument(
        "--robust-kernel", default="none",
        choices=["none", "huber", "cauchy", "welsch", "gnc_gm"],
    )
    p_g.add_argument(
        "--robust-scale", default="auto",
        type=lambda s: s if s == "auto" else float(s),
    )
    p_g.add_argument(
        "--robust-min-separation", type=int, default=2,
        help="edges spanning fewer than this many ids stay quadratic "
        "(odometry-like); the kernel acts on the rest (loop-like)",
    )
    p_g.add_argument(
        "--scale-passes", type=int, default=1,
        help="robust-scale re-estimation passes (pose_graph.robust_solve); "
        "2 = one bounded re-estimate at the robust solution — the "
        "multi-outlier recipe (BASELINE.md round-4 protocol table)",
    )
    p_g.add_argument(
        "--outlier-protocol", action="store_true",
        help="run the Vertigo-style outlier-injection evaluation on this "
        "graph instead of solving it: per (mode, rate, kernel) closure "
        "precision/recall + ATE vs the clean oracle, one JSON line each",
    )
    p_g.add_argument("--outlier-rates", default="0.1,0.2,0.3")
    p_g.add_argument("--outlier-modes", default="random,clustered")
    p_g.add_argument("--protocol-kernels", default="none,cauchy,welsch,gnc_gm")
    p_g.add_argument("--protocol-seed", type=int, default=0)
    p_g.set_defaults(fn=cmd_graph)

    p_m = sub.add_parser("methods", help="list registered methods")
    p_m.set_defaults(fn=cmd_methods)

    args = parser.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    # --platform tpu leaves JAX's default accelerator selection alone:
    # accelerators may register under a plugin platform name (not the
    # literal "tpu"), so forcing jax_platforms="tpu" can fail to init.
    return args.fn(args)


if __name__ == "__main__":
    main()
