#!/usr/bin/env python3
"""Example: the complete SLAM pipeline as a library user would write it.

Generates a noisy circular scan sequence, then:
  odometry (coarse-seeded chain) -> keyframes -> loop-closure detection ->
  closure registration -> pose-graph optimization -> rendered trajectory.

Run: python slam_pipeline.py   (CPU-friendly; writes slam_trajectory.png)
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu" or os.environ.get("ICP_EXAMPLES_CPU") == "1":
    # (ICP_EXAMPLES_CPU survives sitecustomize env pinning - smoke tests use it.)
    # Hosted images may pin another platform in sitecustomize; honor the env.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import icp_tpu as icp
from icp_tpu import geometry, odometry, pose_graph
from icp_tpu.vis import render_trajectory

rng = np.random.default_rng(7)

# --- Simulated world + circular trajectory with a closed loop -------------
world = rng.uniform(-30, 30, (200, 2))
T, radius = 25, 4.0
scans = []
for k in range(T):
    phi = 2 * math.pi * k / (T - 1)
    px, py, th = radius * math.cos(phi), radius * math.sin(phi), phi + math.pi / 2
    c, s = np.cos(th), np.sin(th)
    pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
    scans.append(pts + rng.normal(0, 0.03, pts.shape))
stack = icp.stack([icp.from_points(p, capacity=200, dtype=np.float64) for p in scans])

# --- Front-end: batched odometry ------------------------------------------
method = icp.from_method("robust", 2)
cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=1e-5, translation_tolerance=1e-5)
traj = odometry.chain_scans(stack, method, cfg, coarse=True)
drift = float(np.linalg.norm(np.asarray(traj.poses.translation[-1])))
print(f"odometry end-pose drift: {drift:.4f}")

# --- Back-end: loop closure + pose graph ----------------------------------
cands = pose_graph.find_loop_candidates(traj.poses, radius=1.5, min_separation=T - 3)
print(f"loop candidates: {np.asarray(cands).tolist()}")
edges, meas, costs = pose_graph.register_loop_closures(
    stack, traj.poses, cands, method, cfg, max_cost=1.0
)
graph = pose_graph.graph_from_trajectory(
    traj.poses,
    geometry.inverse(traj.relative),
    loop_edges=edges,
    loop_measurements=meas,
    loop_weight=20.0,
)
graph, gcosts = pose_graph.optimize(graph, iterations=10)
print(f"graph cost: {float(gcosts[0]):.3e} -> {float(gcosts[-1]):.3e}")
opt_drift = float(np.linalg.norm(np.asarray(graph.poses.translation[-1])))
print(f"optimized end-pose drift: {opt_drift:.4f}")

# --- Artifact --------------------------------------------------------------
out = os.path.join(os.environ.get("ICP_EXAMPLES_OUT")
                   or os.path.dirname(os.path.abspath(__file__)),
                   "slam_trajectory.png")
render_trajectory(out, graph.poses, scans=stack)
print(f"wrote {out}")
