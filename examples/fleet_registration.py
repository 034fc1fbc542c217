#!/usr/bin/env python3
"""Example: register a fleet of scan pairs on a device mesh.

Run: PYTHONPATH=.. python fleet_registration.py
(On CPU set XLA_FLAGS=--xla_force_host_platform_device_count=8 first.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu" or os.environ.get("ICP_EXAMPLES_CPU") == "1":
    # (ICP_EXAMPLES_CPU survives sitecustomize env pinning - smoke tests use it.)
    # Hosted images may pin another platform in sitecustomize; honor the env.
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

import icp_tpu as icp
from icp_tpu.parallel import make_mesh, make_sharded_converge_fn, shard_batch

QUICK = os.environ.get("ICP_EXAMPLES_QUICK") == "1"  # smoke-test sizes
BATCH = 8 * max(len(jax.devices()) // 8, 1) * 8  # divisible by the mesh
N_PTS, CAP = (100, 128) if QUICK else (400, 512)

rng = np.random.default_rng(0)
a_clouds, b_clouds = [], []
for _ in range(BATCH):
    pts = rng.uniform(-30, 30, (N_PTS, 2))
    ang = rng.uniform(-0.2, 0.2)
    c, s = np.cos(ang), np.sin(ang)
    moved = pts @ np.array([[c, s], [-s, c]]) + rng.uniform(-2, 2, 2)
    a_clouds.append(icp.from_points(pts, capacity=CAP, dtype=np.float32))
    b_clouds.append(icp.from_points(moved, capacity=CAP, dtype=np.float32))

a, b = icp.stack(a_clouds), icp.stack(b_clouds)
guess = icp.identity(2, (BATCH,), dtype=np.float32)

n_dev = len(jax.devices())
mesh = make_mesh(data=n_dev, points=1)
method = icp.from_method("robust", 2)
cfg = icp.DriverConfig(
    max_iterations=50, angle_tolerance=1e-4, translation_tolerance=1e-3
)
fn = make_sharded_converge_fn(method, cfg, mesh)
result, _ = fn(*shard_batch((a, b, guess), mesh))

iters = np.asarray(result.iteration_count)
print(f"{BATCH} pairs on {n_dev} device(s)")
print(f"iterations: min {iters.min()} max {iters.max()} mean {iters.mean():.1f}")
print(f"costs: {np.asarray(result.cost)[:4]} ...")
