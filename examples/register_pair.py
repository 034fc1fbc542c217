#!/usr/bin/env python3
"""Example: register one 2D scan pair (the reference README's usage path).

Run: PYTHONPATH=.. python register_pair.py   (from examples/)
"""

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

DATA = "/root/reference/ex_data"
if not os.path.isdir(DATA):
    # Standalone checkouts: the bundled analogues (ex_data/README.md).
    DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ex_data")

a = icp.parse_lidar_scan(f"{DATA}/scan1/first.csv")
b = icp.parse_lidar_scan(f"{DATA}/scan1/second.csv")

method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
cfg = icp.DriverConfig(
    max_iterations=100,
    angle_tolerance=np.deg2rad(0.1),
    translation_tolerance=0.1,
)
result, state = icp.converge(method, a, b, icp.identity(2), cfg)

print(f"iterations: {int(result.iteration_count)}")
print(f"cost:       {float(result.cost):.6f}")
print(f"rotation:\n{np.asarray(result.transform.rotation)}")
print(f"translation: {np.asarray(result.transform.translation)}")

matches = icp.get_matches(state)
costs = np.asarray(matches.cost)[np.asarray(matches.valid)]
print(f"worst match cost: {costs.max():.4f}")
