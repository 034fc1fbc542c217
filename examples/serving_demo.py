#!/usr/bin/env python3
"""Example: serve single-pair registration requests through the micro-batcher.

Simulates many concurrent clients hitting one BatchingRegistrar; each client
gets exactly its own pose back while the device sees efficient batches.

Run: python serving_demo.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu" or os.environ.get("ICP_EXAMPLES_CPU") == "1":
    # (ICP_EXAMPLES_CPU survives sitecustomize env pinning - smoke tests use it.)
    # Hosted images may pin another platform in sitecustomize; honor the env.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import icp_tpu as icp
from icp_tpu.serve import BatchingRegistrar

rng = np.random.default_rng(0)
QUICK = os.environ.get("ICP_EXAMPLES_QUICK") == "1"  # smoke-test sizes
N_CLIENTS = 8 if QUICK else 32

server = BatchingRegistrar(
    icp.from_method("robust", 2),
    icp.DriverConfig(max_iterations=40, angle_tolerance=1e-4, translation_tolerance=1e-3),
    capacity=256,
    max_batch_size=16,
    max_delay=0.01,
)

base = rng.uniform(-20, 20, (200, 2)).astype(np.float32)
shifts = rng.uniform(-2, 2, (N_CLIENTS, 2)).astype(np.float32)
errors = np.zeros(N_CLIENTS)


def client(k):
    result = server.register(base, base + shifts[k], timeout=600)
    errors[k] = np.linalg.norm(result.translation - shifts[k])


t0 = time.perf_counter()
threads = [threading.Thread(target=client, args=(k,)) for k in range(N_CLIENTS)]
for t in threads:
    t.start()
for t in threads:
    t.join()
dt = time.perf_counter() - t0
server.close()

print(f"{N_CLIENTS} concurrent clients served in {dt:.2f}s "
      f"({N_CLIENTS / dt:.1f} req/s incl. compile)")
print(f"max pose error across clients: {errors.max():.5f}")
assert errors.max() < 1e-2
