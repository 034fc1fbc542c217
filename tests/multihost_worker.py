"""Worker process for the multi-host simulation test.

Launched (2 processes) by ``test_multihost.py``: joins a ``jax.distributed``
cluster on the CPU backend (4 virtual devices per process -> an 8-device
global mesh), runs the mesh-sharded batched converge on deterministic data,
and prints a result checksum that must agree across processes and match the
single-process value.
"""

import os
import sys

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
coordinator = sys.argv[3]
devices_per_process = int(sys.argv[4]) if len(sys.argv) > 4 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={devices_per_process}"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
    local_device_ids=list(range(devices_per_process)),
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import icp_tpu as icp
from icp_tpu.parallel import DATA_AXIS, make_mesh
from jax.sharding import NamedSharding, PartitionSpec as P

assert len(jax.devices()) == devices_per_process * num_processes, len(jax.devices())

mesh = make_mesh(data=devices_per_process * num_processes, points=1)

batch = 8
rng = np.random.default_rng(0)
a_pts = rng.uniform(-30, 30, (batch, 32, 2)).astype(np.float32)
shift = rng.uniform(-2, 2, (batch, 1, 2)).astype(np.float32)
b_pts = a_pts + shift

method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
cfg = icp.DriverConfig(max_iterations=30, angle_tolerance=1e-4, translation_tolerance=1e-4)


def run(a_points, a_count, b_points, b_count, rot, trans):
    a = icp.PointCloud(a_points, a_count)
    b = icp.PointCloud(b_points, b_count)
    guess = icp.geometry.RigidTransform(rot, trans)
    result, _ = icp.converge(method, a, b, guess, cfg)
    return result.transform.translation


sharding = NamedSharding(mesh, P(DATA_AXIS))
fn = jax.jit(
    run,
    in_shardings=(
        NamedSharding(mesh, P(DATA_AXIS, None, None)),
        sharding,
        NamedSharding(mesh, P(DATA_AXIS, None, None)),
        sharding,
        NamedSharding(mesh, P(DATA_AXIS, None, None)),
        NamedSharding(mesh, P(DATA_AXIS, None)),
    ),
)

# Every process feeds the full global arrays; make_array_from_process_data is
# not needed because jax.device_put with a NamedSharding handles the
# host-local slice placement of globally-addressable CPU meshes.
args = (
    jnp.asarray(a_pts),
    jnp.full((batch,), 32, jnp.int32),
    jnp.asarray(b_pts),
    jnp.full((batch,), 32, jnp.int32),
    jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (batch, 2, 2)),
    jnp.zeros((batch, 2), dtype=jnp.float32),
)
global_args = tuple(
    jax.make_array_from_callback(a.shape, s, lambda idx, a=a: np.asarray(a)[idx])
    for a, s in zip(
        args,
        (
            NamedSharding(mesh, P(DATA_AXIS, None, None)),
            sharding,
            NamedSharding(mesh, P(DATA_AXIS, None, None)),
            sharding,
            NamedSharding(mesh, P(DATA_AXIS, None, None)),
            NamedSharding(mesh, P(DATA_AXIS, None)),
        ),
    )
)

out = fn(*global_args)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(out)
checksum = float(total)
expected = float(np.sum(shift[:, 0, :]))
print(f"CHECKSUM {process_id} {checksum:.6f} EXPECTED {expected:.6f}", flush=True)
ok = abs(checksum - expected) < 1e-2
print(f"RESULT {process_id} {'OK' if ok else 'FAIL'}", flush=True)
sys.exit(0 if ok else 1)
