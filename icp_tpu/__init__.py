"""icp_tpu — a TPU-native scan-matching and odometry engine.

A from-scratch JAX/XLA/Pallas re-design with the full capabilities of the
cornellev/icp C++ library (ICP2/ICP3 method variants, convergence driver,
correspondence search, rigid-transform estimation, scan/PLY IO, benchmark
and visualization tooling) plus net-new TPU-era capabilities: batched
multi-pair registration, mesh-sharded big-cloud correspondence, sequential
odometry, and a pose-graph back-end — all expressed as pure, jittable
functions over device meshes.

Quick start (mirrors the reference README usage, ``README.md:22-39``)::

    import icp_tpu as icp

    a = icp.parse_lidar_scan("ex_data/scan1/first.csv")
    b = icp.parse_lidar_scan("ex_data/scan1/second.csv")
    method = icp.from_method("vanilla", dim=2)
    cfg = icp.DriverConfig(max_iterations=100,
                           angle_tolerance=0.1 * 3.14159 / 180,
                           translation_tolerance=0.1)
    result, _ = icp.converge(method, a, b, icp.identity(2), cfg)
    print(result.transform.rotation, result.transform.translation)
"""

from . import (
    aot,
    checkpoint,
    eval,
    geometry,
    io,
    lie,
    mapping,
    methods,
    multiscale,
    odometry,
    ops,
    parallel,
    pose_graph,
    resilient,
    robustness,
    serve,
    slam,
)
from .cloud import PointCloud, bucket_capacity, from_points, pad_to, stack, to_numpy
from .config import Config
from .driver import ConvergenceState, DriverConfig, converge, converge_stepped, make_converge_fn
from .geometry import RigidTransform, apply, compose, from_angle_2d, identity, inverse
from .io import parse_lidar_scan, read_ply, write_ply
from .methods import (
    Matches,
    from_method,
    get_matches,
    is_method_registered,
    register_method,
    registered_methods,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "Matches",
    "ConvergenceState",
    "DriverConfig",
    "PointCloud",
    "RigidTransform",
    "apply",
    "compose",
    "converge",
    "converge_stepped",
    "from_angle_2d",
    "from_method",
    "get_matches",
    "bucket_capacity",
    "from_points",
    "identity",
    "inverse",
    "is_method_registered",
    "make_converge_fn",
    "pad_to",
    "parse_lidar_scan",
    "read_ply",
    "register_method",
    "registered_methods",
    "stack",
    "to_numpy",
    "write_ply",
]
