"""IO (conf sweeps, checkpointing) and Pallas-kernel parity tests."""


import jax.numpy as jnp
import numpy as np

from icp_tpu import checkpoint, geometry, pose_graph
from icp_tpu.io import parse_sweep, parse_sweep_conf, sweep_to_points
from icp_tpu.ops.nn import nearest_neighbors
from icp_tpu.ops.pallas_nn import nearest_neighbors_pallas


def test_sweep_conf_roundtrip(tmp_path):
    """Write a sweep in the rosbag_extract.py format, read it back."""
    path = tmp_path / "scan_0.conf"
    ranges = [1.0, 2.0, float("inf"), 0.05, 3.0]
    with open(path, "w") as f:
        f.write("angle_max = 1.0\nangle_min = -1.0\n")
        f.write("angle_increment = 0.5\nlength = 5\n")
        f.write("range_max = 10.0\nrange_min = 0.1\n")
        for i, r in enumerate(ranges):
            f.write(f"{i} = {r}\n")

    sweep = parse_sweep_conf(str(path))
    assert sweep["length"] == 5
    pts = sweep_to_points(sweep)
    # inf dropped, 0.05 below range_min dropped -> 3 valid returns
    assert pts.shape == (3, 2)
    np.testing.assert_allclose(pts[0], [np.cos(-1.0), np.sin(-1.0)], atol=1e-12)

    cloud = parse_sweep(str(path))
    assert int(cloud.count) == 3


def test_checkpoint_pose_graph_roundtrip(tmp_path, rng):
    poses = geometry.RigidTransform(
        jnp.asarray(np.broadcast_to(np.eye(2), (4, 2, 2)).copy()),
        jnp.asarray(rng.uniform(-1, 1, (4, 2))),
    )
    meas = geometry.RigidTransform(
        jnp.asarray(np.broadcast_to(np.eye(2), (3, 2, 2)).copy()),
        jnp.asarray(rng.uniform(-1, 1, (3, 2))),
    )
    graph = pose_graph.graph_from_trajectory(poses, meas)
    path = str(tmp_path / "graph.npz")
    checkpoint.save_pose_graph(path, graph)
    loaded = checkpoint.load_pose_graph(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.edges_ij), np.asarray(graph.edges_ij)
    )
    np.testing.assert_allclose(
        np.asarray(loaded.poses.translation), np.asarray(graph.poses.translation)
    )
    # Loaded graph optimizes identically.
    o1, c1 = pose_graph.optimize(graph, iterations=3)
    o2, c2 = pose_graph.optimize(loaded, iterations=3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-12)


def test_checkpoint_generic_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5), "b": (jnp.eye(2), jnp.zeros(3))}
    path = str(tmp_path / "tree.npz")
    checkpoint.save_pytree(path, tree)
    loaded = checkpoint.load_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.arange(5))
    np.testing.assert_array_equal(np.asarray(loaded["b"][0]), np.eye(2))


def test_pallas_nn_interpret_matches_jnp(rng):
    """The Pallas kernel (interpret mode on CPU) bit-matches the jnp path."""
    for n, m, dim in [(953, 959, 2), (200, 1500, 3)]:
        q = jnp.asarray(rng.uniform(-50, 50, (n, dim)), dtype=jnp.float32)
        t = jnp.asarray(rng.uniform(-50, 50, (m, dim)), dtype=jnp.float32)
        mask = jnp.asarray(rng.uniform(size=m) > 0.1)
        sq_r, idx_r = nearest_neighbors(q, t, mask)
        sq_p, idx_p = nearest_neighbors_pallas(q, t, mask, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))
        np.testing.assert_allclose(np.asarray(sq_p), np.asarray(sq_r), rtol=1e-6)


def test_pallas_nn_tie_break(rng):
    base = rng.uniform(-5, 5, (64, 2)).astype(np.float32)
    t = jnp.asarray(np.tile(base, (16, 1)))
    q = jnp.asarray(base)
    _, idx_r = nearest_neighbors(q, t, None)
    _, idx_p = nearest_neighbors_pallas(q, t, None, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_r))


def test_csv_loader_native_python_parity(tmp_path):
    """Native and Python CSV parsers must accept/reject identical rows."""
    from icp_tpu.io.scan_csv import parse_lidar_scan_array
    from icp_tpu.utils.native import native_lib

    path = tmp_path / "mixed.csv"
    path.write_text(
        "1.0 2.0\n"          # space-separated: reject
        "3.0,4.0,9.9\n"      # extra column: reject
        "nan,1.0\n"          # NaN: reject
        "inf,2.0\n"          # inf: reject
        "5,6\n"              # valid
        " 7.5 , 8.5 \n"      # whitespace-padded valid
    )
    py = parse_lidar_scan_array(str(path))
    np.testing.assert_allclose(py, [[5.0, 6.0], [7.5, 8.5]])
    lib = native_lib()
    if lib is not None:
        native = lib.parse_scan_csv(str(path))
        np.testing.assert_allclose(native, py)


def test_parse_lidar_scan_batch_bucket_capacity():
    from icp_tpu.io import parse_lidar_scan_batch

    paths = [
        "/root/reference/ex_data/scan1/first.csv",
        "/root/reference/ex_data/scan1/second.csv",
    ]
    import os

    if not os.path.isfile(paths[0]):
        import pytest

        pytest.skip("reference data not present")
    batch = parse_lidar_scan_batch(paths, capacity="bucket")
    assert batch.capacity == 1024  # 953 valid points -> power-of-two bucket
    assert batch.points.shape[0] == 2
