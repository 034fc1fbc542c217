"""SLAM-ecosystem interchange formats: g2o pose graphs and TUM trajectories.

Interop contract tests: write -> read round trips preserve the graph (and
its objective — information matrices and scalar weights included), a graph
authored in g2o text solves through this framework's back-end, and TUM
export round-trips poses for external ATE/RPE tooling.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import icp_tpu as icp
from icp_tpu import geometry, lie, pose_graph
from icp_tpu.io.g2o import read_g2o, write_g2o
from icp_tpu.io.trajectory import read_tum, write_tum


def _graph(rng, dim, with_info):
    from tests.test_robust_posegraph import _square_loop_graph

    if dim == 2:
        graph, _, _, _ = _square_loop_graph(rng, t_steps=9)
    else:
        twists = rng.uniform(-0.3, 0.3, (6, 6))
        gt = [geometry.RigidTransform(jnp.eye(3), jnp.zeros(3))]
        for k in range(6):
            gt.append(geometry.compose(gt[-1], lie.se3_exp(jnp.asarray(twists[k]))))
        poses0 = geometry.RigidTransform(
            jnp.stack([p.rotation for p in gt]),
            jnp.stack([p.translation for p in gt]),
        )
        meas = lie.se3_exp(jnp.asarray(twists + rng.normal(0, 0.02, twists.shape)))
        rel = geometry.compose(geometry.inverse(gt[0]), gt[6])
        graph = pose_graph.graph_from_trajectory(
            poses0, meas,
            loop_edges=jnp.asarray([[0, 6]], dtype=jnp.int32),
            loop_measurements=geometry.RigidTransform(
                rel.rotation[None], rel.translation[None]
            ),
            loop_weight=10.0,
        )
    if with_info:
        import dataclasses

        from icp_tpu.ops.covariance import sqrt_information

        d = lie.dof(dim)
        diag = rng.uniform(0.5, 3.0, (graph.num_edges, d))
        info = jnp.asarray(np.stack([np.diag(v) for v in diag]))
        graph = dataclasses.replace(graph, sqrt_information=sqrt_information(info))
    return graph


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("with_info", [False, True])
def test_g2o_round_trip(rng, dim, with_info, tmp_path):
    graph = _graph(rng, dim, with_info)
    path = str(tmp_path / "g.g2o")
    write_g2o(path, graph)
    back = read_g2o(path)

    np.testing.assert_allclose(
        np.asarray(back.poses.translation),
        np.asarray(graph.poses.translation),
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(back.poses.rotation), np.asarray(graph.poses.rotation), atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(back.edges_ij), np.asarray(graph.edges_ij)
    )
    np.testing.assert_allclose(
        np.asarray(back.measurements.translation),
        np.asarray(graph.measurements.translation),
        atol=1e-7,
    )
    # The OBJECTIVE round-trips: per-edge chi^2 at the initial poses agrees
    # (weights fold into the exported information).
    r_a = np.asarray(pose_graph.edge_residuals(graph, graph.poses))
    r_b = np.asarray(pose_graph.edge_residuals(back, back.poses))
    np.testing.assert_allclose(
        np.sum(r_a**2, -1), np.sum(r_b**2, -1), rtol=1e-5, atol=1e-8
    )


def test_g2o_text_graph_solves(tmp_path):
    """A hand-written g2o snippet (sparse, unordered ids; one loop edge with
    anisotropic information) parses and optimizes: the loop closes."""
    text = """
# a 5-pose square with one closure
VERTEX_SE2 10 0 0 0
VERTEX_SE2 11 1.05 0.02 1.5708
VERTEX_SE2 12 1.00 1.04 3.1416
VERTEX_SE2 13 -0.03 1.01 -1.5708
VERTEX_SE2 14 0.06 -0.05 0.03
EDGE_SE2 10 11 1 0 1.5708 10 0 0 10 0 40
EDGE_SE2 11 12 1 0 1.5708 10 0 0 10 0 40
EDGE_SE2 12 13 1 0 1.5708 10 0 0 10 0 40
EDGE_SE2 13 14 1 0 1.5708 10 0 0 10 0 40
EDGE_SE2 10 14 0 0 0 100 0 0 100 0 400
""".strip().splitlines()
    graph = read_g2o(text)
    assert graph.num_nodes == 5 and graph.num_edges == 5
    assert graph.sqrt_information is not None
    opt, costs = pose_graph.optimize(graph, iterations=15, solver="dense")
    assert float(costs[-1]) < float(costs[0])
    # Node 14 (the revisit) pulled onto node 10 by the stiff closure.
    end = np.asarray(opt.poses.translation[-1])
    assert np.linalg.norm(end) < 0.05, end


@pytest.mark.parametrize("dim", [2, 3])
def test_tum_round_trip(rng, dim, tmp_path):
    t_steps = 7
    d = lie.dof(dim)
    twists = rng.uniform(-0.4, 0.4, (t_steps - 1, d))
    gt = [icp.identity(dim, dtype=np.float64)]
    for k in range(t_steps - 1):
        gt.append(geometry.compose(gt[-1], lie.exp(jnp.asarray(twists[k]), dim)))
    poses = geometry.RigidTransform(
        jnp.stack([p.rotation for p in gt]), jnp.stack([p.translation for p in gt])
    )
    path = str(tmp_path / "traj.tum")
    write_tum(path, poses)
    stamps, back = read_tum(path, dim=dim)
    assert stamps.shape == (t_steps,)
    np.testing.assert_allclose(
        np.asarray(back.translation), np.asarray(poses.translation), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(back.rotation), np.asarray(poses.rotation), atol=1e-6
    )
