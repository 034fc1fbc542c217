"""Bundled Manhattan-world pose-graph benchmark (`ex_data/manhattan`).

The classic SLAM back-end workload shape (g2o M3500 family), bundled as
standard g2o text: pins the g2o reader on a real-sized file, the pcg
solver's convergence on a 600-vertex / 1210-edge graph with honest
information matrices, and generator determinism.
"""

import os
import subprocess
import sys

import numpy as np

from icp_tpu import pose_graph
from icp_tpu.io import read_g2o

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "ex_data", "manhattan", "m600.g2o")


def test_loads_and_solves():
    graph = read_g2o(PATH)
    assert graph.num_nodes == 600
    assert graph.num_edges == 1210
    assert graph.sqrt_information is not None  # per-edge info matrices

    opt, costs = pose_graph.optimize(
        graph, iterations=30, solver="pcg", cg_iterations=50
    )
    chi2_0, chi2_n = float(costs[0]), float(costs[-1])
    assert chi2_n < 1e-3 * chi2_0, (chi2_0, chi2_n)
    # Statistically consistent residual: E[chi2] ~ sum of edge dof (the
    # measurement noise matches the information matrices by construction).
    assert chi2_n < 3 * 3 * graph.num_edges
    assert np.all(np.isfinite(np.asarray(opt.poses.translation)))
    # The trajectory stays inside the generator's Manhattan block.
    assert np.abs(np.asarray(opt.poses.translation)).max() < 20


def test_robust_solve_agrees_with_l2_on_clean_graph():
    """No outliers in the bundled graph: the GNC solve stays near the L2
    solution.  With matrix information present, the kernel's units are
    info-whitened residual norms (sqrt-chi2; documented in PoseGraph), so
    statistically marginal closures may soften slightly — the contract is
    bounded deviation and an equally consistent chi2, not bitwise
    agreement."""
    graph = read_g2o(PATH)
    n_odo = 599
    import jax.numpy as jnp

    mask = jnp.arange(graph.num_edges) >= n_odo
    l2, costs_l2 = pose_graph.optimize(graph, iterations=20, solver="pcg")
    gnc, costs_g = pose_graph.optimize(
        graph, iterations=30, solver="pcg",
        robust="gnc_gm", robust_scale="auto", robust_edges=mask,
    )
    dev = np.linalg.norm(
        np.asarray(l2.poses.translation) - np.asarray(gnc.poses.translation),
        axis=-1,
    )
    assert float(dev.max()) < 0.5, float(dev.max())  # ~4% of the world size
    # L2 chi2 of the GNC solution is statistically consistent too.
    r = np.asarray(pose_graph.edge_residuals(gnc, gnc.poses))
    chi2 = float(np.sum(r * r))
    assert chi2 < 3 * 3 * graph.num_edges, chi2


def test_generator_reproduces_committed_file(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_manhattan_g2o.py"),
            "--out",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert open(PATH).read() == open(tmp_path / "m600.g2o").read()


def test_m3500_loads_and_solves():
    """The bundled M3500-scale graph (the size of Olson's classic
    benchmark; the round-4 outlier-protocol workload): reader + pcg at
    3500 nodes / 5979 edges.  chi2 5.2e8 -> 8.6e3 in 30 GN iterations
    (statistically consistent: < 3·dof per edge), trajectory inside the
    generator's 30 m Manhattan block."""
    path = os.path.join(REPO, "ex_data", "manhattan", "m3500.g2o")
    graph = read_g2o(path)
    assert graph.num_nodes == 3500
    assert graph.num_edges == 5979
    opt, costs = pose_graph.optimize(
        graph, iterations=30, solver="pcg", cg_iterations=50
    )
    chi2_0, chi2_n = float(costs[0]), float(costs[-1])
    assert chi2_n < 1e-4 * chi2_0, (chi2_0, chi2_n)
    assert chi2_n < 3 * 3 * graph.num_edges
    assert np.all(np.isfinite(np.asarray(opt.poses.translation)))
    assert np.abs(np.asarray(opt.poses.translation)).max() < 45


def test_sphere2500_loads_and_solves():
    """The bundled sphere-world SE(3) graph (the shape of g2o's classic
    sphere2500): 2500 nodes / 8296 edges with 6x6 information, pcg.
    chi2 8.9e7 -> 3.5e4 (< 6·dof per edge, statistically consistent) and
    the trajectory lands back on the 25 m sphere."""
    path = os.path.join(REPO, "ex_data", "manhattan", "sphere2500.g2o")
    graph = read_g2o(path)
    assert graph.num_nodes == 2500
    assert graph.num_edges == 8296
    assert graph.sqrt_information is not None
    opt, costs = pose_graph.optimize(
        graph, iterations=40, solver="pcg", cg_iterations=60
    )
    chi2_0, chi2_n = float(costs[0]), float(costs[-1])
    assert chi2_n < 1e-3 * chi2_0, (chi2_0, chi2_n)
    assert chi2_n < 6 * 6 * graph.num_edges
    r = np.linalg.norm(np.asarray(opt.poses.translation), axis=-1)
    assert 24.0 < r.min() and r.max() < 26.0, (r.min(), r.max())


def test_sphere_generator_reproduces_committed_file(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_sphere_g2o.py"),
            "--out",
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    committed = os.path.join(REPO, "ex_data", "manhattan", "sphere2500.g2o")
    assert open(committed).read() == open(tmp_path / "sphere2500.g2o").read()
