"""3D end-to-end registration on the real PLY clouds.

Port of ``/root/reference/tests/test_ply.cpp`` — the test the reference's CI
actually runs: register ``queen_transformed.ply`` onto ``queen.ply`` with
``trimmed`` 3D at the reference driver config (100 iterations, transform
tolerance 1e-4 rad / 1e-4 units, ``test_ply.cpp:22-23,104-105``), write the
transformed result.  The reference asserts nothing beyond exit code; here we
additionally assert registration quality (the C++ "look at the output"
oracle made quantitative): the converged mean NN distance must collapse to
near zero, strictly below the initial misalignment.
"""

import os

import numpy as np

import icp_tpu as icp
from icp_tpu import geometry
from icp_tpu.io import read_ply, write_ply
from icp_tpu.ops.nn import nearest_neighbors


def test_queen_ply_registration(ref_data_dir, tmp_path):
    src_pts = read_ply(os.path.join(ref_data_dir, "ply", "queen_transformed.ply"))
    tgt_pts = read_ply(os.path.join(ref_data_dir, "ply", "queen.ply"))
    assert src_pts.shape == (10720, 3)
    assert tgt_pts.shape == (10720, 3)

    source = icp.from_points(src_pts, dtype=np.float32)
    target = icp.from_points(tgt_pts, dtype=np.float32)

    method = icp.from_method("trimmed", 3, icp.Config(max_distance=1.0))
    cfg = icp.DriverConfig(
        max_iterations=100, angle_tolerance=1e-4, translation_tolerance=1e-4
    )
    result, state = icp.converge(
        method, source, target, icp.identity(3, dtype=np.float32), cfg
    )

    assert 0 < int(result.iteration_count) <= 100

    moved = np.asarray(geometry.apply(result.transform, source.points))[
        : int(source.count)
    ]
    sq_before, _ = nearest_neighbors(source.points, target.points, target.mask)
    sq_after, _ = nearest_neighbors(
        geometry.apply(result.transform, source.points), target.points, target.mask
    )
    before = float(np.sqrt(np.asarray(sq_before)[: int(source.count)]).mean())
    after = float(np.sqrt(np.asarray(sq_after)[: int(source.count)]).mean())
    # The 1e-4 transform tolerance stops the run at a partially-registered
    # state (~12 iterations, mean NN ~0.06 on the ~5-unit-wide queen) — the
    # reference's identical math lands at the same fixpoint; full oracle
    # lockstep parity on this cloud is covered (subsampled) below.
    assert after < before * 0.5, (before, after)
    assert after < 0.1, after

    out = tmp_path / "queen_result.ply"
    write_ply(str(out), moved)
    assert read_ply(str(out)).shape == moved.shape


def test_queen_subsampled_oracle_lockstep(ref_data_dir):
    """Lockstep transform parity vs the NumPy oracle transcription of
    ``Trimmed3d`` on a 1500-point subsample of the queen clouds."""
    from oracle import OracleTrimmed3d

    src_pts = read_ply(os.path.join(ref_data_dir, "ply", "queen_transformed.ply"))
    tgt_pts = read_ply(os.path.join(ref_data_dir, "ply", "queen.ply"))
    rng = np.random.default_rng(7)
    src_pts = src_pts[rng.choice(len(src_pts), 1500, replace=False)]
    tgt_pts = tgt_pts[rng.choice(len(tgt_pts), 1500, replace=False)]

    method = icp.from_method("trimmed", 3, icp.Config(max_distance=1.0))
    a = icp.from_points(src_pts, capacity=1504, dtype=np.float64)
    b = icp.from_points(tgt_pts, capacity=1504, dtype=np.float64)
    state = method.init(a, b, icp.identity(3, dtype=np.float64))

    oracle = OracleTrimmed3d(1.0)
    oracle.begin(src_pts, tgt_pts, np.eye(4))

    for it in range(6):
        state = method.iterate(state)
        oracle.iterate()
        np.testing.assert_allclose(
            np.asarray(state.transform.rotation), oracle.transform[:3, :3],
            atol=1e-9, err_msg=f"iter {it}",
        )
        np.testing.assert_allclose(
            np.asarray(state.transform.translation), oracle.transform[:3, 3],
            atol=1e-9, err_msg=f"iter {it}",
        )


def test_queen_scale_local_ply_registration(local_data_dir, tmp_path):
    """Same E2E protocol on the IN-REPO 10,720-vertex queen-scale pair
    (scripts/make_ex_data.py) — runs on standalone checkouts with no
    /root/reference present."""
    src_pts = read_ply(
        os.path.join(local_data_dir, "ply", "queen_scale_transformed.ply")
    )
    tgt_pts = read_ply(os.path.join(local_data_dir, "ply", "queen_scale.ply"))
    assert src_pts.shape == (10720, 3)
    assert tgt_pts.shape == (10720, 3)

    source = icp.from_points(src_pts, dtype=np.float32)
    target = icp.from_points(tgt_pts, dtype=np.float32)

    method = icp.from_method("trimmed", 3, icp.Config(max_distance=1.0))
    cfg = icp.DriverConfig(
        max_iterations=100, angle_tolerance=1e-4, translation_tolerance=1e-4
    )
    result, _ = icp.converge(
        method, source, target, icp.identity(3, dtype=np.float32), cfg
    )
    assert 0 < int(result.iteration_count) <= 100

    sq_before, _ = nearest_neighbors(source.points, target.points, target.mask)
    sq_after, _ = nearest_neighbors(
        geometry.apply(result.transform, source.points), target.points, target.mask
    )
    before = float(np.sqrt(np.asarray(sq_before)[: int(source.count)]).mean())
    after = float(np.sqrt(np.asarray(sq_after)[: int(source.count)]).mean())
    assert after < before * 0.2, (before, after)
    assert after < 0.05, after

    out = tmp_path / "queen_scale_result.ply"
    moved = np.asarray(geometry.apply(result.transform, source.points))[
        : int(source.count)
    ]
    write_ply(str(out), moved)
    assert read_ply(str(out)).shape == moved.shape
