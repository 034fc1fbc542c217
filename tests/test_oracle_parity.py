"""Numeric parity of every method against the NumPy oracle transcription.

The oracle (``tests/oracle.py``) is a line-by-line behavioral transcription
of the reference C++ (same quirks, same fp64 math).  These tests iterate the
JAX methods and the oracle in lockstep and require near-bit transform
agreement, plus an end-to-end driver parity run on the real ``scan1`` pair
at the benchmark configuration (``/root/reference/bench/bench.cpp:108-113``).
"""

import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu.io import parse_lidar_scan_array

from oracle import (
    OracleDriver,
    OracleFeatureAware2d,
    OracleTrimmed2d,
    OracleTrimmed3d,
    OracleVanilla2d,
    OracleVanilla3d,
)


def hom(rotation, translation):
    d = rotation.shape[0]
    t = np.eye(d + 1)
    t[:d, :d] = rotation
    t[:d, d] = translation
    return t


def random_pair(rng, n, m, dim):
    a = rng.uniform(-40, 40, (n, dim))
    angle = 0.2
    if dim == 2:
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s], [s, c]])
    else:
        c, s = np.cos(angle), np.sin(angle)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    base = rng.uniform(-40, 40, (m, dim))
    b = np.concatenate([a @ rot.T + rng.uniform(-2, 2, dim), base])[:m]
    return a, b


CASES = [
    ("vanilla", 2, icp.Config(), lambda: OracleVanilla2d()),
    ("trimmed", 2, icp.Config(overlap_rate=0.7), lambda: OracleTrimmed2d(0.7)),
    (
        "feature_aware",
        2,
        icp.Config(overlap_rate=0.8, feature_weight=0.6, symmetric_neighbors=4),
        lambda: OracleFeatureAware2d(0.8, 0.6, 4),
    ),
    ("vanilla", 3, icp.Config(), lambda: OracleVanilla3d()),
    ("trimmed", 3, icp.Config(max_distance=3.0), lambda: OracleTrimmed3d(3.0)),
]


@pytest.mark.parametrize("seed", [123, 7, 2026])
@pytest.mark.parametrize("name,dim,config,make_oracle", CASES, ids=lambda c: str(c))
def test_iterate_lockstep_parity(seed, name, dim, config, make_oracle):
    rng = np.random.default_rng(seed)
    n, m = 57, 63
    a_pts, b_pts = random_pair(rng, n, m, dim)
    method = icp.from_method(name, dim, config)
    oracle = make_oracle()

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    state = method.init(a, b, icp.identity(dim, dtype=np.float64))
    oracle.begin(a_pts, b_pts, np.eye(dim + 1))

    for it in range(8):
        state = method.iterate(state)
        oracle.iterate()
        got = hom(
            np.asarray(state.transform.rotation), np.asarray(state.transform.translation)
        )
        np.testing.assert_allclose(
            got, oracle.transform, atol=1e-9, err_msg=f"{name}{dim}d iter {it}"
        )


@pytest.mark.parametrize("name,dim,config,make_oracle", CASES[:3], ids=lambda c: str(c))
def test_cost_parity(rng, name, dim, config, make_oracle):
    n, m = 41, 47
    a_pts, b_pts = random_pair(rng, n, m, dim)
    method = icp.from_method(name, dim, config)
    oracle = make_oracle()

    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    state = method.init(a, b, icp.identity(dim, dtype=np.float64))
    oracle.begin(a_pts, b_pts, np.eye(dim + 1))
    np.testing.assert_allclose(
        float(method.cost(state)), oracle.calculate_cost(), atol=1e-10
    )
    for _ in range(3):
        state = method.iterate(state)
        oracle.iterate()
    np.testing.assert_allclose(
        float(method.cost(state)), oracle.calculate_cost(), atol=1e-10
    )


@pytest.mark.parametrize(
    "name,config,make_oracle",
    [
        ("vanilla", icp.Config(), lambda: OracleVanilla2d()),
        ("trimmed", icp.Config(), lambda: OracleTrimmed2d()),
        (
            "feature_aware",
            icp.Config(),
            lambda: OracleFeatureAware2d(),
        ),
    ],
    ids=["vanilla", "trimmed", "feature_aware"],
)
def test_scan1_driver_parity(ref_data_dir, name, config, make_oracle):
    """End-to-end converge on the real scan1 pair at the bench config
    (50 iters, 0.1 deg / 0.01): final transform and iteration count must
    match the oracle transcription of the C++."""
    a_pts = parse_lidar_scan_array(f"{ref_data_dir}/scan1/first.csv")
    b_pts = parse_lidar_scan_array(f"{ref_data_dir}/scan1/second.csv")

    method = icp.from_method(name, 2, config)
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    a = icp.from_points(a_pts, dtype=np.float64)
    b = icp.from_points(b_pts, dtype=np.float64)
    result, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)

    oracle = make_oracle()
    drv = OracleDriver(oracle)
    drv.max_iterations = 50
    drv.angle_tolerance = 0.1 * np.pi / 180
    drv.translation_tolerance = 0.01
    ocost, oiter, otf = drv.converge(a_pts, b_pts, np.eye(3))

    assert int(result.iteration_count) == oiter
    got = hom(
        np.asarray(result.transform.rotation), np.asarray(result.transform.translation)
    )
    np.testing.assert_allclose(got, otf, atol=1e-7)
    np.testing.assert_allclose(float(result.cost), ocost, atol=1e-8)
