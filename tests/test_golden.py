"""Golden regression pins: bench-config results on the real scan pairs.

The oracle-parity suite proves the implementation matches the C++
transcription; these fixtures additionally pin the absolute fp64 numbers
(recorded from a parity-verified build) so implementation and oracle cannot
drift together unnoticed.  Regenerate deliberately with
``python tests/regen_golden.py`` after any intentional numeric change.
"""

import json
import os

import numpy as np
import pytest

import icp_tpu as icp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_2d.json")


@pytest.mark.parametrize("method_name", ["vanilla", "trimmed", "feature_aware"])
@pytest.mark.parametrize("scan", [1, 2, 3])
def test_bench_config_golden(ref_data_dir, method_name, scan):
    with open(GOLDEN) as f:
        golden = json.load(f)[f"{method_name}/scan{scan}"]

    a = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{ref_data_dir}/scan{scan}/first.csv"),
        dtype=np.float64,
    )
    b = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{ref_data_dir}/scan{scan}/second.csv"),
        dtype=np.float64,
    )
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    method = icp.from_method(method_name, 2)
    result, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)

    assert int(result.iteration_count) == golden["iterations"]
    np.testing.assert_allclose(float(result.cost), golden["cost"], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), golden["rotation"], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), golden["translation"], atol=1e-10
    )


EXTENDED = os.path.join(os.path.dirname(__file__), "golden_extended.json")


@pytest.mark.parametrize(
    "method_name,config",
    [
        ("point_to_plane", {"normal_neighbors": 10}),
        ("robust", {}),
        ("gicp", {"neighbors": 10}),
        ("symmetric", {"normal_neighbors": 10}),
    ],
    ids=lambda v: str(v) if isinstance(v, str) else "",
)
def test_extended_methods_golden(ref_data_dir, method_name, config):
    """Drift pins for the net-new families on scan1 (fp64, bench config).

    These are NOT reference-parity values (the families are net-new) —
    they guard against silent numeric drift exactly like golden_2d does
    for the parity methods.  Regenerate deliberately after intentional
    changes (script inline in git history of tests/golden_extended.json).
    """
    with open(EXTENDED) as f:
        golden = json.load(f)[method_name]

    a = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{ref_data_dir}/scan1/first.csv"),
        dtype=np.float64,
    )
    b = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{ref_data_dir}/scan1/second.csv"),
        dtype=np.float64,
    )
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    method = icp.from_method(method_name, 2, icp.Config(config))
    result, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)

    assert int(result.iteration_count) == golden["iterations"]
    np.testing.assert_allclose(float(result.cost), golden["cost"], rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), golden["translation"], atol=1e-9
    )


LOCAL_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_local.json")


@pytest.mark.parametrize("method_name", ["vanilla", "trimmed", "feature_aware"])
@pytest.mark.parametrize("scan", [1, 2, 3])
def test_bench_config_golden_local(local_data_dir, method_name, scan):
    """Same pins on the IN-REPO synthetic scans (scripts/make_ex_data.py) —
    golden coverage survives without the /root/reference checkout."""
    with open(LOCAL_GOLDEN) as f:
        golden = json.load(f)[f"{method_name}/scan{scan}"]

    a = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{local_data_dir}/scan{scan}/first.csv"),
        dtype=np.float64,
    )
    b = icp.from_points(
        icp.io.parse_lidar_scan_array(f"{local_data_dir}/scan{scan}/second.csv"),
        dtype=np.float64,
    )
    cfg = icp.DriverConfig(
        max_iterations=50,
        angle_tolerance=0.1 * np.pi / 180,
        translation_tolerance=0.01,
    )
    method = icp.from_method(method_name, 2)
    result, _ = icp.converge(method, a, b, icp.identity(2, dtype=np.float64), cfg)

    assert int(result.iteration_count) == golden["iterations"]
    np.testing.assert_allclose(float(result.cost), golden["cost"], rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(result.transform.rotation), golden["rotation"], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(result.transform.translation), golden["translation"], atol=1e-10
    )
