"""Regenerate fp64 golden pins for the IN-REPO synthetic datasets.

Companion to ``regen_golden.py`` (which pins results on the reference's
scan data): these pins make golden coverage independent of the
``/root/reference`` checkout.  Regenerate deliberately after any intentional
numeric change or after re-running ``scripts/make_ex_data.py``.
"""

import json
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import icp_tpu as icp  # noqa: E402

out = {}
cfg = icp.DriverConfig(
    max_iterations=50, angle_tolerance=0.1 * np.pi / 180, translation_tolerance=0.01
)
for name in ["vanilla", "trimmed", "feature_aware"]:
    for scan in [1, 2, 3]:
        a = icp.from_points(
            icp.io.parse_lidar_scan_array(f"{REPO}/ex_data/scan{scan}/first.csv"),
            dtype=np.float64,
        )
        b = icp.from_points(
            icp.io.parse_lidar_scan_array(f"{REPO}/ex_data/scan{scan}/second.csv"),
            dtype=np.float64,
        )
        m = icp.from_method(name, 2)
        r, _ = icp.converge(m, a, b, icp.identity(2, dtype=np.float64), cfg)
        out[f"{name}/scan{scan}"] = {
            "iterations": int(r.iteration_count),
            "cost": float(r.cost),
            "rotation": np.asarray(r.transform.rotation).tolist(),
            "translation": np.asarray(r.transform.translation).tolist(),
        }
        print(name, scan, int(r.iteration_count), float(r.cost))
with open(os.path.join(REPO, "tests", "golden_local.json"), "w") as f:
    json.dump(out, f, indent=1)
