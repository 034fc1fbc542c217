import os, json
os.environ["JAX_PLATFORMS"]="cpu"
import jax; jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, sys; sys.path.insert(0,"/root/repo")
import icp_tpu as icp

out = {}
cfg = icp.DriverConfig(max_iterations=50, angle_tolerance=0.1*np.pi/180, translation_tolerance=0.01)
for name in ["vanilla", "trimmed", "feature_aware"]:
    for scan in [1, 2, 3]:
        a = icp.from_points(
            icp.io.parse_lidar_scan_array(f"/root/reference/ex_data/scan{scan}/first.csv"),
            dtype=np.float64,
        )
        b = icp.from_points(
            icp.io.parse_lidar_scan_array(f"/root/reference/ex_data/scan{scan}/second.csv"),
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
with open("/root/repo/tests/golden_2d.json", "w") as f:
    json.dump(out, f, indent=1)
