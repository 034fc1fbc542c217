from .ply import read_ply, write_ply
from .scan_csv import parse_lidar_scan, parse_lidar_scan_array, parse_lidar_scan_batch
from .scan_conf import parse_sweep, parse_sweep_conf, sweep_to_points

__all__ = [
    "parse_lidar_scan",
    "parse_lidar_scan_array",
    "parse_lidar_scan_batch",
    "parse_sweep",
    "parse_sweep_conf",
    "read_ply",
    "sweep_to_points",
    "write_ply",
]
