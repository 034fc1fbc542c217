from .ply import read_ply, write_ply
from .scan_csv import parse_lidar_scan, parse_lidar_scan_array

__all__ = ["parse_lidar_scan", "parse_lidar_scan_array", "read_ply", "write_ply"]
