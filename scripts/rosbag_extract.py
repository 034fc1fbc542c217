#!/usr/bin/env python3
"""Extract lidar sweeps from a ROS bag into .conf files.

Analogue of the reference's ``script/rosbag_extract.py`` (an interactive
matplotlib browser over a LaserScan topic that exports selected sweeps in
the ``.conf`` format consumed by :mod:`icp_tpu.io.scan_conf`).

Headless-first redesign: instead of a GUI browser, select sweeps by index or
stride from the command line; ``--preview`` renders PNGs for inspection on a
workstation.  Requires ``bagpy`` (not bundled); fails with a clear message
when absent.

Usage:
  python scripts/rosbag_extract.py BAG TOPIC --out DIR [--every 10]
  python scripts/rosbag_extract.py BAG TOPIC --out DIR --indices 3 17 42
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("topic")
    ap.add_argument("--out", required=True)
    ap.add_argument("--every", type=int, help="export every k-th sweep")
    ap.add_argument("--indices", type=int, nargs="*", help="explicit sweep indices")
    ap.add_argument("--preview", action="store_true", help="also render PNGs")
    args = ap.parse_args()

    try:
        import bagpy  # noqa: F401
        import pandas as pd
        from bagpy import bagreader
    except ImportError:
        sys.exit(
            "rosbag_extract requires the 'bagpy' package (not bundled in this "
            "environment). Install it, or convert sweeps to .conf elsewhere — "
            "icp_tpu.io.parse_sweep reads the format directly."
        )

    reader = bagreader(args.bag)
    csv_path = reader.message_by_topic(args.topic)
    df = pd.read_csv(csv_path)

    indices = args.indices
    if indices is None:
        step = args.every or 1
        indices = list(range(0, len(df), step))

    os.makedirs(args.out, exist_ok=True)
    range_cols = [c for c in df.columns if c.startswith("ranges")]
    for n, i in enumerate(indices):
        row = df.iloc[i]
        ranges = [row[c] for c in range_cols]
        path = os.path.join(args.out, f"scan_{n}.conf")
        with open(path, "w") as f:
            f.write(f"angle_max = {row['angle_max']}\n")
            f.write(f"angle_min = {row['angle_min']}\n")
            f.write(f"angle_increment = {row['angle_increment']}\n")
            f.write(f"length = {len(ranges)}\n")
            f.write(f"range_max = {row['range_max']}\n")
            f.write(f"range_min = {row['range_min']}\n")
            for k, r in enumerate(ranges):
                f.write(f"{k} = {r}\n")
        print(f"exported sweep {i} -> {path}")
        if args.preview:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            from icp_tpu.io.scan_conf import parse_sweep_conf, sweep_to_points

            pts = sweep_to_points(parse_sweep_conf(path))
            fig, ax = plt.subplots()
            ax.scatter(pts[:, 0], pts[:, 1], s=2)
            ax.set_aspect("equal")
            fig.savefig(path.replace(".conf", ".png"), dpi=80)
            plt.close(fig)


if __name__ == "__main__":
    main()
