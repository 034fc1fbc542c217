"""Trajectory export in the TUM RGB-D format (``timestamp tx ty tz qx qy
qz qw`` per line) — the lingua franca of trajectory-evaluation tooling
(evo, rpg_trajectory_evaluation), so odometry/SLAM outputs from this
framework drop straight into standard ATE/RPE pipelines.

2D trajectories export with ``tz = 0`` and a yaw-only quaternion.
"""

from __future__ import annotations

import numpy as np

from .g2o import _rot_to_quat

__all__ = ["write_tum", "read_tum"]


def write_tum(path: str, poses, timestamps=None) -> None:
    """Write batched ``RigidTransform`` poses (T, ...) as TUM lines.

    ``timestamps`` default to the frame index (float seconds).
    """
    rot = np.asarray(poses.rotation)
    trans = np.asarray(poses.translation)
    t_total, dim = trans.shape
    if timestamps is None:
        timestamps = np.arange(t_total, dtype=np.float64)
    lines = []
    for k in range(t_total):
        if dim == 2:
            yaw = np.arctan2(rot[k, 1, 0], rot[k, 0, 0])
            q = np.array([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)])
            txyz = (trans[k, 0], trans[k, 1], 0.0)
        else:
            q = _rot_to_quat(rot[k])
            txyz = tuple(trans[k])
        lines.append(
            f"{timestamps[k]:.6f} "
            + " ".join(f"{v:.9g}" for v in txyz)
            + " "
            + " ".join(f"{v:.9g}" for v in q)
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_tum(path: str, dim: int = 3):
    """Read TUM lines back into ``(timestamps, RigidTransform)``.

    ``dim=2`` projects to the plane (yaw from the quaternion, z dropped).
    """
    import jax.numpy as jnp

    from ..geometry import RigidTransform
    from .g2o import _quat_to_rot

    stamps, rots, trans = [], [], []
    with open(path) as f:
        for raw in f:
            tok = raw.split()
            if not tok or tok[0].startswith("#"):
                continue
            vals = [float(v) for v in tok]
            stamps.append(vals[0])
            r3 = _quat_to_rot(np.asarray(vals[4:8]))
            if dim == 2:
                yaw = np.arctan2(r3[1, 0], r3[0, 0])
                rots.append(
                    np.array(
                        [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
                    )
                )
                trans.append(np.asarray(vals[1:3]))
            else:
                rots.append(r3)
                trans.append(np.asarray(vals[1:4]))
    return (
        np.asarray(stamps),
        RigidTransform(jnp.asarray(np.stack(rots)), jnp.asarray(np.stack(trans))),
    )
