"""Tiny rotation-matrix helpers for the 3D tests (no scipy dependency)."""

import numpy as np


def rot_axis(angle: float, axis: int) -> np.ndarray:
    """Rotation matrix about a coordinate axis (0=x, 1=y, 2=z)."""
    c, s = np.cos(angle), np.sin(angle)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)
    if axis == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)


def rot_zyx(ax: float, ay: float, az: float) -> np.ndarray:
    """ZYX Euler composition ``Rz(az) @ Ry(ay) @ Rx(ax)`` (as the reference's
    ``rot_z * rot_y * rot_x``, ``test3d.cpp:106-109``)."""
    return rot_axis(az, 2) @ rot_axis(ay, 1) @ rot_axis(ax, 0)
