"""g2o pose-graph file IO (SE2 and SE3:QUAT vertices/edges).

The de-facto interchange format of the SLAM ecosystem (g2o, GTSAM, Ceres
examples, the classic Manhattan/M3500/sphere2500 benchmark graphs).  This
module maps it onto :class:`icp_tpu.pose_graph.PoseGraph`, so externally
produced graphs run through this framework's batched GN/PCG + robust
kernels, and graphs built here export for comparison against other
back-ends.

Format (plain text, one record per line):

* ``VERTEX_SE2 id x y theta``
* ``EDGE_SE2 i j dx dy dtheta  i11 i12 i13 i22 i23 i33`` — upper triangle
  of the 3x3 information matrix in ``(x, y, theta)`` order.
* ``VERTEX_SE3:QUAT id x y z qx qy qz qw``
* ``EDGE_SE3:QUAT i j dx dy dz qx qy qz qw  <21 upper-tri entries>`` — 6x6
  information in ``(x, y, z, rx, ry, rz)`` order.

Conventions line up: a g2o edge measurement is the pose of vertex ``j``
expressed in vertex ``i``'s frame — exactly ``PoseGraph.measurements`` —
and its tangent ordering (translation first, then rotation) matches
:mod:`icp_tpu.lie`.  Information matrices land in
``PoseGraph.sqrt_information`` (Cholesky whitener) with scalar ``weights``
= 1; export folds scalar weights back into the information.  Host-side
NumPy IO (file parsing is irregular host work, like the scan parsers).
"""

from __future__ import annotations

import numpy as np

__all__ = ["read_g2o", "write_g2o"]

_TRI2 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
_TRI3 = [(i, j) for i in range(6) for j in range(i, 6)]


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    """(qx, qy, qz, qw) -> 3x3 rotation (g2o stores x,y,z,w)."""
    x, y, z, w = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def _rot_to_quat(rot: np.ndarray) -> np.ndarray:
    """3x3 rotation -> (qx, qy, qz, qw), w >= 0 (Shepperd's stable branch)."""
    m = rot
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
        v = np.zeros(3)
        v[i] = 0.25 * s
        v[j] = (m[j, i] + m[i, j]) / s
        v[k] = (m[k, i] + m[i, k]) / s
        w = (m[k, j] - m[j, k]) / s
        x, y, z = v
    q = np.array([x, y, z, w])
    if q[3] < 0:
        q = -q
    return q / np.linalg.norm(q)


def read_g2o(path_or_lines):
    """Parse a g2o file (path, or an iterable of lines) into a
    :class:`icp_tpu.pose_graph.PoseGraph`.

    Vertex ids may be sparse/unordered; they are remapped to dense
    ``0..T-1`` in ascending-id order (the returned graph's node ``k`` is
    the k-th smallest vertex id).  Edge information matrices become the
    graph's ``sqrt_information``; if EVERY edge carries the identity, the
    field is left ``None`` (the cheaper scalar path).
    """
    import jax.numpy as jnp

    from .. import pose_graph as pg
    from ..geometry import RigidTransform
    from ..ops.covariance import sqrt_information as chol_t

    if isinstance(path_or_lines, str):
        with open(path_or_lines) as f:
            lines = f.readlines()
    else:
        lines = list(path_or_lines)

    vertices: dict[int, tuple] = {}
    edges = []
    dim = None
    for ln, raw in enumerate(lines):
        tok = raw.split()
        if not tok or tok[0].startswith("#"):
            continue
        tag = tok[0]
        if tag == "VERTEX_SE2":
            if dim == 3:
                raise ValueError(f"line {ln}: mixed SE2/SE3 records")
            dim = 2
            vertices[int(tok[1])] = tuple(float(v) for v in tok[2:5])
        elif tag == "VERTEX_SE3:QUAT":
            if dim == 2:
                raise ValueError(f"line {ln}: mixed SE2/SE3 records")
            dim = 3
            vertices[int(tok[1])] = tuple(float(v) for v in tok[2:9])
        elif tag == "EDGE_SE2":
            vals = [float(v) for v in tok[3:]]
            if len(vals) != 3 + 6:
                raise ValueError(f"line {ln}: EDGE_SE2 needs 3 + 6 values")
            edges.append((int(tok[1]), int(tok[2]), vals[:3], vals[3:]))
        elif tag == "EDGE_SE3:QUAT":
            vals = [float(v) for v in tok[3:]]
            if len(vals) != 7 + 21:
                raise ValueError(f"line {ln}: EDGE_SE3:QUAT needs 7 + 21 values")
            edges.append((int(tok[1]), int(tok[2]), vals[:7], vals[7:]))
        # unknown tags (parameters, fixed markers) are skipped
    if dim is None or not vertices:
        raise ValueError("no SE2/SE3 vertices found")

    ids = sorted(vertices)
    remap = {vid: k for k, vid in enumerate(ids)}
    dof = 3 if dim == 2 else 6
    tri = _TRI2 if dim == 2 else _TRI3

    if dim == 2:
        rot = np.stack(
            [
                np.array(
                    [
                        [np.cos(vertices[v][2]), -np.sin(vertices[v][2])],
                        [np.sin(vertices[v][2]), np.cos(vertices[v][2])],
                    ]
                )
                for v in ids
            ]
        )
        trans = np.stack([np.asarray(vertices[v][:2]) for v in ids])
    else:
        rot = np.stack([_quat_to_rot(np.asarray(vertices[v][3:7])) for v in ids])
        trans = np.stack([np.asarray(vertices[v][:3]) for v in ids])

    e_ij, m_rot, m_trans, infos = [], [], [], []
    for i, j, meas, info_vals in edges:
        e_ij.append((remap[i], remap[j]))
        if dim == 2:
            # EDGE_SE2 stores the relative GROUP pose (dx, dy, dtheta)
            # directly — NOT an se(2) tangent (no V(theta) factor).
            c, s = np.cos(meas[2]), np.sin(meas[2])
            m_rot.append(np.array([[c, -s], [s, c]]))
            m_trans.append(np.asarray(meas[:2]))
        else:
            m_rot.append(_quat_to_rot(np.asarray(meas[3:7])))
            m_trans.append(np.asarray(meas[:3]))
        info = np.zeros((dof, dof))
        for (a, b), v in zip(tri, info_vals):
            info[a, b] = v
            info[b, a] = v
        infos.append(info)

    infos = np.stack(infos) if infos else np.zeros((0, dof, dof))
    identity_info = bool(
        infos.shape[0] and np.allclose(infos, np.eye(dof)[None], atol=1e-12)
    )
    graph = pg.PoseGraph(
        poses=RigidTransform(jnp.asarray(rot), jnp.asarray(trans)),
        edges_ij=jnp.asarray(e_ij, dtype=jnp.int32).reshape(-1, 2),
        measurements=RigidTransform(
            jnp.asarray(np.stack(m_rot) if m_rot else np.zeros((0, dim, dim))),
            jnp.asarray(np.stack(m_trans) if m_trans else np.zeros((0, dim))),
        ),
        weights=jnp.ones((len(edges),), dtype=trans.dtype),
        sqrt_information=None if identity_info else chol_t(jnp.asarray(infos)),
    )
    return graph


def write_g2o(path: str, graph) -> None:
    """Write a :class:`PoseGraph` as g2o text.

    Scalar edge ``weights`` fold into the exported information
    (``w * L L^T``, or ``w * I`` when the graph has no
    ``sqrt_information``), so a round trip preserves the objective.
    """

    rot = np.asarray(graph.poses.rotation)
    trans = np.asarray(graph.poses.translation)
    dim = trans.shape[-1]
    dof = 3 if dim == 2 else 6
    tri = _TRI2 if dim == 2 else _TRI3
    lines = []
    for k in range(trans.shape[0]):
        if dim == 2:
            theta = np.arctan2(rot[k, 1, 0], rot[k, 0, 0])
            lines.append(
                f"VERTEX_SE2 {k} {trans[k, 0]:.9g} {trans[k, 1]:.9g} {theta:.9g}"
            )
        else:
            q = _rot_to_quat(rot[k])
            lines.append(
                "VERTEX_SE3:QUAT "
                + f"{k} " + " ".join(f"{v:.9g}" for v in trans[k])
                + " " + " ".join(f"{v:.9g}" for v in q)
            )
    e_ij = np.asarray(graph.edges_ij)
    m_rot = np.asarray(graph.measurements.rotation)
    m_trans = np.asarray(graph.measurements.translation)
    w = np.asarray(graph.weights)
    if graph.sqrt_information is not None:
        lt = np.asarray(graph.sqrt_information)
        info_all = np.einsum("eij,eik->ejk", lt, lt)  # L L^T from L^T
    else:
        info_all = np.broadcast_to(np.eye(dof), (e_ij.shape[0], dof, dof))
    for e in range(e_ij.shape[0]):
        info = info_all[e] * w[e]
        tri_vals = " ".join(f"{info[a, b]:.9g}" for a, b in tri)
        if dim == 2:
            dtheta = np.arctan2(m_rot[e][1, 0], m_rot[e][0, 0])
            lines.append(
                f"EDGE_SE2 {e_ij[e, 0]} {e_ij[e, 1]} "
                f"{m_trans[e, 0]:.9g} {m_trans[e, 1]:.9g} {dtheta:.9g} {tri_vals}"
            )
        else:
            q = _rot_to_quat(m_rot[e])
            lines.append(
                f"EDGE_SE3:QUAT {e_ij[e, 0]} {e_ij[e, 1]} "
                + " ".join(f"{v:.9g}" for v in m_trans[e])
                + " " + " ".join(f"{v:.9g}" for v in q)
                + " " + tri_vals
            )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
