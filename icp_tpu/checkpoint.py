"""Checkpoint / resume for trajectories and pose graphs.

The reference persists nothing but a transformed PLY (SURVEY §5).  Here the
long-running artifacts — odometry trajectories and pose-graph state — are
plain pytrees of arrays, serialized to a single ``.npz`` with a structure
manifest, so a killed run resumes exactly (fail-fast multi-host model: any
host can reload and continue).

Incremental steppability (the reference's pause/resume via ``begin()`` /
``iterate()``, ``icp.h:120-168``) is inherent here: every method state is an
immutable pytree the caller can hold, save, and feed back to ``iterate``.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import RigidTransform
from .pose_graph import PoseGraph


def save_pytree(path: str, tree) -> None:
    """Serialize an arbitrary array pytree to ``.npz`` (+ treedef manifest)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_leaves(path: str) -> list[np.ndarray]:
    """Load the flat leaves saved by :func:`save_pytree` (in order)."""
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    return [data[f"leaf_{i}"] for i in range(n)]


def load_pytree(path: str, like):
    """Load into the structure of an existing pytree ``like``."""
    leaves = load_leaves(path)
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(treedef, [jnp.asarray(a) for a in leaves])


def save_pose_graph(path: str, graph: PoseGraph) -> None:
    save_pytree(path, graph)


def load_pose_graph(path: str) -> PoseGraph:
    leaves = load_leaves(path)
    rot, trans, edges, mrot, mtrans, weights = (jnp.asarray(a) for a in leaves)
    return PoseGraph(
        poses=RigidTransform(rot, trans),
        edges_ij=edges,
        measurements=RigidTransform(mrot, mtrans),
        weights=weights,
    )
