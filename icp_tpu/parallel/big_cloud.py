"""Big-cloud registration: ONE giant scan pair sharded across the mesh.

The sequence-parallel analogue for scan matching (SURVEY §5): when a single
cloud outgrows one chip's memory/FLOPs, shard its **points** over the
``points`` mesh axis and express the per-iteration reductions as explicit
collectives inside one ``shard_map``:

* each device owns a slice of the source's working copy and computes its
  rows of the distance tile against the (gathered) target — the row-argmin
  needs no collective;
* the weighted Kabsch needs only five global sums (Σw, Σw·a, Σw·b,
  Σw·a⊗b, Σ dist) — combined with ``jax.lax.psum`` over ``points``; the
  D×D rotation solve then runs replicated on every device;
* the convergence loop (max-iterations + transform tolerance, the criteria
  meaningful for the 3D family, ``driver.h:154-222``) runs entirely
  on-device as a ``lax.while_loop`` around the sharded step.

The target is all-gathered per iteration (point clouds are MBs — ICI
bandwidth makes this cheap; a ppermute-ring tiling is the follow-up for
targets beyond per-device HBM).

This module implements the working-copy iteration scheme of the 3D family
(``vanilla_3d.cpp:90-93``) generalized to 2D/3D with an optional distance
gate (``trimmed_3d.cpp:97-102``) — on ungated runs it is sharded
``vanilla_3d``; gated, sharded ``trimmed_3d``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import geometry
from ..geometry import HIGHEST, RigidTransform
from ..ops.nn import nearest_neighbors
from ..ops.rigid_fit import _rotation_from_h
from .mesh import POINT_AXIS

Array = jax.Array


def big_cloud_converge(
    source_points: Array,
    source_mask: Array,
    target_points: Array,
    target_mask: Array,
    guess: RigidTransform,
    mesh: Mesh,
    *,
    max_iterations: int,
    angle_tolerance: float | None = None,
    translation_tolerance: float | None = None,
    max_distance: float | None = None,
    solver: str = "auto",
    target_mode: str = "gather",
):
    """Register one sharded pair; returns ``(transform, iterations, mean_nn)``.

    ``source_points (N, D)`` / ``source_mask (N,)`` and ``target_points
    (M, D)`` / ``target_mask (M,)`` are sharded over ``points``; ``guess``
    is replicated.  N and M must divide by the ``points`` axis size.

    ``target_mode``: ``"gather"`` all-gathers the target once per run
    (per-device memory O(M); cheapest while it fits), ``"ring"`` keeps the
    target sharded forever and rotates shards with ``ppermute`` each
    iteration (per-device memory O(M/P) — the beyond-HBM regime).
    """
    if (angle_tolerance is None) != (translation_tolerance is None):
        raise ValueError(
            "angle_tolerance and translation_tolerance must be set together"
        )
    n_shards = mesh.shape[POINT_AXIS]
    if source_points.shape[0] % n_shards or target_points.shape[0] % n_shards:
        raise ValueError("point capacities must divide the points axis size")
    dim = source_points.shape[-1]
    dtype = source_points.dtype
    tiny = jnp.finfo(dtype).tiny

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(POINT_AXIS, None),
            P(POINT_AXIS),
            P(POINT_AXIS, None),
            P(POINT_AXIS),
            P(None, None),
            P(None),
        ),
        out_specs=(P(None, None), P(None), P(), P()),
        check_vma=False,
    )
    def _run(src_local, smask_local, tgt_local, tmask_local, guess_rot, guess_trans):
        if target_mode == "gather":
            tgt_full = jax.lax.all_gather(tgt_local, POINT_AXIS, tiled=True)
            tmask_full = jax.lax.all_gather(tmask_local, POINT_AXIS, tiled=True)
        elif target_mode != "ring":
            raise ValueError(f"unknown target_mode {target_mode!r}")
        w_src = smask_local.astype(dtype)

        def step(carry):
            rot, trans, c_local, _, it = carry
            if target_mode == "ring":
                from .ring_nn import ring_nn_with_points

                sq, idx, matched = ring_nn_with_points(
                    c_local, tgt_local, tmask_local, n_shards
                )
            else:
                sq, idx = nearest_neighbors(c_local, tgt_full, tmask_full)
                matched = jnp.take_along_axis(tgt_full, idx[..., None], axis=-2)
            dist = jnp.sqrt(jnp.sqrt(sq))  # reference sqrt(Euclidean) semantics
            if max_distance is not None:
                w = jnp.where(dist <= max_distance, w_src, 0.0)
            else:
                w = w_src

            # Partial weighted sums -> psum over the points axis.
            sw = jax.lax.psum(jnp.sum(w), POINT_AXIS)
            swa = jax.lax.psum(jnp.einsum("nd,n->d", c_local, w, precision=HIGHEST), POINT_AXIS)
            swb = jax.lax.psum(jnp.einsum("nd,n->d", matched, w, precision=HIGHEST), POINT_AXIS)
            swab = jax.lax.psum(
                jnp.einsum("ni,nj,n->ij", c_local, matched, w, precision=HIGHEST),
                POINT_AXIS,
            )
            sdist = jax.lax.psum(jnp.sum(dist * w_src), POINT_AXIS)
            scount = jax.lax.psum(jnp.sum(w_src), POINT_AXIS)

            sw_safe = jnp.maximum(sw, tiny)
            ca, cb = swa / sw_safe, swb / sw_safe
            h = swab - jnp.outer(swa, swb) / sw_safe
            r_step = _rotation_from_h(h, solver)
            t_step = cb - jnp.matmul(r_step, ca[..., None], precision=HIGHEST)[..., 0]

            c_new = jnp.matmul(c_local, r_step.T, precision=HIGHEST) + t_step
            rot_new = jnp.matmul(r_step, rot, precision=HIGHEST)
            trans_new = jnp.matmul(r_step, trans[..., None], precision=HIGHEST)[..., 0] + t_step
            mean_nn = sdist / jnp.maximum(scount, 1.0)
            return rot_new, trans_new, c_new, mean_nn, it + 1

        def cond(carry):
            *_, it = carry
            return it < max_iterations

        c0 = src_local @ guess_rot.T + guess_trans  # respect the guess
        init = (
            guess_rot,
            guess_trans,
            c0,
            jnp.asarray(jnp.finfo(dtype).max, dtype=dtype),
            jnp.asarray(0, dtype=jnp.int32),
        )

        if angle_tolerance is None:
            rot, trans, _, mean_nn, it = jax.lax.while_loop(cond, step, init)
        else:
            # Carry (prev_rot, prev_trans) for the transform-tolerance test.
            def step2(carry):
                inner, prev = carry
                new_inner = step(inner)
                return new_inner, (inner[0], inner[1])

            def cond2(carry):
                inner, prev = carry
                rot, trans, _, _, it = inner
                prev_rot, prev_trans = prev
                angle = geometry.rotation_angle(jnp.matmul(rot, prev_rot.T, precision=HIGHEST))
                tdelta = jnp.linalg.norm(trans - prev_trans)
                settled = (
                    (jnp.abs(angle) < angle_tolerance)
                    & (tdelta < translation_tolerance)
                    & (it > 0)
                )
                return (it < max_iterations) & ~settled

            big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
            prev0 = (jnp.full((dim, dim), big, dtype=dtype), jnp.full((dim,), big, dtype=dtype))
            (rot, trans, _, mean_nn, it), _ = jax.lax.while_loop(
                cond2, step2, (init, prev0)
            )
        return rot, trans, mean_nn, it

    rot, trans, mean_nn, iters = _run(
        source_points, source_mask, target_points, target_mask,
        guess.rotation, guess.translation,
    )
    return RigidTransform(rot, trans), iters, mean_nn
