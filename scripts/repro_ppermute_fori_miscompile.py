#!/usr/bin/env python3
"""Standalone repro: consuming loop-carried ppermute outputs AFTER a
fori_loop inside shard_map miscompiles (wrong tie winners).

Context (icp_tpu round 1, JAX 0.9.0, TPU backend via the PJRT 'axon'
plugin): a ring-pipelined exact 1-NN rotates target shards with
``lax.ppermute`` inside ``lax.fori_loop`` under
``shard_map(check_vma=False)``.  Two mathematically identical formulations:

* GOOD — P folds, all INSIDE the loop (the final rotation's output is
  discarded);
* BAD  — P-1 folds inside the loop, then one final fold AFTER the loop on
  the loop-carried (ppermute'd) shard.

On the TPU backend the BAD variant returned wrong argmin winners on
DISTANCE TIES (every loop-exit value inspected individually was correct —
the miscompile appears only when the post-loop consumer fuses with the
loop).  On the CPU backend both variants agree.  icp_tpu ships the GOOD
variant plus this repro and a canary test
(``tests/test_parallel.py::test_ring_nn_fori_workaround_canary``) so the
~1/P extra ring traffic can be retired deliberately after a JAX upgrade.

Run (no icp_tpu needed — fully self-contained):

    # CPU, 8 virtual devices (expected: AGREE)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python scripts/repro_ppermute_fori_miscompile.py
    # TPU (JAX 0.9.0 + axon PJRT: expected MISCOMPILE when >1 device)

Exit code 0 = variants agree, 1 = miscompile reproduced.
"""

import os
import sys

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS") == "cpu":
    # Some images pin another platform in sitecustomize; honor the env.
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

AXIS = "x"


def _nn(query, targets):
    """Exact 1-NN against one shard: squared distances + local argmin."""
    d2 = jnp.sum((query[:, None, :] - targets[None, :, :]) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0], idx


def _fold(step, best, tgt_cur, shard_m, n_shards, q_local, me):
    best_sq, best_idx = best
    owner = jnp.mod(me - step, n_shards)
    sq, idx = _nn(q_local, tgt_cur)
    gidx = idx + owner * shard_m
    better = (sq < best_sq) | ((sq == best_sq) & (gidx < best_idx))
    return jnp.where(better, sq, best_sq), jnp.where(better, gidx, best_idx)


def make_kernel(mesh, n_shards, consume_after_loop):
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def kernel(q_local, tgt_local):
        shard_m = tgt_local.shape[0]
        me = jax.lax.axis_index(AXIS).astype(jnp.int32)
        init = (
            jnp.full((q_local.shape[0],), jnp.inf, dtype=q_local.dtype),
            jnp.full((q_local.shape[0],), jnp.iinfo(jnp.int32).max, jnp.int32),
        )

        def body(step, carry):
            best, tgt_cur = carry
            best = _fold(step, best, tgt_cur, shard_m, n_shards, q_local, me)
            return best, jax.lax.ppermute(tgt_cur, AXIS, perm)

        if consume_after_loop:
            # BAD variant: P-1 rotations; the final fold consumes the
            # loop-carried ppermute output AFTER the loop.
            best, tgt_last = jax.lax.fori_loop(
                0, n_shards - 1, body, (init, tgt_local)
            )
            best = _fold(
                n_shards - 1, best, tgt_last, shard_m, n_shards, q_local, me
            )
        else:
            # GOOD variant: all folds inside; last rotation discarded.
            best, _ = jax.lax.fori_loop(0, n_shards, body, (init, tgt_local))
        return best

    return shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )


def main():
    devices = jax.devices()
    n = len(devices)
    print(f"jax {jax.__version__}, backend {devices[0].platform}, {n} device(s)")
    if n < 2:
        print("need >= 2 devices to exercise the ring; nothing to test")
        return 0
    mesh = Mesh(np.array(devices), (AXIS,))

    # Tie-heavy data: the same 8 points duplicated on EVERY shard, queries
    # exactly on those points -> every query has n_shards tied winners and
    # the contract picks the lowest GLOBAL index.
    rng = np.random.default_rng(123)
    base = rng.uniform(-1, 1, (8, 2)).astype(np.float32)
    targets = jnp.asarray(np.tile(base, (n, 1)))
    query = jnp.asarray(np.tile(np.repeat(base, 4, axis=0), (max(1, n // 2), 1))[: 8 * n])

    good_sq, good_idx = jax.jit(make_kernel(mesh, n, consume_after_loop=False))(
        query, targets
    )
    bad_sq, bad_idx = jax.jit(make_kernel(mesh, n, consume_after_loop=True))(
        query, targets
    )
    # Reference: single-device exact NN with lowest-index tie-break.
    ref_sq, ref_idx = _nn(np.asarray(query), np.asarray(targets))

    ok_good = np.array_equal(np.asarray(good_idx), np.asarray(ref_idx))
    ok_bad = np.array_equal(np.asarray(bad_idx), np.asarray(ref_idx))
    print(f"all-folds-inside-loop matches reference: {ok_good}")
    print(f"consume-after-loop matches reference:    {ok_bad}")
    if ok_good and not ok_bad:
        wrong = np.nonzero(np.asarray(bad_idx) != np.asarray(ref_idx))[0]
        print(
            f"MISCOMPILE reproduced: {len(wrong)} wrong tie winners, e.g. "
            f"query {wrong[0]}: got {int(bad_idx[wrong[0]])}, "
            f"expected {int(ref_idx[wrong[0]])}"
        )
        return 1
    if not ok_good:
        print("UNEXPECTED: the in-loop variant is wrong too — new bug?")
        return 1
    print("variants agree on this backend/version (miscompile not present)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
