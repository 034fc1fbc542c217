"""Sharding-layer tests on the 8-virtual-device CPU mesh.

The reference has no distributed mode at all (SURVEY §2.4); the contract for
every sharded path here is exact equivalence with the single-device
implementation — poses and indices, not just tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icp_tpu as icp
from icp_tpu.ops.nn import nearest_neighbors
from icp_tpu.parallel import (
    big_cloud_converge,
    make_mesh,
    make_sharded_converge_fn,
    shard_batch,
    sharded_nearest_neighbors,
)


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_sharded_nn_matches_single_device(rng):
    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    q = jnp.asarray(rng.uniform(-50, 50, (96, 3)))
    t = jnp.asarray(rng.uniform(-50, 50, (160, 3)))
    mask = jnp.asarray(rng.uniform(size=160) > 0.1)

    sq_ref, idx_ref = nearest_neighbors(q, t, mask)
    sq, idx = sharded_nearest_neighbors(q, t, mask, mesh)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sq_ref), rtol=1e-12)


def test_sharded_nn_tie_break_matches(rng):
    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    # Duplicate target points across shards force cross-shard ties.
    base = rng.uniform(-5, 5, (16, 2))
    t = jnp.asarray(np.tile(base, (8, 1)))  # 128 targets, every point x8
    q = jnp.asarray(base + rng.normal(0, 0.01, base.shape))
    sq_ref, idx_ref = nearest_neighbors(q, t, None)
    sq, idx = sharded_nearest_neighbors(q, t, None, mesh)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


@pytest.mark.parametrize("shard_points", [False, True])
def test_sharded_converge_matches_unsharded(rng, shard_points):
    require_devices(8)
    mesh = make_mesh(data=4, points=2) if shard_points else make_mesh(data=8, points=1)
    batch = 8
    cap = 64

    a_clouds, b_clouds = [], []
    for k in range(batch):
        n = 40 + k
        a_pts = rng.uniform(-30, 30, (n, 2))
        ang = rng.uniform(-0.2, 0.2)
        c, s = np.cos(ang), np.sin(ang)
        b_pts = a_pts @ np.array([[c, s], [-s, c]]) + rng.uniform(-2, 2, 2)
        a_clouds.append(icp.from_points(a_pts, capacity=cap, dtype=np.float64))
        b_clouds.append(icp.from_points(b_pts, capacity=cap, dtype=np.float64))
    a_batch, b_batch = icp.stack(a_clouds), icp.stack(b_clouds)
    guess = icp.identity(2, (batch,), dtype=np.float64)

    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    cfg = icp.DriverConfig(
        max_iterations=25, angle_tolerance=1e-3, translation_tolerance=1e-2
    )

    ref, _ = icp.converge(method, a_batch, b_batch, guess, cfg)

    fn = make_sharded_converge_fn(method, cfg, mesh, shard_points=shard_points)
    src, tgt, g = shard_batch((a_batch, b_batch, guess), mesh, shard_points)
    got, _ = fn(src, tgt, g)

    np.testing.assert_array_equal(
        np.asarray(got.iteration_count), np.asarray(ref.iteration_count)
    )
    np.testing.assert_allclose(
        np.asarray(got.transform.rotation), np.asarray(ref.transform.rotation), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.transform.translation),
        np.asarray(ref.transform.translation),
        atol=1e-9,
    )


@pytest.mark.parametrize("gate", [None, 3.0])
def test_big_cloud_matches_method(rng, gate):
    """Sharded big-cloud converge == unsharded vanilla_3d/trimmed_3d."""
    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    n, m = 256, 320
    a_pts = rng.uniform(-10, 10, (n, 3))
    ang = 0.15
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    b_pts = np.concatenate([a_pts @ rot.T + [1.0, -0.5, 0.2], rng.uniform(-10, 10, (m - n, 3))])

    name_cfg = (
        ("vanilla", icp.Config()) if gate is None else ("trimmed", icp.Config(max_distance=gate))
    )
    method = icp.from_method(name_cfg[0], 3, name_cfg[1])
    a = icp.from_points(a_pts, capacity=n, dtype=np.float64)
    b = icp.from_points(b_pts, capacity=m, dtype=np.float64)
    state = method.init(a, b, icp.identity(3, dtype=np.float64))
    for _ in range(10):
        state = method.iterate(state)

    tf, iters, mean_nn = big_cloud_converge(
        jnp.asarray(a_pts),
        jnp.ones(n, dtype=bool),
        jnp.asarray(b_pts),
        jnp.ones(m, dtype=bool),
        icp.identity(3, dtype=np.float64),
        mesh,
        max_iterations=10,
        max_distance=gate,
        solver="svd",
    )
    assert int(iters) == 10
    np.testing.assert_allclose(
        np.asarray(tf.rotation), np.asarray(state.transform.rotation), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(tf.translation), np.asarray(state.transform.translation), atol=1e-8
    )


def test_big_cloud_transform_tolerance_terminates(rng):
    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    n = 128
    a_pts = rng.uniform(-10, 10, (n, 3))
    b_pts = a_pts + np.array([0.5, -0.2, 0.1])
    tf, iters, mean_nn = big_cloud_converge(
        jnp.asarray(a_pts),
        jnp.ones(n, dtype=bool),
        jnp.asarray(b_pts),
        jnp.ones(n, dtype=bool),
        icp.identity(3, dtype=np.float64),
        mesh,
        max_iterations=100,
        angle_tolerance=1e-6,
        translation_tolerance=1e-6,
        solver="svd",
    )
    assert int(iters) < 100
    np.testing.assert_allclose(
        np.asarray(tf.translation), [0.5, -0.2, 0.1], atol=1e-6
    )


def test_big_cloud_2d_matches_method(rng):
    """big_cloud supports 2D as well (sharded working-copy iteration)."""
    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    n, m = 128, 160
    a_pts = rng.uniform(-10, 10, (n, 2))
    ang = 0.1
    c, s = np.cos(ang), np.sin(ang)
    b_pts = np.concatenate(
        [a_pts @ np.array([[c, s], [-s, c]]) + [0.5, -0.3], rng.uniform(-10, 10, (m - n, 2))]
    )
    tf, iters, _ = big_cloud_converge(
        jnp.asarray(a_pts), jnp.ones(n, dtype=bool),
        jnp.asarray(b_pts), jnp.ones(m, dtype=bool),
        icp.identity(2, dtype=np.float64), mesh,
        max_iterations=15, angle_tolerance=1e-6, translation_tolerance=1e-6,
    )
    # 2D big-cloud uses the working-copy scheme; the pose should recover the
    # planted transform (the rotation applied was R^T due to row convention).
    np.testing.assert_allclose(np.asarray(tf.translation), [0.5, -0.3], atol=1e-3)


def test_ring_nn_matches_single_device(rng):
    """ppermute-ring NN (O(M/P) memory) == single-device kernel, bit for bit."""
    from icp_tpu.parallel.ring_nn import ring_nearest_neighbors

    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    q = jnp.asarray(rng.uniform(-50, 50, (96, 3)))
    t = jnp.asarray(rng.uniform(-50, 50, (160, 3)))
    mask = jnp.asarray(rng.uniform(size=160) > 0.1)
    sq_ref, idx_ref = nearest_neighbors(q, t, mask)
    sq, idx = ring_nearest_neighbors(q, t, mask, mesh)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sq_ref), rtol=1e-12)


def test_ring_nn_tie_break(rng):
    from icp_tpu.parallel.ring_nn import ring_nearest_neighbors

    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    base = rng.uniform(-5, 5, (16, 2))
    t = jnp.asarray(np.tile(base, (8, 1)))  # duplicates across every shard
    q = jnp.asarray(np.tile(base + rng.normal(0, 0.01, base.shape), (8, 1)))
    _, idx_ref = nearest_neighbors(q, t, None)
    _, idx = ring_nearest_neighbors(q, t, None, mesh)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


def test_big_cloud_ring_mode_matches_gather(rng):
    """target_mode='ring' (O(M/P) memory) == 'gather' == unsharded method."""
    require_devices(8)
    mesh = make_mesh(data=1, points=8)
    n, m = 128, 160
    a_pts = rng.uniform(-10, 10, (n, 3))
    b_pts = np.concatenate([a_pts + [0.8, -0.4, 0.2], rng.uniform(-10, 10, (m - n, 3))])
    args = (
        jnp.asarray(a_pts), jnp.ones(n, dtype=bool),
        jnp.asarray(b_pts), jnp.ones(m, dtype=bool),
        icp.identity(3, dtype=np.float64), mesh,
    )
    kw = dict(max_iterations=8, solver="svd")
    tf_g, it_g, nn_g = big_cloud_converge(*args, target_mode="gather", **kw)
    tf_r, it_r, nn_r = big_cloud_converge(*args, target_mode="ring", **kw)
    np.testing.assert_allclose(np.asarray(tf_r.rotation), np.asarray(tf_g.rotation), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(tf_r.translation), np.asarray(tf_g.translation), atol=1e-12
    )
    np.testing.assert_allclose(float(nn_r), float(nn_g), atol=1e-12)


def test_feature_aware_sharded_converge_matches_unsharded(rng):
    """feature_aware under SP: its global-max normalization couples every
    (source, target) pair entry (``feature_aware.cpp:53-57,130-133``), the
    known hard case for points-sharding (SURVEY §7) — GSPMD must insert the
    cross-shard max before the argmin.  Sharded result == single-device."""
    batch = 4
    a_np = rng.uniform(-20, 20, (batch, 64, 2))
    shift = rng.uniform(-1, 1, (batch, 1, 2))
    a = icp.PointCloud(jnp.asarray(a_np), jnp.full((batch,), 64, dtype=jnp.int32))
    b = icp.PointCloud(
        jnp.asarray(a_np + shift), jnp.full((batch,), 64, dtype=jnp.int32)
    )
    guess = icp.identity(2, (batch,), dtype=np.float64)
    method = icp.from_method("feature_aware", 2, icp.Config(overlap_rate=1.0))
    cfg = icp.DriverConfig(
        max_iterations=20, angle_tolerance=1e-6, translation_tolerance=1e-6
    )

    single, _ = icp.converge(method, a, b, guess, cfg)

    mesh = make_mesh(data=2, points=4)
    fn = make_sharded_converge_fn(method, cfg, mesh, shard_points=True)
    src, tgt, g = shard_batch((a, b, guess), mesh, shard_points=True)
    sharded, _ = fn(src, tgt, g)

    np.testing.assert_allclose(
        np.asarray(sharded.transform.translation),
        np.asarray(single.transform.translation),
        atol=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.iteration_count), np.asarray(single.iteration_count)
    )


def test_ring_nn_fori_workaround_canary(rng):
    """Canary for the ring_nn fori_loop workaround (ring_nn.py module doc).

    Round 1 found that consuming loop-carried ppermute outputs AFTER a
    fori_loop inside shard_map(check_vma=False) miscompiled (wrong tie
    winners) — observed on the TPU backend under JAX 0.9.0; the workaround
    keeps all folds inside the loop.  This canary pins BOTH current
    behaviors on the CPU mesh: the workaround path stays bit-exact, and the
    P-1 'consume-after-loop' variant agrees HERE (the miscompile never
    reproduced on CPU).  If either assertion flips after a JAX upgrade, the
    workaround needs re-evaluation on real hardware — see
    parallel/ring_nn.py:13-18 before deleting it.
    """
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from icp_tpu.ops.nn import nearest_neighbors
    from icp_tpu.parallel.mesh import POINT_AXIS
    from icp_tpu.parallel.ring_nn import ring_nearest_neighbors

    mesh = make_mesh(data=1, points=8)
    n_shards, shard_m = 8, 8
    base = rng.uniform(-1, 1, (8, 2)).astype(np.float32)
    targets = jnp.asarray(np.tile(base, (8, 1)))  # exact duplicates across shards
    query = jnp.asarray(np.repeat(base, 4, axis=0)[:32])  # ties everywhere
    mask = jnp.ones((64,), dtype=bool)

    exp_sq, exp_idx = nearest_neighbors(query, targets, mask)
    good_sq, good_idx = ring_nearest_neighbors(query, targets, mask, mesh)
    np.testing.assert_array_equal(np.asarray(good_idx), np.asarray(exp_idx))
    np.testing.assert_array_equal(np.asarray(good_sq), np.asarray(exp_sq))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(POINT_AXIS, None), P(POINT_AXIS, None), P(POINT_AXIS)),
        out_specs=(P(POINT_AXIS), P(POINT_AXIS)),
        check_vma=False,
    )
    def p_minus_one_variant(q_local, tgt_local, mask_local):
        me = jax.lax.axis_index(POINT_AXIS).astype(jnp.int32)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def fold(step, best, tgt_cur, mask_cur):
            best_sq, best_idx = best
            owner = jnp.mod(me - step, n_shards)
            sq, idx = nearest_neighbors(q_local, tgt_cur, mask_cur)
            gidx = idx + owner * shard_m
            better = (sq < best_sq) | ((sq == best_sq) & (gidx < best_idx))
            return jnp.where(better, sq, best_sq), jnp.where(better, gidx, best_idx)

        def body(step, carry):
            best, tgt_cur, mask_cur = carry
            best = fold(step, best, tgt_cur, mask_cur)
            return (
                best,
                jax.lax.ppermute(tgt_cur, POINT_AXIS, perm),
                jax.lax.ppermute(mask_cur, POINT_AXIS, perm),
            )

        init = (
            jnp.full((q_local.shape[0],), jnp.inf, dtype=q_local.dtype),
            jnp.full((q_local.shape[0],), jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
        )
        best, tgt_cur, mask_cur = jax.lax.fori_loop(
            0, n_shards - 1, body, (init, tgt_local, mask_local)
        )
        # The shape that miscompiled on TPU: one fold on the loop-carried
        # ppermute output AFTER the loop.
        return fold(n_shards - 1, best, tgt_cur, mask_cur)

    b_sq, b_idx = p_minus_one_variant(query, targets, mask)
    assert bool(jnp.all(b_idx == exp_idx)) and bool(jnp.all(b_sq == exp_sq)), (
        "P-1 ring variant no longer agrees on CPU — JAX behavior changed; "
        "re-verify the ring_nn workaround on hardware (ring_nn.py:13-18)"
    )


def test_comm_census_attributes_loop_collectives(rng):
    """The HLO collective census (scripts/scaling_bench.py) correctly
    splits per-call vs per-while-iteration collectives and sizes them —
    pinned on a tiny program so an HLO text-format change in a JAX upgrade
    is caught here, not in a silent all-zeros scaling table."""
    import importlib.util
    import os as _os

    import jax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    spec = importlib.util.spec_from_file_location(
        "scaling_bench",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "scripts", "scaling_bench.py"),
    )
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)

    mesh = make_mesh(data=1, points=8)

    def kernel(x):
        def body(_, c):
            return jax.lax.psum(c, "points")  # f32[16] all-reduce per iter

        y = jax.lax.fori_loop(0, 4, body, x)
        return jax.lax.psum(y, "points")  # one more per call

    fn = shard_map(
        kernel, mesh=mesh, in_specs=P("points"), out_specs=P(),
        check_vma=False,
    )
    compiled = jax.jit(fn).lower(jnp.ones((128,), jnp.float32)).compile()
    stats = sb.collective_stats(compiled.as_text())
    assert stats["per_iteration_bytes"].get("all-reduce", 0) == 16 * 4
    assert stats["per_call_bytes"].get("all-reduce", 0) == 16 * 4
