"""AOT executable cache (`icp_tpu.aot`).

The reference needs no such subsystem (C++ compiles at build time); this is
the TPU-native answer to JAX cold-start cost.  Tests run on the CPU backend,
where PJRT executable serialization is also supported, and cover the CI
cache-hit requirement from VERDICT round-1 item 2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import icp_tpu as icp
from icp_tpu import aot


@pytest.fixture()
def cache_dir(tmp_path):
    return str(tmp_path / "aot")


def _converge_fn(cfg):
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=0.9))
    return lambda s, t, g: icp.converge(method, s, t, g, cfg)


def _problem(b=2, n=64):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (b, n, 2)).astype(np.float32)
    src = icp.PointCloud(jnp.asarray(pts), jnp.full((b,), n, dtype=jnp.int32))
    tgt = icp.PointCloud(jnp.asarray(pts + 0.05), jnp.full((b,), n, dtype=jnp.int32))
    return src, tgt, icp.identity(2, (b,), dtype=jnp.float32)


def test_cached_jit_matches_plain_jit(cache_dir):
    cfg = icp.DriverConfig(max_iterations=8)
    src, tgt, guess = _problem()
    plain, _ = jax.jit(_converge_fn(cfg))(src, tgt, guess)
    cached_fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    got, _ = cached_fn(src, tgt, guess)
    np.testing.assert_array_equal(
        np.asarray(plain.transform.translation), np.asarray(got.transform.translation)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.transform.rotation), np.asarray(got.transform.rotation)
    )


def test_disk_hit_skips_compile(cache_dir):
    """Second cold process (simulated by a fresh wrapper) must hit the disk."""
    cfg = icp.DriverConfig(max_iterations=4)
    src, tgt, guess = _problem()

    first = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    first(src, tgt, guess)
    assert first.cache.misses == 1 and first.cache.hits == 0

    second = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    r2, _ = second(src, tgt, guess)
    assert second.cache.hits == 1 and second.cache.misses == 0
    assert bool(jnp.all(jnp.isfinite(r2.transform.translation)))


def test_same_shape_memoized_in_process(cache_dir):
    calls = []
    cfg = icp.DriverConfig(max_iterations=2)
    src, tgt, guess = _problem()
    fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    orig = fn.cache.get_or_compile

    def counting(lowered):
        calls.append(1)
        return orig(lowered)

    fn.cache.get_or_compile = counting
    fn(src, tgt, guess)
    fn(src, tgt, guess)
    assert len(calls) == 1  # one lower+lookup per abstract signature


def test_shape_change_is_new_entry(cache_dir):
    cfg = icp.DriverConfig(max_iterations=2)
    fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    fn(*_problem(b=2, n=64))
    fn(*_problem(b=4, n=64))
    assert fn.cache.misses == 2  # distinct shapes -> distinct fingerprints


def test_corrupt_entry_falls_back_to_compile(cache_dir):
    cfg = icp.DriverConfig(max_iterations=2)
    src, tgt, guess = _problem()
    fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    fn(src, tgt, guess)

    import os

    (entry,) = [p for p in os.listdir(cache_dir) if p.endswith(".aot")]
    with open(os.path.join(cache_dir, entry), "wb") as f:
        f.write(b"garbage")

    fresh = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    with pytest.warns(UserWarning, match="discarding unreadable"):
        result, _ = fresh(src, tgt, guess)
    assert fresh.cache.errors == 1
    assert bool(jnp.all(jnp.isfinite(result.transform.translation)))
    # the rewritten entry must be loadable again
    again = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    again(src, tgt, guess)
    assert again.cache.hits == 1


def test_program_change_is_new_fingerprint(cache_dir):
    src, tgt, guess = _problem()
    a = aot.cached_jit(_converge_fn(icp.DriverConfig(max_iterations=2)), directory=cache_dir)
    b = aot.cached_jit(_converge_fn(icp.DriverConfig(max_iterations=3)), directory=cache_dir)
    a(src, tgt, guess)
    b(src, tgt, guess)  # different unrolled program -> no false hit
    assert b.cache.misses == 1 and b.cache.hits == 0


def test_tampered_entry_is_rejected_before_deserialization(cache_dir):
    """Flipping one byte anywhere in an entry fails the HMAC and the entry
    is discarded + recompiled — the payload never reaches jax's (pickle-
    based) deserializer (VERDICT round-2 item 7)."""
    import os

    cfg = icp.DriverConfig(max_iterations=2)
    src, tgt, guess = _problem()
    fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    expected, _ = fn(src, tgt, guess)

    (entry,) = [p for p in os.listdir(cache_dir) if p.endswith(".aot")]
    path = os.path.join(cache_dir, entry)
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF  # one bit-flip mid-payload
    open(path, "wb").write(bytes(blob))

    fresh = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    with pytest.warns(UserWarning, match="MAC mismatch"):
        result, _ = fresh(src, tgt, guess)
    assert fresh.cache.errors == 1
    np.testing.assert_array_equal(
        np.asarray(result.transform.translation),
        np.asarray(expected.transform.translation),
    )


def test_foreign_key_entry_is_rejected(cache_dir, tmp_path, monkeypatch):
    """An entry written under a DIFFERENT user's key (attacker without our
    key file) fails the MAC on load: cache sharing requires key sharing."""
    import os

    cfg = icp.DriverConfig(max_iterations=2)
    src, tgt, guess = _problem()

    attacker_key = tmp_path / "attacker.key"
    monkeypatch.setenv("ICP_TPU_AOT_KEY_FILE", str(attacker_key))
    fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    fn(src, tgt, guess)  # entry MAC'd under the attacker key
    assert attacker_key.exists()
    assert (os.stat(attacker_key).st_mode & 0o777) == 0o600

    our_key = tmp_path / "ours.key"
    monkeypatch.setenv("ICP_TPU_AOT_KEY_FILE", str(our_key))
    victim = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    with pytest.warns(UserWarning, match="MAC mismatch"):
        result, _ = victim(src, tgt, guess)
    assert victim.cache.errors == 1
    assert bool(jnp.all(jnp.isfinite(result.transform.translation)))


def test_cache_dir_created_private(cache_dir):
    import os

    cfg = icp.DriverConfig(max_iterations=2)
    fn = aot.cached_jit(_converge_fn(cfg), directory=cache_dir)
    fn(*_problem())
    assert (os.stat(cache_dir).st_mode & 0o777) == 0o700


def test_non_array_leaf_raises_descriptive_type_error(cache_dir):
    fn = aot.cached_jit(lambda x: x, directory=cache_dir)
    with pytest.raises(TypeError, match="leaf 0 of type str"):
        fn("not an array")


def test_weak_type_scalars_get_distinct_memo_entries(cache_dir):
    """A Python scalar (weak-typed) and a committed-dtype array of the same
    shape must not share one executable (ADVICE round 2)."""
    calls = []
    fn = aot.cached_jit(lambda x: x * 2.0, directory=cache_dir)
    orig = fn.cache.get_or_compile

    def counting(lowered):
        calls.append(1)
        return orig(lowered)

    fn.cache.get_or_compile = counting
    a = fn(2.0)  # weak-typed python float
    b = fn(jnp.float32(2.0))  # committed float32
    assert len(calls) == 2
    assert float(a) == float(b) == 4.0
