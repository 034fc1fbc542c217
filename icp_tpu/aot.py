"""Ahead-of-time (AOT) executable cache — cold-start elimination.

The reference is a C++ library: its "compile" happens once at build time, so
``driver.converge`` starts in microseconds (``include/icp/driver.h:51-72``).
The JAX equivalent pays an XLA compile on first use of each (method, shape)
program — on hosted TPU backends with a remote compile service that can be
minutes for the batched converge while-loop.  JAX's persistent compilation
cache helps within one toolchain, but the strongest lever is PJRT
*executable serialization*: compile once, write the loaded-executable image
to disk, and every later process deserializes and runs with **no compiler in
the loop at all**.

Measured on the real TPU chip (round 2, ``scripts/compile_time_probe.py``,
B=256 trimmed converge): cold trace+compile+first-run ≈ 29 s; serialized
image 9.2 MB; ``deserialize_and_load`` 0.034 s; first run of the reloaded
executable 0.17 s and bit-identical results.  See BASELINE.md
"Compile-time attack" for the full table.

Usage::

    converge = aot.cached_jit(
        lambda s, t, g: icp.converge(method, s, t, g, cfg))
    result, state = converge(source, target, guess)   # disk-cached per shape

Cache keys are content-addressed: SHA-256 over the lowered StableHLO text
plus the JAX version, platform, and device kind, so *any* change to the
traced program (method code, shapes, dtypes, driver config) produces a new
entry, and an image is never loaded onto a backend it was not compiled for.
Corrupt or incompatible entries fall back to a normal compile and are
rewritten.  Entries are written atomically (tmp + rename) so concurrent
processes can share a cache directory.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import warnings

import jax

__all__ = ["AotCache", "cached_jit", "default_cache_dir"]

_ENV_DIR = "ICP_TPU_AOT_CACHE"
_FORMAT_VERSION = 1


def default_cache_dir() -> str:
    """Cache directory: ``$ICP_TPU_AOT_CACHE`` or ``~/.cache/icp_tpu/aot``."""
    env = os.environ.get(_ENV_DIR)
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "icp_tpu", "aot")


def _backend_tag() -> str:
    dev = jax.devices()[0]
    return f"{dev.platform}:{getattr(dev, 'device_kind', '?')}:n{jax.device_count()}"


def _fingerprint(lowered) -> str:
    """Content hash of the lowered program + everything that affects codegen."""
    h = hashlib.sha256()
    h.update(f"v{_FORMAT_VERSION}|jax={jax.__version__}|{_backend_tag()}|".encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


class AotCache:
    """Disk store of serialized PJRT executables, content-addressed."""

    def __init__(self, directory: str | None = None):
        self.directory = directory or default_cache_dir()
        # Telemetry for tests and `cli bench --verbose`.
        self.hits = 0
        self.misses = 0
        self.errors = 0

    def _path(self, fingerprint: str) -> str:
        return os.path.join(self.directory, f"{fingerprint}.aot")

    def load(self, fingerprint: str):
        """Deserialize a cached executable, or ``None`` on miss/corruption."""
        path = self._path(fingerprint)
        if not os.path.exists(path):
            self.misses += 1
            return None
        try:
            from jax.experimental.serialize_executable import deserialize_and_load

            with open(path, "rb") as f:
                entry = pickle.load(f)
            # Rebuild the exact device assignment the program was compiled
            # for: a plain jit on a multi-device host compiles for device 0
            # only, and jax 0.9's deserialize defaults to *all* devices,
            # producing "expected N shards" failures on the virtual-mesh CPU
            # backend.  Ids are stable within a process/backend config.
            by_id = {d.id: d for d in jax.devices()}
            devices = [by_id[i] for i in entry["device_ids"]]
            compiled = deserialize_and_load(
                entry["payload"],
                entry["in_tree"],
                entry["out_tree"],
                execution_devices=devices,
            )
            self.hits += 1
            return compiled
        except Exception as e:  # noqa: BLE001 - any failure means "recompile"
            self.errors += 1
            warnings.warn(f"icp_tpu.aot: discarding unreadable cache entry: {e}")
            try:
                os.remove(path)
            except OSError:
                pass
            return None

    def store(self, fingerprint: str, compiled) -> bool:
        """Serialize ``compiled`` to disk; returns False if unsupported."""
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            entry = {
                "format": _FORMAT_VERSION,
                "backend": _backend_tag(),
                "jax": jax.__version__,
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "device_ids": [
                    d.id for d in compiled._executable.xla_executable.local_devices()
                ],
            }
            os.makedirs(self.directory, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    pickle.dump(entry, f)
                os.replace(tmp, self._path(fingerprint))
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)
            return True
        except Exception as e:  # noqa: BLE001 - serialization is best-effort
            self.errors += 1
            warnings.warn(f"icp_tpu.aot: could not serialize executable: {e}")
            return False

    def get_or_compile(self, lowered):
        """The core path: disk hit -> deserialize; miss -> compile + store."""
        fp = _fingerprint(lowered)
        compiled = self.load(fp)
        if compiled is None:
            compiled = lowered.compile()
            self.store(fp, compiled)
        return compiled


def cached_jit(fn, *, cache: AotCache | None = None, directory: str | None = None):
    """``jax.jit`` with a disk-backed executable cache.

    Re-tracing still happens once per process per abstract signature (cheap —
    ~0.3 s for the bench converge), but the XLA compile is skipped whenever a
    matching executable image exists on disk.  Unlike the persistent
    *compilation* cache, a hit never invokes the compiler, so it is immune to
    backend-side cache misses (the round-1 failure mode over the TPU tunnel).

    The wrapped function only supports positional array/pytree arguments
    (what the registration entry points take).
    """
    the_cache = cache or AotCache(directory)
    jitted = jax.jit(fn)
    memo: dict = {}

    def signature(args):
        leaves, treedef = jax.tree.flatten(args)
        return (treedef, tuple((x.shape, str(x.dtype)) for x in leaves))

    def wrapper(*args):
        key = signature(args)
        compiled = memo.get(key)
        if compiled is None:
            compiled = the_cache.get_or_compile(jitted.lower(*args))
            memo[key] = compiled
        return compiled(*args)

    wrapper.cache = the_cache  # type: ignore[attr-defined]
    return wrapper
