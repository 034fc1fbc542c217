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

Trust boundary (round-3 hardening — VERDICT round-2 item 7): a PJRT
executable image is CODE, and ``deserialize_and_load`` internally unpickles
its payload, so a writable cache directory must be treated like a writable
``site-packages``.  Three layers keep tampered entries from ever reaching
the deserializer:

1. every entry is authenticated with HMAC-SHA256 under a per-user key
   (``~/.config/icp_tpu/aot.key``, created ``0600``; override with
   ``$ICP_TPU_AOT_KEY_FILE``) — the MAC is verified over the raw bytes
   BEFORE any parsing, and a mismatch discards the entry and recompiles;
2. the input/output pytree structures are never read from disk at all —
   they are re-derived from the locally traced program (``lowered.in_tree``
   / ``out_tree``), so the envelope contains no structured objects, only a
   JSON header and the opaque payload;
3. the default cache directory is created ``0700``.

Sharing a cache directory across users therefore requires sharing the key
file; without it, foreign entries are simply recompiled over.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import secrets
import struct
import tempfile
import warnings

import jax

__all__ = ["AotCache", "cached_jit", "default_cache_dir"]

_ENV_DIR = "ICP_TPU_AOT_CACHE"
_ENV_KEY_FILE = "ICP_TPU_AOT_KEY_FILE"
_FORMAT_VERSION = 2
_MAGIC = b"ICPTPU_AOT2\n"


def default_cache_dir() -> str:
    """Cache directory: ``$ICP_TPU_AOT_CACHE`` or ``~/.cache/icp_tpu/aot``."""
    env = os.environ.get(_ENV_DIR)
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "icp_tpu", "aot")


def _default_key_file() -> str:
    env = os.environ.get(_ENV_KEY_FILE)
    if env:
        return env
    base = os.environ.get("XDG_CONFIG_HOME", os.path.expanduser("~/.config"))
    return os.path.join(base, "icp_tpu", "aot.key")


def _mac_key() -> bytes:
    """Per-user HMAC key, created 0600 on first use.

    Lives OUTSIDE the cache directory (which may be env-pointed somewhere
    shared): an attacker who can write cache entries but not this file
    cannot forge a MAC, so their entries are discarded unread.
    """
    path = _default_key_file()
    try:
        with open(path, "rb") as f:
            key = f.read()
        if len(key) >= 16:
            return key
    except FileNotFoundError:
        pass
    key = secrets.token_bytes(32)
    os.makedirs(os.path.dirname(path), mode=0o700, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        os.fchmod(fd, 0o600)
        with os.fdopen(fd, "wb") as f:
            f.write(key)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return key


def _backend_tag() -> str:
    dev = jax.devices()[0]
    return f"{dev.platform}:{getattr(dev, 'device_kind', '?')}:n{jax.device_count()}"


def _fingerprint(lowered) -> str:
    """Content hash of the lowered program + everything that affects codegen."""
    h = hashlib.sha256()
    h.update(f"v{_FORMAT_VERSION}|jax={jax.__version__}|{_backend_tag()}|".encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


def _pack_entry(header: dict, payload: bytes) -> bytes:
    head = json.dumps(header, sort_keys=True).encode()
    body = _MAGIC + struct.pack("<I", len(head)) + head + payload
    mac = hmac.new(_mac_key(), body, hashlib.sha256).digest()
    return body + mac


def _unpack_entry(blob: bytes) -> tuple[dict, bytes]:
    """MAC-verify, then parse.  Raises ``ValueError`` on any mismatch —
    nothing in the blob is interpreted before the MAC passes."""
    if len(blob) < len(_MAGIC) + 4 + 32 or not blob.startswith(_MAGIC):
        raise ValueError("not an icp_tpu AOT entry")
    body, mac = blob[:-32], blob[-32:]
    expect = hmac.new(_mac_key(), body, hashlib.sha256).digest()
    if not hmac.compare_digest(mac, expect):
        raise ValueError("MAC mismatch (tampered or foreign-key entry)")
    off = len(_MAGIC)
    (head_len,) = struct.unpack_from("<I", body, off)
    off += 4
    header = json.loads(body[off : off + head_len].decode())
    return header, body[off + head_len :]


class AotCache:
    """Disk store of serialized PJRT executables, content-addressed and
    HMAC-authenticated (module docstring: trust boundary)."""

    def __init__(self, directory: str | None = None):
        self.directory = directory or default_cache_dir()
        # Telemetry for tests and `cli bench --verbose`.
        self.hits = 0
        self.misses = 0
        self.errors = 0

    def _path(self, fingerprint: str) -> str:
        return os.path.join(self.directory, f"{fingerprint}.aot")

    def load(self, fingerprint: str, in_tree, out_tree):
        """Deserialize a cached executable, or ``None`` on miss/corruption.

        ``in_tree``/``out_tree`` come from the CALLER's locally traced
        program (``lowered.in_tree``/``out_tree``) — the disk entry never
        supplies pytree structure, so a tampered entry cannot smuggle
        objects through the tree decoder (and a MAC failure discards it
        before the payload reaches jax's deserializer at all).
        """
        path = self._path(fingerprint)
        if not os.path.exists(path):
            self.misses += 1
            return None
        try:
            from jax.experimental.serialize_executable import deserialize_and_load

            with open(path, "rb") as f:
                header, payload = _unpack_entry(f.read())
            # Rebuild the exact device assignment the program was compiled
            # for: a plain jit on a multi-device host compiles for device 0
            # only, and jax 0.9's deserialize defaults to *all* devices,
            # producing "expected N shards" failures on the virtual-mesh CPU
            # backend.  Ids are stable within a process/backend config.
            by_id = {d.id: d for d in jax.devices()}
            devices = [by_id[i] for i in header["device_ids"]]
            compiled = deserialize_and_load(
                payload,
                in_tree,
                out_tree,
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

    def store(self, fingerprint: str, compiled, in_tree, out_tree) -> bool:
        """Serialize ``compiled`` to disk; returns False if unsupported."""
        try:
            from jax.experimental.serialize_executable import serialize

            payload, ser_in, ser_out = serialize(compiled)
            if ser_in != in_tree or ser_out != out_tree:
                # The reload path reconstructs trees from the local trace;
                # if jax's serializer disagrees, caching would corrupt the
                # calling convention — skip rather than risk it.
                warnings.warn(
                    "icp_tpu.aot: lowered tree structure != serialized tree "
                    "structure; entry not cached"
                )
                return False
            header = {
                "format": _FORMAT_VERSION,
                "backend": _backend_tag(),
                "jax": jax.__version__,
                "device_ids": [
                    d.id for d in compiled._executable.xla_executable.local_devices()
                ],
            }
            os.makedirs(self.directory, mode=0o700, exist_ok=True)
            blob = _pack_entry(header, payload)
            fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(blob)
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
        compiled = self.load(fp, lowered.in_tree, lowered.out_tree)
        if compiled is None:
            compiled = lowered.compile()
            self.store(fp, compiled, lowered.in_tree, lowered.out_tree)
        return compiled


def cached_jit(fn, *, cache: AotCache | None = None, directory: str | None = None):
    """``jax.jit`` with a disk-backed executable cache.

    Re-tracing still happens once per process per abstract signature (cheap —
    ~0.3 s for the bench converge), but the XLA compile is skipped whenever a
    matching executable image exists on disk.  Unlike the persistent
    *compilation* cache, a hit never invokes the compiler, so it is immune to
    backend-side cache misses (the round-1 failure mode over the TPU tunnel).

    The wrapped function only supports positional arguments whose leaves are
    arrays or Python/NumPy scalars (what the registration entry points
    take); anything else raises a descriptive ``TypeError``.  The in-process
    memo key abstracts each leaf with ``jax.typeof`` — shape, dtype AND
    weak type — so e.g. a Python-float scalar and a same-shape float32
    array get distinct executables (ADVICE round 2).
    """
    the_cache = cache or AotCache(directory)
    jitted = jax.jit(fn)
    memo: dict = {}

    def signature(args):
        leaves, treedef = jax.tree.flatten(args)
        sig = []
        for i, x in enumerate(leaves):
            try:
                aval = jax.typeof(x)
            except TypeError as e:
                raise TypeError(
                    f"cached_jit argument leaf {i} of type {type(x).__name__} "
                    "is not a JAX-compatible array or scalar"
                ) from e
            sig.append((aval.shape, str(aval.dtype), bool(getattr(aval, "weak_type", False))))
        return (treedef, tuple(sig))

    def wrapper(*args):
        key = signature(args)
        compiled = memo.get(key)
        if compiled is None:
            compiled = the_cache.get_or_compile(jitted.lower(*args))
            memo[key] = compiled
        return compiled(*args)

    wrapper.cache = the_cache  # type: ignore[attr-defined]
    return wrapper
