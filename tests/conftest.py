"""Test configuration: CPU backend with 8 virtual devices and fp64 enabled.

Tests run on the CPU backend so that (a) sharding tests get an 8-device
mesh without TPU hardware (``--xla_force_host_platform_device_count``) and
(b) parity tests against the fp64 NumPy oracle can run in double precision.
Library code is dtype/backend agnostic; the TPU fast path is exercised by
``bench.py`` and ``__graft_entry__.py``.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel),
# which has no fp64 and makes per-test eager dispatch cross the network.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the image's sitecustomize registers the
# axon TPU plugin and pins the platform, so override via jax.config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/ex_data"
LOCAL_DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)), "ex_data")


@pytest.fixture(scope="session")
def ref_data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference example data not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def local_data_dir():
    """The in-repo synthetic datasets (scripts/make_ex_data.py) — always
    available, so standalone checkouts keep full golden/e2e coverage."""
    return LOCAL_DATA


@pytest.fixture
def rng():
    return np.random.default_rng(123)


# XLA:CPU leaks mmap regions per compiled program (~560 for one batched
# converge on the 8-device backend; measured).  A full-suite run crosses the
# kernel's vm.max_map_count default (65530) and segfaults *inside the XLA
# compiler* — deterministically at whichever test issues the ~250th heavy
# compile.  jax.clear_caches() releases the regions (measured 7318 -> 570),
# so drop the executable caches whenever the map count nears the limit;
# the handful of extra recompiles costs a few seconds per run.
_MAP_COUNT_LIMIT = 30_000


def _mmap_region_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no limit to guard
        return 0


@pytest.fixture(autouse=True)
def _xla_mmap_guard():
    yield
    if _mmap_region_count() > _MAP_COUNT_LIMIT:
        jax.clear_caches()
