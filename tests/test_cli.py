"""End-to-end CLI tests, in-process via ``cli.main(argv)``.

The CLI is the framework's analogue of the reference's executables
(``vis/main.cpp``, ``bench/bench.cpp``); these tests drive the user-facing
argv surface rather than the library functions behind it.  Scan data: the
reference pair when the checkout is present, else the bundled ``ex_data``.
"""

import json
import os

import numpy as np
import pytest

from icp_tpu import cli

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = (
    "/root/reference/ex_data"
    if os.path.isdir("/root/reference/ex_data")
    else os.path.join(REPO, "ex_data")
)
SCAN1 = [
    "-S", f"{DATA}/scan1/first.csv",
    "-D", f"{DATA}/scan1/second.csv",
]


def _register(capsys, *extra):
    cli.main(["register", *SCAN1, "-m", "trimmed", "--json", *extra])
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_register_json_pose(capsys):
    """scan1 trimmed at CLI defaults converges to the known pose
    (the verify recipe's expected translation ~[-0.0086, 0.0400])."""
    out = _register(capsys)
    assert out["method"] == "trimmed"
    np.testing.assert_allclose(
        out["translation"], [-0.0086, 0.0400], atol=2e-3
    )
    r = np.asarray(out["rotation"])
    np.testing.assert_allclose(r @ r.T, np.eye(2), atol=1e-5)


def test_register_bucketed_capacity_default_matches_exact(capsys):
    """Power-of-two bucketing (default) must not change the result."""
    bucketed = _register(capsys)
    exact = _register(capsys, "--exact-capacity")
    np.testing.assert_allclose(
        bucketed["translation"], exact["translation"], atol=1e-5
    )
    assert bucketed["iterations"] == exact["iterations"]


def test_register_multiscale_aot_cache_compose(capsys, tmp_path):
    """--multiscale and --aot-cache compose; the second run hits the cache
    (one entry, same pose)."""
    cache = str(tmp_path / "aot")
    first = _register(capsys, "--multiscale", "--aot-cache", cache)
    entries = os.listdir(cache)
    assert len(entries) == 1
    again = _register(capsys, "--multiscale", "--aot-cache", cache)
    assert os.listdir(cache) == entries
    np.testing.assert_allclose(again["translation"], first["translation"])


def test_register_unknown_method_lists_registry(capsys):
    """Unknown method exits 1 and prints the registry
    (``vis/main.cpp:133-139``)."""
    with pytest.raises(SystemExit) as exc:
        cli.main(["register", *SCAN1, "-m", "nope"])
    assert exc.value.code == 1
    err = capsys.readouterr().err
    assert "unknown ICP method" in err and "trimmed" in err


def test_methods_lists_both_dims(capsys):
    cli.main(["methods"])
    out = capsys.readouterr().out
    for name in ("vanilla", "trimmed", "feature_aware", "gicp"):
        assert name in out


def test_register_config_override(capsys):
    """-c key=value reaches the method config (overlap 1.0 ~ vanilla-like
    full matching changes the iteration count vs the 0.9 default)."""
    default = _register(capsys)
    full = _register(capsys, "-c", "overlap_rate=1.0")
    assert full["iterations"] != default["iterations"]
