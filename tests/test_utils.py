"""Utility-layer tests: profiling accounting, metrics logging, native lib."""

import json
import os

import jax.numpy as jnp
import numpy as np

from icp_tpu.utils.metrics import MetricsLogger, null_logger
from icp_tpu.utils.profiling import Timing, nn_roofline, time_fn


def test_nn_roofline_accounting():
    r = nn_roofline(n=1024, m=1024, dim=2, batch=256)
    assert r["flops"] == 256 * 1024 * 1024 * 7
    assert r["bytes"] == 256 * 4 * (1024 * 2 + 1024 * 2 + 2 * 1024)
    assert r["intensity_flops_per_byte"] > 100  # compute-bound op


def test_time_fn_blocks():
    import jax

    f = jax.jit(lambda x: jnp.sum(x * x))
    t = time_fn(f, jnp.arange(1000.0), runs=3)
    assert isinstance(t, Timing)
    assert t.seconds > 0 and t.runs == 3 and t.per_run > 0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path) as log:
        log.log("step", iteration=1, cost=0.5)
        log.log("step", iteration=2, cost=0.25)
    records = [json.loads(line) for line in open(path)]
    assert [r["iteration"] for r in records] == [1, 2]
    assert all(r["event"] == "step" and "t" in r for r in records)


def test_null_logger_noop():
    log = null_logger()
    log.log("anything", x=1)  # must not raise
    log.close()


def test_native_lib_loads_and_matches_python(rng, tmp_path):
    from icp_tpu.utils.native import native_lib

    lib = native_lib()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    # kdtree oracle vs brute force
    targets = rng.uniform(-50, 50, (500, 3))
    queries = rng.uniform(-50, 50, (100, 3))
    idx, d2 = lib.kdtree_nn(targets, queries)
    brute = np.argmin(
        ((queries[:, None, :] - targets[None, :, :]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(idx, brute)


def test_render_trajectory_writes_png(tmp_path, rng):
    import jax.numpy as jnp

    from icp_tpu import geometry
    from icp_tpu.vis import render_trajectory

    t = 6
    poses = geometry.RigidTransform(
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.asarray(rng.uniform(-5, 5, (t, 2))),
    )
    out = tmp_path / "traj.png"
    render_trajectory(str(out), poses)
    assert out.exists() and out.stat().st_size > 1000


def test_render_registration_frames(tmp_path):
    import numpy as np

    import icp_tpu as icp
    from icp_tpu.vis import render_registration

    a = icp.from_points(np.random.default_rng(0).uniform(-5, 5, (30, 2)), dtype=np.float64)
    b = icp.from_points(np.random.default_rng(1).uniform(-5, 5, (30, 2)), dtype=np.float64)
    method = icp.from_method("trimmed", 2)
    dumps = render_registration(
        method, a, b, icp.identity(2, dtype=np.float64),
        out_dir=str(tmp_path), iterations=2, every=1,
    )
    assert len(dumps) == 3
    assert (tmp_path / "frame_0000.png").exists()
    assert (tmp_path / "frame_0002.png").exists()


def test_profiler_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    from icp_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        jax.block_until_ready(jax.jit(lambda x: x * 2)(jnp.arange(8.0)))
    # The profiler writes a plugins/profile tree with at least one artifact.
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), files


def test_lint_gate_clean():
    """The in-tree lint gate (scripts/lint.py) stays green."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "lint.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stdout


def test_lint_citation_checker(tmp_path):
    """The citation checker flags nonexistent files and out-of-range lines.

    Citation accuracy is contractual (CLAUDE.md); round 4 shipped a dangling
    ``bench/main.cpp`` citation that nothing caught mechanically — this pins
    the checker added in round 5.
    """
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "lintmod", os.path.join(repo, "scripts", "lint.py")
    )
    lint = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lint)

    if not os.path.isdir("/root/reference"):
        import pytest

        pytest.skip("reference tree not mounted")

    good = "See ``/root/reference/lib/icp/impl/vanilla.cpp:44-65`` for the SVD."
    assert lint.check_citations("x.py", [good]) == []
    bad_file = "cites ``/root/reference/bench/main.cpp:14-38`` here"  # noqa: fixture
    assert any("nonexistent" in p for p in lint.check_citations("x.py", [bad_file]))
    bad_range = "cites ``/root/reference/lib/icp/impl/vanilla.cpp:4000-4100``"  # noqa: fixture
    assert any("out of range" in p for p in lint.check_citations("x.py", [bad_range]))
    # noqa on the line exempts it in file scans (these fixtures rely on that)
    assert lint.check_citations("x.py", [bad_file + "  # noqa"]) == []
    template = 'path = f"/root/reference/ex_data/scan{i}/first.csv"'
    assert lint.check_citations("x.py", [template]) == []
    bare_dir = "data lives under /root/reference/ex_data (three scan pairs)"
    assert lint.check_citations("x.py", [bare_dir]) == []


def test_site_builder_renders(tmp_path):
    """scripts/gen_site.py renders every doc page with nav + rewritten links."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "gen_site.py"), "--out", str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    index = (tmp_path / "index.html").read_text()
    assert "<nav>" in index and 'href="architecture.html"' in index
    assert (tmp_path / "methods").is_dir()


def test_assemble_animation_gif_and_html(tmp_path, rng):
    """cli view --animate path: frames -> GIF + interactive HTML player."""
    import numpy as np

    import icp_tpu as icp
    from icp_tpu.vis import assemble_animation, render_registration

    pts = rng.uniform(-2, 2, (24, 2))
    src = icp.from_points(pts, capacity=32, dtype=np.float64)
    tgt = icp.from_points(pts + [0.1, -0.05], capacity=32, dtype=np.float64)
    method = icp.from_method("trimmed", 2, icp.Config(overlap_rate=1.0))
    frames = tmp_path / "frames"
    dumps = render_registration(
        method, src, tgt, icp.identity(2, dtype=np.float64),
        out_dir=str(frames), iterations=3,
    )

    gif = assemble_animation(str(frames), str(tmp_path / "out.gif"), dumps, fps=4)
    from PIL import Image

    im = Image.open(gif)
    assert getattr(im, "n_frames", 1) == 4  # iterations+1 frames

    html = assemble_animation(str(frames), str(tmp_path / "out.html"), dumps)
    text = (tmp_path / "out.html").read_text()
    assert '"png"' in text and "Space" in text and '"cost"' in text


def test_bench_docs_in_sync_with_artifact():
    """README/BASELINE bench blocks must be generated from the shipped
    bench_results.json (scripts/sync_bench_docs.py): prose performance
    figures can no longer drift from the artifact (VERDICT round-2 item 6)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "sync_bench_docs.py"),
         "--check"],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stdout + out.stderr
