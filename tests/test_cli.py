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


SEQ1 = os.path.join(REPO, "ex_data", "seq1")
SEQ3D = os.path.join(REPO, "ex_data", "seq3d")


def test_odometry_csv_batch_saves_trajectory(capsys, tmp_path):
    """odometry over plain CSVs (bulk native-loader path) emits one JSON
    record per scan and --save checkpoints the trajectory."""
    save = str(tmp_path / "traj.npz")
    cli.main([
        "odometry", "--scans", f"{DATA}/scan1/first.csv", f"{DATA}/scan1/second.csv",
        "-m", "trimmed", "--save", save,
    ])
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(line) for line in out]
    assert len(recs) == 2
    assert recs[0]["translation"] == [0.0, 0.0]
    assert recs[1]["iterations"] > 0 and np.isfinite(recs[1]["cost"])
    # Pose of scan 1 = inverse of the scan0->scan1 registration transform.
    r = np.asarray(recs[1]["rotation"])
    np.testing.assert_allclose(r @ r.T, np.eye(2), atol=1e-5)
    assert os.path.exists(save)
    from icp_tpu.checkpoint import load_leaves

    rot_leaf, trans_leaf = load_leaves(save)
    assert trans_leaf.shape == (2, 2) and rot_leaf.shape == (2, 2, 2)


def test_odometry_conf_loop_closure_robust(capsys):
    """seq1 .conf sweeps through --optimize --loop-radius with the robust
    kernel: the full flag-plumbing path (sweep parsing, candidate search,
    closure registration, auto robust scale, per-closure weight report)."""
    scans = [os.path.join(SEQ1, f"sweep_{k:03d}.conf") for k in range(0, 12)]
    cli.main([
        "odometry", "--scans", *scans, "-m", "trimmed",
        "--optimize", "--loop-radius", "2.5", "--loop-min-separation", "4",
        "--robust-kernel", "gnc_gm",
        "--max-iterations", "60",
    ])
    captured = capsys.readouterr()
    recs = [json.loads(line) for line in captured.out.strip().splitlines()]
    assert len(recs) == len(scans)
    err = captured.err
    assert "loop closures:" in err
    # 35 closures >= the default mapping threshold: the offline solve
    # upgrades to the two-pass welsch recipe (round 5) and says so.
    assert "robust scale (two-pass welsch" in err
    assert "pose-graph cost:" in err
    assert "loop-closure robust weights:" in err
    # Sweeps advance ~0.4 m/step along +x; the optimized trajectory keeps
    # that structure (flag plumbing, not constants, is what's under test).
    t_last = np.asarray(recs[-1]["translation"])
    assert 3.0 < t_last[0] < 6.0 and abs(t_last[1]) < 0.5


def test_odometry_eval_against_tum(capsys, tmp_path):
    """--eval GT_TUM appends one JSON record with Umeyama ATE + RPE
    (icp_tpu.eval) after the per-scan records; short seq1 odometry is
    centimeter-accurate, so the metrics must come out small but nonzero."""
    import jax.numpy as jnp

    from icp_tpu.geometry import RigidTransform
    from icp_tpu.io.trajectory import write_tum

    n = 8
    with open(os.path.join(SEQ1, "groundtruth.json")) as f:
        gt = np.asarray(json.load(f)["poses"])[:n]
    c, s = np.cos(gt[:, 2]), np.sin(gt[:, 2])
    gt_rt = RigidTransform(
        jnp.asarray(np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)),
        jnp.asarray(gt[:, :2]),
    )
    gt_path = str(tmp_path / "gt.tum")
    write_tum(gt_path, gt_rt)

    scans = [os.path.join(SEQ1, f"sweep_{k:03d}.conf") for k in range(n)]
    cli.main([
        "odometry", "--scans", *scans, "-m", "trimmed",
        "--max-iterations", "150",
        "--angle-tolerance-deg", "1e-4", "--translation-tolerance", "1e-6",
        "--eval", gt_path,
    ])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == n + 1
    rec = json.loads(lines[-1])
    assert rec["eval_against"] == gt_path
    assert 0.0 < rec["ate_rmse"] < 0.05
    assert 0.0 < rec["rpe_trans_rmse"] < 0.05
    assert rec["rpe_delta"] == 1
    assert rec["ate_max"] >= rec["ate_rmse"] >= rec["ate_mean"] * 0.99


def test_odometry_eval_length_mismatch_exits(capsys, tmp_path):
    """--eval with the wrong number of ground-truth lines fails loudly
    (SystemExit), not with a broadcasting surprise."""
    import jax.numpy as jnp

    from icp_tpu.geometry import RigidTransform
    from icp_tpu.io.trajectory import write_tum

    eye = np.broadcast_to(np.eye(2), (3, 2, 2)).copy()
    write_tum(
        str(tmp_path / "bad.tum"),
        RigidTransform(jnp.asarray(eye), jnp.zeros((3, 2))),
    )
    scans = [os.path.join(SEQ1, f"sweep_{k:03d}.conf") for k in range(2)]
    with pytest.raises(SystemExit):
        cli.main([
            "odometry", "--scans", *scans, "-m", "trimmed",
            "--eval", str(tmp_path / "bad.tum"),
        ])


def test_odometry_ply_3d_sequence(capsys):
    """--ply odometry over the bundled 3D sweeps: 3D dispatch, gicp config
    plumbing, SE(3) records."""
    scans = [os.path.join(SEQ3D, f"sweep_{k:03d}.ply") for k in range(3)]
    cli.main([
        "odometry", "--ply", "--scans", *scans, "-m", "gicp",
        "-c", "dim=3", "neighbors=10", "normal_neighbors=10",
        "--max-iterations", "40",
    ])
    recs = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 3
    r = np.asarray(recs[2]["rotation"])
    assert r.shape == (3, 3)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # Steps advance ~0.65 m along the sensor x axis.
    assert 1.0 < recs[2]["translation"][0] < 1.6


def test_bench_argv_statistics(capsys):
    """bench subcommand prints the reference's statistics block
    (bench/bench.cpp:108-142) for the selected method/scan."""
    cli.main([
        "bench", "--methods", "trimmed", "--scans", "1",
        "--invocations", "2", "--data-dir", DATA,
    ])
    out = capsys.readouterr().out
    assert "ICP method: trimmed, scan 1" in out
    for stat in (
        "Number of invocations: 2", "Min cost:", "Max cost:", "Median cost:",
        "Mean cost:", "Min iterations:", "Max iterations:",
        "Average time per invocation:", "Average time per iteration:",
    ):
        assert stat in out, stat


def test_view_animate_html(capsys, tmp_path):
    """view --animate renders frames + assembles the interactive HTML
    viewer (the headless redesign of the SDL SPACE/I/D loop)."""
    frames = str(tmp_path / "frames")
    anim = str(tmp_path / "view.html")
    cli.main([
        "view", *SCAN1, "-m", "trimmed",
        "--out", frames, "--iterations", "4", "--every", "2",
        "--animate", anim, "--log",
    ])
    out = capsys.readouterr().out
    assert "wrote 3 frames" in out
    assert "final cost" in out
    assert "iteration=0" in out  # --log per-iteration dump
    assert os.path.exists(anim)
    html = open(anim).read()
    assert "<html" in html.lower()
    pngs = [f for f in os.listdir(frames) if f.endswith(".png")]
    assert len(pngs) == 3


def test_odometry_online_streaming(capsys):
    """--online drives slam.OnlineSlam scan by scan: one JSON record per
    scan with keyframe/refined/closures fields, plus the finalize summary."""
    scans = [os.path.join(SEQ1, f"sweep_{k:03d}.conf") for k in range(12)]
    cli.main([
        "odometry", "--scans", *scans, "-m", "trimmed", "--online",
        "--loop-radius", "2.5", "--loop-min-separation", "4",
        "--loop-every", "4", "--keyframe-translation", "0.3",
        "--odometry-weight", "100", "--loop-weight", "100",
        "--max-iterations", "60",
    ])
    captured = capsys.readouterr()
    recs = [json.loads(line) for line in captured.out.strip().splitlines()]
    assert len(recs) == len(scans)
    assert recs[0]["keyframe"] is True
    assert all("closures" in r and "refined" in r for r in recs)
    # Straight-line sweeps: the live pose advances ~0.4 m/scan along +x.
    t_last = np.asarray(recs[-1]["translation"])
    assert 3.0 < t_last[0] < 5.0 and abs(t_last[1]) < 0.5
    assert "online slam:" in captured.err


def test_graph_subcommand_optimizes_g2o(capsys, tmp_path):
    """icp-tpu graph: load a g2o file, robust-solve, write g2o + TUM — the
    framework's analogue of the g2o binary."""
    from icp_tpu.io import read_g2o, write_g2o
    from tests.test_robust_posegraph import _square_loop_graph

    rng = np.random.default_rng(7)
    graph, _, _, _ = _square_loop_graph(rng, t_steps=17)
    src_path = str(tmp_path / "in.g2o")
    out_path = str(tmp_path / "out.g2o")
    tum_path = str(tmp_path / "out.tum")
    write_g2o(src_path, graph)

    cli.main([
        "graph", src_path, "-o", out_path, "--tum", tum_path,
        "--robust-kernel", "gnc_gm", "--iterations", "30",
    ])
    captured = capsys.readouterr()
    rec = json.loads(captured.out.strip().splitlines()[-1])
    assert rec["vertices"] == 17 and rec["edges"] == 18
    assert rec["chi2_final"] < 0.1 * rec["chi2_initial"]
    assert "robust scale (auto):" in captured.err
    opt = read_g2o(out_path)
    assert opt.num_nodes == 17
    assert os.path.exists(tum_path)
    assert len(open(tum_path).read().strip().splitlines()) == 17


def test_odometry_csv_descriptor_loop_closure(capsys, tmp_path):
    """--loop-descriptor: Scan Context retrieval + yaw-seeded closure
    registration through the argv surface.  Uses a perceptually
    DISTINCTIVE synthetic loop — appearance retrieval needs one (measured:
    seq1's aliased corridors give revisits no descriptor separation from
    far pairs; see ops/descriptor.py)."""
    import math

    rng = np.random.default_rng(5)
    ang = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    radius = 16.0 + 3.0 * np.sin(3 * ang + 0.4) + 1.5 * np.cos(7 * ang)
    world = np.stack([radius * np.cos(ang), radius * np.sin(ang)], -1)
    t_steps, loop_r = 12, 1.5
    paths = []
    for k in range(t_steps):
        phi = 2 * math.pi * k / (t_steps - 1)
        px, py, th = loop_r * math.cos(phi), loop_r * math.sin(phi), 0.3 * math.sin(phi)
        c, s = np.cos(th), np.sin(th)
        pts = (world - [px, py]) @ np.array([[c, -s], [s, c]])
        pts += rng.normal(0, 0.05, pts.shape)
        p = tmp_path / f"scan_{k:03d}.csv"
        np.savetxt(p, pts, delimiter=",")
        paths.append(str(p))
    cli.main([
        "odometry", "--scans", *paths, "-m", "trimmed",
        "--optimize", "--loop-descriptor", "30",
        "--descriptor-max-distance", "0.2",
        "--loop-min-separation", "8", "--loop-weight", "100",
        "--max-iterations", "50",
    ])
    captured = capsys.readouterr()
    recs = [json.loads(line) for line in captured.out.strip().splitlines()]
    assert len(recs) == t_steps
    assert "loop closures:" in captured.err
    # The loop returns to the start: optimized end pose near identity.
    t_last = np.asarray(recs[-1]["translation"])
    assert np.linalg.norm(t_last) < 0.2, t_last


def test_odometry_online_pipelined(capsys):
    """--online --pipelined streams the same per-scan records (one scan of
    latency internally, drained by flush) and reaches the same count and
    end pose region as the serial stream."""
    scans = [os.path.join(SEQ1, f"sweep_{k:03d}.conf") for k in range(12)]
    cli.main([
        "odometry", "--scans", *scans, "-m", "trimmed", "--online",
        "--pipelined",
        "--loop-radius", "2.5", "--loop-min-separation", "4",
        "--loop-every", "4", "--keyframe-translation", "0.3",
        "--odometry-weight", "100", "--loop-weight", "100",
        "--max-iterations", "60",
    ])
    captured = capsys.readouterr()
    recs = [json.loads(line) for line in captured.out.strip().splitlines()]
    assert len(recs) == len(scans)
    assert recs[0]["keyframe"] is True
    t_last = np.asarray(recs[-1]["translation"])
    assert 3.0 < t_last[0] < 5.0 and abs(t_last[1]) < 0.5
    assert "online slam:" in captured.err
