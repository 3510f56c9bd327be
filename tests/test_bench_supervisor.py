"""bench.py wedge-proof supervisor (VERDICT r3 next-1).

The supervisor must: forward the inner process's JSON metric line on
success, retry on failure/timeout in a FRESH process, kill the whole child
process group on timeout, and return nonzero when every attempt fails.
Exercised against fake inner scripts — no TPU needed.
"""

import subprocess
import sys
import textwrap
from pathlib import Path


def _fake_script(tmp_path: Path, body: str) -> Path:
    p = tmp_path / "fake_bench.py"
    p.write_text(textwrap.dedent("""\
        import json, os, sys, time
        args = sys.argv[1:]
        assert args[0] == "--inner", args
        """) + textwrap.dedent(body))
    return p


def test_supervisor_forwards_json_on_success(tmp_path, capsys):
    sys.path.insert(0, "/root/repo")
    import bench

    script = _fake_script(tmp_path, """\
        print("[noise] calibrating", file=sys.stderr)
        print("not json")
        print(json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                          "vs_baseline": 0.1}))
    """)
    rc = bench._supervise(["--config", "quality"], attempts=1, timeout_s=30,
                          script=script)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json
    doc = json.loads(out)
    assert doc["metric"] == "m" and doc["value"] == 1.0


def test_supervisor_retries_then_succeeds(tmp_path, capsys):
    import bench

    marker = tmp_path / "attempted"
    script = _fake_script(tmp_path, f"""\
        m = r"{marker}"
        if not os.path.exists(m):
            open(m, "w").write("x")
            sys.exit(1)          # first attempt: crash
        print(json.dumps({{"metric": "m", "value": 2.0}}))
    """)
    rc = bench._supervise([], attempts=2, timeout_s=30, script=script)
    assert rc == 0
    assert '"value": 2.0' in capsys.readouterr().out


def test_supervisor_times_out_and_fails(tmp_path):
    import time

    import bench

    script = _fake_script(tmp_path, """\
        time.sleep(60)           # simulates a wedged relay hang
    """)
    t0 = time.time()
    rc = bench._supervise([], attempts=2, timeout_s=2, script=script,
                          cpu_fallback=False)
    assert rc == 1
    # two attempts x 2 s + kill/cleanup slack, not the 60 s sleep
    assert time.time() - t0 < 40


def test_supervisor_cpu_fallback_forwards_labeled_json(tmp_path, capsys):
    """TPU attempts exhausted -> one clearly-labeled CPU-fallback attempt.

    The fallback exists so a down (not merely wedged) relay still yields a
    recorded number for the round (BENCH_r03 was lost to rc=1)."""
    import json

    import bench

    script = _fake_script(tmp_path, """\
        if "--cpu-fallback" in args:
            assert os.environ.get("JAX_PLATFORMS") == "cpu"
            print(json.dumps({"metric": "m", "value": 3.0,
                              "unit": "rays/s (cpu-fallback)"}))
        else:
            sys.exit(1)          # chip unreachable
    """)
    rc = bench._supervise([], attempts=2, timeout_s=30, script=script)
    assert rc == 0
    doc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["value"] == 3.0 and "cpu-fallback" in doc["unit"]


def test_stale_relay_pid_parser_skips_self():
    import bench

    pids = bench._stale_relay_pids()
    import os

    assert os.getpid() not in pids


def test_bench_calibration_single_compile_path():
    """bench._calibrate_sample_l after the r5 rewrite: trial sample_l rides
    the traced fineness (one compiled program), and the result still fills
    the budget to ~the target fraction on a real tiny octree."""
    import numpy as np

    import bench
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import octree_to_device
    from gfnerf_tpu.utils.synthetic import ring_cameras

    n, w, h = 8, 32, 24
    c2w, fx, fy, cx, cy, w, h = ring_cameras(n, img_wh=(w, h))
    intri = np.zeros((n, 3, 3), np.float32)
    intri[:, 0, 0] = fx; intri[:, 1, 1] = fy
    intri[:, 0, 2] = cx; intri[:, 1, 2] = cy; intri[:, 2, 2] = 1
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (n, 1))
    tree = build_octree(c2w, intri, bounds, max_depth=5, bbox_levels=3,
                        n_rand_pts=512, vis_res_w=16, seed=0)
    oct_dev = octree_to_device(tree, capacity=4096)

    S = 64
    sample_l = bench._calibrate_sample_l(tree, oct_dev, c2w, fx, fy, cx, cy,
                                         w, h, S, n_rays=64)
    assert np.isfinite(sample_l) and sample_l >= 1.0 / 256


def test_last_chip_result_picks_newest_real_chip_line(tmp_path):
    """The CPU fallback's context field: newest plain-"rays/s" chip JSON
    wins; cpu-fallback lines and non-bench JSON are ignored."""
    import json
    import os

    import bench

    old = tmp_path / "bench_old.log"
    old.write_text(json.dumps({
        "metric": "train_rays_per_sec_per_chip", "value": 100.0,
        "unit": "rays/s", "vs_baseline": 0.001}) + "\n")
    new = tmp_path / "bench_new.log"
    new.write_text(
        "noise line\n" + json.dumps({
            "metric": "train_rays_per_sec_per_chip", "value": 9000.0,
            "unit": "rays/s", "vs_baseline": 0.072}) + "\n")
    fb = tmp_path / "bench_fallback.log"
    fb.write_text(json.dumps({
        "metric": "train_rays_per_sec_per_chip", "value": 50.0,
        "unit": "rays/s (cpu-fallback: tpu relay unreachable)",
        "vs_baseline": 0.0004}) + "\n")
    now = 1_700_000_000
    os.utime(old, (now - 100, now - 100))
    os.utime(new, (now, now))
    os.utime(fb, (now + 50, now + 50))

    r = bench._last_chip_result(tmp_path)
    assert r == {"value": 9000.0, "vs_baseline": 0.072,
                 "source_log": "bench_new.log"}


def test_last_chip_result_empty_dir(tmp_path):
    import bench

    assert bench._last_chip_result(tmp_path) is None
