#!/usr/bin/env python
"""Mid-scale end-to-end CLI exercise (VERDICT r2 item 6).

Drives the real user surface — ``scripts/train.py gf-nerf`` on a generated
nerfstudio-format dataset — at a size that exercises what the smoke tests
cannot: >= 2 milestone octree rebuilds, 4 focal blocks, a checkpoint
kill/resume mid-focal (SIGTERM of the process group, then --load-dir), and
``scripts/eval.py`` at the end.  Reference flow: SURVEY.md section 3.1-3.2
(train -> ckpt -> eval on the gfnerf method).

Artifacts land in results/midscale/: train logs for both phases, the eval
json, and a summary json recording rebuild events and the resume step.

Usage: python scripts/midscale_run.py [--fast] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_nerfstudio_scene(out: Path, n_cams=96, img_wh=(200, 150)):
    """Textured synthetic scene written in nerfstudio format
    (images/ + transforms.json, the reference's native capture layout)."""
    import imageio.v2 as imageio

    from gfnerf_tpu.utils.synthetic import render_textured_scene, ring_cameras

    rings = [
        dict(radius=4.0, height=1.2, focal=140.0),
        dict(radius=5.5, height=2.4, focal=140.0),
        dict(radius=7.0, height=3.8, focal=140.0),
    ]
    per = n_cams // len(rings)
    c2ws, fxs, fys, cxs, cys = [], [], [], [], []
    for r in rings:
        c2w, fx, fy, cx, cy, w, h = ring_cameras(
            per, radius=r["radius"], height=r["height"], img_wh=img_wh,
            focal=r["focal"])
        c2ws.append(c2w); fxs.append(fx); fys.append(fy)
        cxs.append(cx); cys.append(cy)
    c2w = np.concatenate(c2ws)
    fx = np.concatenate(fxs); fy = np.concatenate(fys)
    cx = np.concatenate(cxs); cy = np.concatenate(cys)
    imgs = render_textured_scene(c2w, fx, fy, cx, cy, w, h)

    (out / "images").mkdir(parents=True, exist_ok=True)
    frames = []
    for i in range(len(imgs)):
        name = f"images/frame_{i:05d}.png"
        imageio.imwrite(out / name,
                        (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
        m = np.eye(4)
        m[:3, :4] = c2w[i]
        frames.append({
            "file_path": name,
            "transform_matrix": m.tolist(),
            "fl_x": float(fx[i]), "fl_y": float(fy[i]),
            "cx": float(cx[i]), "cy": float(cy[i]),
            "w": int(w), "h": int(h),
        })
    (out / "transforms.json").write_text(json.dumps(
        {"camera_model": "OPENCV", "frames": frames}, indent=1))
    return len(imgs)


def launch(cmd, log_path):
    """Launch in its own session (os.setsid) so a later group-kill reaps
    every child — an orphaned worker process keeps the accelerator relay
    port open and wedges all later jobs (PERF_NOTES.md relay notes)."""
    log = open(log_path, "w")
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO, preexec_fn=os.setsid)


def kill_group(proc):
    try:
        os.killpg(proc.pid, signal.SIGTERM)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait(timeout=20)
    except ProcessLookupError:
        pass


def last_step(log_path: Path):
    if not log_path.exists():
        return -1
    steps = re.findall(r"\[step\s+(\d+)\]", log_path.read_text())
    return int(steps[-1]) if steps else -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=REPO / "results/midscale")
    ap.add_argument("--scene-dir", type=Path,
                    default=Path("/tmp/midscale_scene"))
    ap.add_argument("--init-steps", type=int, default=1500)
    ap.add_argument("--split-steps", type=int, default=500)
    ap.add_argument("--n-cams", type=int, default=96)
    ap.add_argument("--img-wh", default="200x150",
                    help="scene image size WxH (rehearsals shrink this)")
    ap.add_argument("--fast", action="store_true",
                    help="tiny steps for a plumbing-only dry run")
    args = ap.parse_args()
    if args.fast:  # shrink only knobs the user left at their defaults
        if args.init_steps == 1500:
            args.init_steps = 200
        if args.split_steps == 500:
            args.split_steps = 80

    out = args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    if not (args.scene_dir / "transforms.json").exists():
        print("building nerfstudio scene ...", flush=True)
        w, h = (int(v) for v in args.img_wh.split("x"))
        n = build_nerfstudio_scene(args.scene_dir, n_cams=args.n_cams,
                                   img_wh=(w, h))
        print(f"wrote {n} frames to {args.scene_dir}", flush=True)

    n_blocks = 4
    total = args.init_steps + n_blocks * args.split_steps
    save_every = max(args.split_steps // 2, 50)
    # kill mid-focal: inside block 1 of 4
    kill_at = args.init_steps + args.split_steps + args.split_steps // 2
    run_dir = Path("/tmp/midscale_out")
    exp = "midscale"

    common = [
        sys.executable, "scripts/train.py", "gf-nerf",
        "--data", str(args.scene_dir),
        "--dataparser", "nerfstudio",
        "--output-dir", str(run_dir),
        "--experiment-name", exp,
        "--max-num-iterations", str(total),
        "--vis", "local",
        # sized to trigger >= 2 milestone rebuilds during init
        "--pipeline.model.n_blocks", str(n_blocks),
        "--pipeline.model.n_split_dataset", str(n_blocks),
        "--pipeline.model.steps_perssampler_init", str(args.init_steps),
        "--pipeline.model.steps_per_split_dataset", str(args.split_steps),
        "--pipeline.model.scale_factor", "1.0",
        "--pipeline.datamanager.n_split_dataset", str(n_blocks),
        "--pipeline.datamanager.steps_per_split_dataset",
        str(args.split_steps),
        "--pipeline.datamanager.steps_perssampler_init",
        str(args.init_steps),
        "--pipeline.optimizers.n_split_dataset", str(n_blocks),
        "--pipeline.optimizers.steps_per_split_dataset",
        str(args.split_steps),
        "--pipeline.optimizers.steps_perssampler_init",
        str(args.init_steps),
        "--pipeline.sampler.sub_div_milestones",
        f"{args.init_steps // 8},{args.init_steps // 4},"
        f"{args.init_steps // 2}",
        "--pipeline.sampler.ray_march_fineness_decay_end_iter",
        str(args.init_steps),
        "--pipeline.camera_bounds", "0.01,50.0",
        "--pipeline.field_num_levels", "8",
        "--pipeline.field_features_per_level", "4",
        "--pipeline.field_hash_layout", "packed",
        "--pipeline.field_mlp_dtype", "bfloat16",
        "--pipeline.model.samples_budget_per_ray", "384",
        "--pipeline.sampler.max_samples", "384",
        # start the padded octree small; the manager doubles capacity (one
        # retrace) when a milestone rebuild outgrows it — the 262,144-node
        # default allocated ~8x more (N,3)-padded node state than this
        # scene ever uses (r3 phase-1 OOM headroom)
        "--pipeline.sampler.node_capacity", "32768",
        # rematerialize the field eval in 8 ray-chunks: the backward
        # recomputes encode gathers per chunk instead of holding residuals
        # for all rays*samples points (second half of the r3 OOM headroom;
        # tests/test_remat.py pins grad equivalence)
        "--pipeline.model.remat_chunks", "8",
        "--steps_per_save", str(save_every),
        "--steps_per_eval_batch", "1000000000",
        "--steps_per_eval_image", "1000000000",
    ]
    if args.fast:  # plumbing-only dry run (CPU-sized)
        common += ["--pipeline.datamanager.train_num_rays_per_batch", "1024",
                   "--pipeline.model.samples_budget_per_ray", "192",
                   "--pipeline.sampler.max_samples", "192"]

    summary = {"total_steps": total, "kill_at": kill_at,
               "n_blocks": n_blocks, "init_steps": args.init_steps}

    # ---- phase 1: train until mid-focal, then SIGTERM the group --------
    log1 = out / "train_phase1.log"
    print(f"phase 1: training to ~step {kill_at}, then killing", flush=True)
    p = launch(common, log1)
    t0 = time.time()
    while True:
        time.sleep(15)
        s = last_step(log1)
        if p.poll() is not None:
            raise SystemExit(
                f"phase-1 process exited early (rc={p.returncode}); "
                f"see {log1}")
        if s >= kill_at:
            print(f"killing at logged step {s} "
                  f"({(time.time() - t0) / 60:.1f} min)", flush=True)
            kill_group(p)
            break
    summary["killed_at_logged_step"] = s

    # ---- phase 2: resume from the latest checkpoint --------------------
    ckpt_root = run_dir / exp / "gf-nerf"
    load_dir = sorted(ckpt_root.glob("*/nerfstudio_models"))[-1]
    summary["resume_load_dir"] = str(load_dir)
    summary["resume_ckpts"] = sorted(
        q.name for q in load_dir.glob("step-*"))
    log2 = out / "train_phase2.log"
    print(f"phase 2: resuming from {load_dir}", flush=True)
    p = launch(common + ["--load-dir", str(load_dir)], log2)
    rc = p.wait()
    summary["phase2_rc"] = rc
    if rc != 0:
        raise SystemExit(f"phase-2 failed rc={rc}; see {log2}")

    # ---- eval -----------------------------------------------------------
    cfg = sorted(ckpt_root.glob("*/config.yml"))[-1]
    eval_out = out / "midscale_eval.json"
    rc = subprocess.call(
        [sys.executable, "scripts/eval.py", "--load-config", str(cfg),
         "--output-path", str(eval_out)], cwd=REPO)
    summary["eval_rc"] = rc
    if eval_out.exists():
        summary["eval"] = json.loads(eval_out.read_text())

    # rebuild / recalibration / truncation evidence from the logs
    for name, log in (("phase1", log1), ("phase2", log2)):
        txt = log.read_text()
        summary[f"{name}_rebuilds"] = len(
            re.findall(r"milestone rebuild|proc_octree", txt))
        summary[f"{name}_max_hits_events"] = re.findall(
            r"auto-calibrated max_hits: \d+ -> \d+", txt)
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
