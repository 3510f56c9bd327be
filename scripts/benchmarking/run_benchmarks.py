#!/usr/bin/env python
"""Benchmark sweep: train method x scene combinations and collect PSNR /
throughput JSONs.

Equivalent of the reference's ``scripts/benchmarking/launch_train_blender.sh``
+ ``launch_eval_blender.sh`` pair (which sweep Blender scenes across GPUs and
collect metric JSONs): one process drives the sweep sequentially on the local
chip(s); each cell trains a shrunk run and records eval metrics.

Usage:
  python scripts/benchmarking/run_benchmarks.py \
      --methods gf-nerf-perf nerfacto --scenes /data/sceneA /data/sceneB \
      --dataparser minimal --iters 2000 --output results.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def run_cell(method: str, scene: Path, dataparser: str, iters: int,
             out_dir: Path) -> dict:
    from gfnerf_tpu.configs.method_configs import discover_methods
    from gfnerf_tpu.data.dataparsers import build_dataparser
    from gfnerf_tpu.engine.trainer import Trainer

    cfg = discover_methods()[method]()
    cfg.data = scene
    cfg.output_dir = out_dir
    cfg.vis = "local"
    cfg.max_num_iterations = iters
    cfg.steps_per_eval_batch = 10 ** 9
    cfg.steps_per_eval_image = 10 ** 9
    cfg.steps_per_save = 10 ** 9
    # scale the gf-nerf stage schedule down to the sweep budget
    p = cfg.pipeline
    if hasattr(p, "model") and hasattr(p.model, "steps_perssampler_init"):
        init = int(iters * 0.6)
        splits = max(p.model.n_split_dataset, 1)
        per_split = max((iters - init) // splits, 1)
        for obj in (p.model, p.datamanager, p.optimizers):
            obj.steps_perssampler_init = init
            obj.steps_per_split_dataset = per_split
        p.sampler.ray_march_fineness_decay_end_iter = init
        p.sampler.sub_div_milestones = tuple(
            max(init // 8, 1) * k for k in (1, 2, 4))

    parser = build_dataparser(dataparser, scene)
    trainer = Trainer(cfg, parser)
    trainer.setup()
    pipe = trainer.pipeline

    t0 = time.time()
    rays = 0
    n_rays_per_batch = (p.datamanager.train_num_rays_per_batch
                        if hasattr(p, "datamanager")
                        else p.train_num_rays_per_batch)
    for step in range(iters):
        pipe.get_train_loss_dict(step)
        pipe.after_train_iteration(step)
        rays += n_rays_per_batch
    train_s = time.time() - t0
    metrics = pipe.get_average_eval_image_metrics(iters)
    return {
        "method": method,
        "scene": str(scene),
        "iters": iters,
        "train_seconds": round(train_s, 1),
        "train_rays_per_sec": round(rays / train_s, 1),
        **{k: round(float(v), 4) for k, v in metrics.items()},
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--methods", nargs="+", required=True)
    ap.add_argument("--scenes", nargs="+", type=Path, required=True)
    ap.add_argument("--dataparser", default="minimal")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--output", type=Path, default=Path("benchmarks.json"))
    ap.add_argument("--work-dir", type=Path, default=Path("/tmp/bench_sweep"))
    args = ap.parse_args(argv)

    results = []
    for method in args.methods:
        for scene in args.scenes:
            print(f"== {method} on {scene}", flush=True)
            try:
                cell = run_cell(method, scene, args.dataparser, args.iters,
                                args.work_dir / method / scene.name)
            except Exception as e:  # record failures, keep sweeping
                cell = {"method": method, "scene": str(scene),
                        "error": repr(e)}
            results.append(cell)
            args.output.write_text(json.dumps(results, indent=2))
            print(json.dumps(cell), flush=True)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
