#!/usr/bin/env python
"""Quality-evidence run (VERDICT r1 item 4): train gf-nerf on the most
realistic scene obtainable offline (textured ground + procedurally textured
spheres, two camera rings) and record eval PSNR/SSIM/LPIPS

- against the trivial predictors (mean-image / black-image PSNR),
- at the init->focal transition vs the end (the focal stage must improve
  on the global stage),
- for the parity (anchored) and perf (packed) hash layouts.

Usage: python scripts/quality_run.py [--config parity|perf] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_scene(tmp: Path, n_train=72, n_val=6, img_wh=(160, 120),
                variant="textured"):
    from gfnerf_tpu.utils.synthetic import render_textured_scene, ring_cameras

    total = n_train + n_val
    # two rings at different radii/heights for parallax
    c2w1, fx1, fy1, cx1, cy1, w, h = ring_cameras(
        total // 2, radius=4.0, height=1.2, img_wh=img_wh, focal=110.0)
    c2w2, fx2, fy2, cx2, cy2, _, _ = ring_cameras(
        total - total // 2, radius=5.5, height=2.4, img_wh=img_wh,
        focal=110.0)
    c2w = np.concatenate([c2w1, c2w2])
    fx = np.concatenate([fx1, fx2]); fy = np.concatenate([fy1, fy2])
    cx = np.concatenate([cx1, cx2]); cy = np.concatenate([cy1, cy2])
    imgs = render_textured_scene(
        c2w, fx, fy, cx, cy, w, h, smooth=(variant == "smooth"),
        supersample=2 if variant == "smooth" else 1)
    rng = np.random.default_rng(0)
    perm = rng.permutation(total)
    tr, va = perm[:n_train], perm[n_train:]
    tmp.mkdir(parents=True, exist_ok=True)
    for split, idx in (("train", tr), ("val", va)):
        np.savez(tmp / f"{split}.npz",
                 images=imgs[idx], c2w=c2w[idx],
                 fx=fx[idx], fy=fy[idx], cx=cx[idx], cy=cy[idx],
                 width=np.full(len(idx), w), height=np.full(len(idx), h))
    return imgs[va]


def trivial_baselines(val_imgs):
    out = {}
    for name, pred in (("black", np.zeros_like(val_imgs[0])),
                       ("mean", val_imgs.mean(axis=(0, 1, 2),
                                              keepdims=True)[0])):
        mses = [(np.mean((img - pred) ** 2)) for img in val_imgs]
        out[f"{name}_psnr"] = float(np.mean(
            [-10 * np.log10(m + 1e-12) for m in mses]))
    return out


def diag_eval(pipe, step, n_blocks):
    """Per-variant eval isolating the focal-stage regression (r3):
    'routed' = standard nearest-block eval; 'shared_only' = residuals off
    (must reproduce the after_init numbers if the focal freeze holds);
    'block{b}' = every val camera forced through block b's residual."""
    import numpy as np

    from gfnerf_tpu.fields.field import STAGE_BLOCK, STAGE_INIT
    from gfnerf_tpu.pipelines.pipeline import compute_ssim

    dm = pipe.datamanager
    cams = dm.eval_dataparser_outputs.cameras
    variants = {"routed": {}, "shared_only": {"stage": STAGE_INIT}}
    for b in range(n_blocks):
        variants[f"block{b}"] = {"stage": STAGE_BLOCK, "force_split_idx": b}
    out = {}
    for name, kw in variants.items():
        psnrs, ssims = [], []
        for i in range(len(dm.eval_dataset)):
            cam_idx, data = dm.next_eval_image(i)
            r = pipe.render_camera(cams, cam_idx, step, **kw)
            mse = float(np.mean((r["rgb"] - data["image"]) ** 2))
            psnrs.append(-10.0 * np.log10(mse + 1e-12))
            ssims.append(float(compute_ssim(r["rgb"], data["image"])))
        out[name] = {"psnr": float(np.mean(psnrs)),
                     "ssim": float(np.mean(ssims)),
                     "per_cam_psnr": [round(p, 2) for p in psnrs]}
    # which block does routing pick per val camera?
    out["routing"] = [
        int(pipe.sampler.get_nearest_split_dataset(
            np.asarray(cams.camera_to_worlds[i][:, 3]))[0])
        for i in range(len(dm.eval_dataset))]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="perf",
                    choices=["parity", "perf", "prop"])
    ap.add_argument("--diag", action="store_true",
                    help="extra per-block/shared-only evals at each "
                         "milestone + eval after every split")
    ap.add_argument("--out", type=Path,
                    default=Path("/tmp/quality_results.json"))
    ap.add_argument("--scene-dir", type=Path, default=None,
                    help="default: /tmp/quality_scene[_<variant>]")
    ap.add_argument("--scene-variant", default="textured",
                    choices=["textured", "smooth"],
                    help="smooth: band-limited photo-consistent GT "
                         "(sin quasi-checker, distance-faded texture, 2x "
                         "supersampled render) — the scene class where "
                         "extra capacity maps to signal, QUALITY.md "
                         "findings 5-6")
    ap.add_argument("--init-steps", type=int, default=None)
    ap.add_argument("--split-steps", type=int, default=None)
    ap.add_argument("--block-wd", type=float, default=None,
                    help="residual-table weight decay (finding-4 fix)")
    ap.add_argument("--block-lr", type=float, default=None)
    ap.add_argument("--block-rows-log2", type=int, default=None,
                    help="residual-table rows (log2) when != global: small "
                         "global + full residual reproduces the "
                         "capacity-bound regime (reference: equal 2^21 "
                         "tables but each block covers ~1/10 the scene)")
    ap.add_argument("--rows-log2", type=int, default=None,
                    help="hash rows per level (global AND residual tables): "
                         "smaller makes global capacity the binding "
                         "constraint, the regime the focal stage exists for")
    ap.add_argument("--uniform-sampling", action="store_true",
                    help="disable error-map-weighted focal sampling "
                         "(ablation, finding 4)")
    ap.add_argument("--mix-fraction", type=float, default=None,
                    help="finding-7 fix (c): fraction of each focal batch "
                         "drawn uniformly from the FULL scene (keeps "
                         "corrective gradient flowing to hash-colliding "
                         "residual rows)")
    ap.add_argument("--empty-penalty", type=float, default=None,
                    help="finding-7 fix (a): multiplier on the focal "
                         "empty-space penalty relu(density - "
                         "density_shared) where the shared branch says "
                         "empty")
    ap.add_argument("--empty-tau", type=float, default=None,
                    help="shared-branch alpha threshold for 'empty' "
                         "(default 0.01)")
    ap.add_argument("--dense-levels", type=int, default=None,
                    help="finding-7 fix (b): first k residual levels use "
                         "collision-free linear addressing where the grid "
                         "fits the table")
    ap.add_argument("--remat-chunks", type=int, default=None,
                    help="rematerialize the field eval in this many chunks "
                         "(memory lever for chip-sized workloads; "
                         "tests/test_remat.py pins gradient equivalence)")
    ap.add_argument("--hash-layout", default=None,
                    choices=["packed", "anchored"],
                    help="override the config's hash layout at otherwise "
                         "identical settings — records the packed-vs-"
                         "anchored PSNR delta (VERDICT r3 ask 6; reference "
                         "math Hash3DAnchored_cuda.cu:12-79). anchored here "
                         "keeps the config's L/C (feature capacity "
                         "comparable), not the parity L16C2")
    ap.add_argument("--focal-mode", default=None,
                    choices=["residual", "finetune"],
                    help="finetune: per-block fine-tuned COPIES of the "
                         "trained global table instead of additive "
                         "residuals (the structurally different focal "
                         "design, VERDICT r4 ask 4; fields/field.py "
                         "focal_mode)")
    ap.add_argument("--trust-mult", type=float, default=None,
                    help="L2 trust-region pull of the fine-tuned table "
                         "toward the global anchor (finetune mode)")
    ap.add_argument("--n-blocks", type=int, default=2,
                    help="focal blocks / dataset splits (reference default "
                         "10, gfnerf/config.py:43; CPU-scale runs keep 2)")
    ap.add_argument("--n-train", type=int, default=None,
                    help="scene scale-up: number of training cameras "
                         "(default 72)")
    ap.add_argument("--n-val", type=int, default=None)
    ap.add_argument("--img-wh", default=None,
                    help="scene scale-up: WxH, e.g. 512x384 (default "
                         "160x120)")
    ap.add_argument("--rays-per-batch", type=int, default=None)
    ap.add_argument("--max-depth", type=int, default=None,
                    help="octree max depth for the scale-up regime")
    ap.add_argument("--init-ckpt", type=Path, default=None,
                    help="checkpoint dir saved at the init->focal "
                         "transition: written there after init if absent, "
                         "loaded (skipping init) if present — makes focal "
                         "hyperparameter sweeps cheap")
    args = ap.parse_args()

    from gfnerf_tpu.configs.method_configs import gf_nerf_config
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.engine.trainer import Trainer

    scene = args.scene_dir
    img_wh = (tuple(int(v) for v in args.img_wh.split("x"))
              if args.img_wh else (160, 120))
    n_train = args.n_train or 72
    n_val = args.n_val or 6
    if scene is None:
        suffix = "" if args.scene_variant == "textured" else (
            "_" + args.scene_variant)
        if args.n_train or args.img_wh:
            suffix += f"_{n_train}c_{img_wh[0]}x{img_wh[1]}"
        scene = Path("/tmp/quality_scene" + suffix)
    if not (scene / "train.npz").exists():
        print("building scene ...", flush=True)
        build_scene(scene, n_train=n_train, n_val=n_val, img_wh=img_wh,
                    variant=args.scene_variant)
    val_imgs = np.load(scene / "val.npz")["images"]
    base = trivial_baselines(val_imgs)
    print("trivial baselines:", base, flush=True)

    cfg = gf_nerf_config()
    p = cfg.pipeline
    # Budget sizing (diagnosed r2): as the march fineness anneals to 1,
    # rays near the ground plane legitimately need hundreds of samples; a
    # budget below the marched count truncates far content and train PSNR
    # DEGRADES once saturated (the reference evaluates every valid sample of
    # its 1024-slot march). Quality runs therefore use a budget sized to the
    # scene; the 160-budget flagship remains the throughput config.
    if args.config in ("perf", "prop"):
        init_steps = args.init_steps or 1600
        split_steps = args.split_steps or 700
        p.field_num_levels = 8
        p.field_features_per_level = 4
        p.field_hash_layout = "packed"
        p.field_packed_rows_log2 = 15
        p.field_mlp_dtype = "bfloat16"
        p.model.samples_budget_per_ray = 384
        p.sampler.max_samples = 384
        if args.config == "prop":
            # proposal-guided resampling: coverage march feeds the probe,
            # the main field runs on K fine samples only (budget-saturation
            # fix, QUALITY.md finding 1 / models/gfnerf.py)
            p.field_use_proposal = True
            p.model.num_proposal_resamples = 64
            p.model.samples_budget_per_ray = 0   # proposal replaces compaction
    else:
        init_steps = args.init_steps or 800
        split_steps = args.split_steps or 350
        p.field_log2_hashmap_size = 19
        p.model.samples_budget_per_ray = 512
        p.sampler.max_samples = 512
        p.datamanager.train_num_rays_per_batch = 2048
    n_blocks = args.n_blocks
    p.model.n_blocks = n_blocks
    p.model.n_split_dataset = n_blocks
    p.model.steps_perssampler_init = init_steps
    p.model.steps_per_split_dataset = split_steps
    p.model.scale_factor = 1.0
    p.datamanager.n_split_dataset = n_blocks
    p.datamanager.steps_per_split_dataset = split_steps
    p.datamanager.steps_perssampler_init = init_steps
    if args.config == "perf":
        p.datamanager.train_num_rays_per_batch = 4096
    p.optimizers.steps_perssampler_init = init_steps
    p.optimizers.steps_per_split_dataset = split_steps
    p.optimizers.n_split_dataset = n_blocks
    if args.rows_log2 is not None:
        p.field_packed_rows_log2 = args.rows_log2
    if args.block_rows_log2 is not None:
        p.field_block_rows_log2 = args.block_rows_log2
    if args.block_wd is not None:
        p.optimizers.block_weight_decay = args.block_wd
    if args.block_lr is not None:
        p.optimizers.block_lr_init = args.block_lr
    if args.uniform_sampling:
        p.use_error_sampling = False
    if args.mix_fraction is not None:
        p.datamanager.focal_uniform_fraction = args.mix_fraction
    if args.empty_penalty is not None:
        p.model.empty_space_penalty_mult = args.empty_penalty
    if args.empty_tau is not None:
        p.model.empty_space_tau = args.empty_tau
    if args.dense_levels is not None:
        p.field_block_dense_levels = args.dense_levels
    if args.remat_chunks is not None:
        p.model.remat_chunks = args.remat_chunks
    if args.hash_layout is not None:
        p.field_hash_layout = args.hash_layout
    if args.focal_mode is not None:
        p.field_focal_mode = args.focal_mode
    if args.trust_mult is not None:
        p.model.finetune_trust_mult = args.trust_mult
    if args.rays_per_batch is not None:
        p.datamanager.train_num_rays_per_batch = args.rays_per_batch
    if args.max_depth is not None:
        p.sampler.max_level = args.max_depth
    p.sampler.sub_div_milestones = (init_steps // 8, init_steps // 4,
                                    init_steps // 2)
    p.sampler.ray_march_fineness_decay_end_iter = init_steps
    p.camera_bounds = (0.01, 50.0)
    cfg.max_num_iterations = init_steps + n_blocks * split_steps
    cfg.steps_per_eval_batch = 10 ** 9
    cfg.steps_per_eval_image = 10 ** 9
    cfg.steps_per_save = 10 ** 9
    cfg.vis = "local"
    cfg.data = scene
    cfg.output_dir = Path("/tmp/quality_out") / args.config
    cfg.experiment_name = f"quality-{args.config}"

    parser = MinimalDataParser(MinimalDataParserConfig(data=scene))
    trainer = Trainer(cfg, parser)
    trainer.setup()
    pipe = trainer.pipeline

    results = {"config": args.config, "baselines": base,
               "init_steps": init_steps, "split_steps": split_steps}
    t0 = time.time()
    milestones = {init_steps: "after_init",
                  cfg.max_num_iterations: "final"}
    if args.diag:
        for b in range(1, n_blocks):
            milestones[init_steps + b * split_steps] = f"after_split{b - 1}"
    step = 0
    ic = args.init_ckpt
    if ic is not None and (ic / "meta.json").exists():
        loaded = pipe.load_checkpoint_state(ic)
        assert loaded == init_steps, (loaded, init_steps)
        step = loaded
        em = json.loads((ic / "after_init_eval.json").read_text())
        results["after_init"] = em
        print(f"resumed at init->focal transition from {ic}", flush=True)
    while step < cfg.max_num_iterations:
        m = pipe.get_train_loss_dict(step)
        pipe.after_train_iteration(step)
        step += 1
        if step % 200 == 0:
            print(f"step {step}: loss {m.get('loss', float('nan')):.4f} "
                  f"({(time.time()-t0)/60:.1f} min)", flush=True)
        if step in milestones:
            em = pipe.get_average_eval_image_metrics(step)
            results[milestones[step]] = em
            print(f"== {milestones[step]} eval @{step}: {em}", flush=True)
            if args.diag and step > init_steps:
                d = diag_eval(pipe, step, n_blocks)
                results[milestones[step] + "_diag"] = d
                print(f"== diag @{step}: {json.dumps(d)}", flush=True)
            if (ic is not None and step == init_steps
                    and not (ic / "meta.json").exists()):
                pipe.save_checkpoint_state(ic, step)
                (ic / "after_init_eval.json").write_text(json.dumps(em))
                print(f"saved init->focal checkpoint to {ic}", flush=True)
            args.out.write_text(json.dumps(results, indent=2))
    results["minutes"] = (time.time() - t0) / 60
    if args.diag:  # keep the end state inspectable post-hoc
        import shutil

        ckpt = args.out.parent / (args.out.stem + "_ckpt")
        if ckpt.exists():
            shutil.rmtree(ckpt)
        pipe.save_checkpoint_state(ckpt, step)
        results["checkpoint"] = str(ckpt)
    args.out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
