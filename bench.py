#!/usr/bin/env python
"""Benchmark: steady-state training throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: 8192 rays/batch on the gf-nerf-perf flagship configuration —
supercell-packed anchored hash tables (fields/packed_hash.py: one wide-row
gather per point-level instead of 8 corner gathers), 8 levels x 4 channels at
the parity config's bytes/level, 160-sample march budget — full jitted train
step (march + field + losses + grads + Adam + occupancy stats) on a synthetic
multi-sphere scene, 8 steps per dispatch (``make_multi_train_step``; host
dispatch costs ~100 ms/call through this environment's TPU relay).

The paper-faithful parity configuration (gf-nerf: exact per-corner anchored
hashing, 16x2 levels, 1024-sample march) is benchmarked in PERF_NOTES.md.

``vs_baseline`` is the fraction of the BASELINE.json north-star per-chip rate
(1M rays/s on a v5p-8 => 125k rays/s/chip; this environment's chip is a v5e).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

NORTH_STAR_RAYS_PER_SEC_PER_CHIP = 125_000.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="perf", choices=["perf", "prop"],
                    help="perf: dense compaction budget; prop: "
                         "proposal-guided resampling (coverage march + "
                         "K fine samples)")
    ap.add_argument("--stage", default="init", choices=["init", "focal"],
                    help="focal: STAGE_BLOCK step (residual tables, frozen "
                         "shared params) — the stage the reference spends "
                         "100k of 130k steps in (gfnerf/config.py:58)")
    ap.add_argument("--rays", type=int, default=8192)
    args = ap.parse_args(argv)
    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.engine.optimizers import OptimizersConfig, build_optimizer, optimizer_arg
    from gfnerf_tpu.fields.field import (
        STAGE_BLOCK, STAGE_INIT, FieldConfig, init_field_params)
    from gfnerf_tpu.models.gfnerf import (
        GFNeRFModelConfig,
        TrainState,
        make_multi_train_step,
    )
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import SamplerConfig, octree_to_device
    from gfnerf_tpu.utils.synthetic import ring_cameras, render_spheres
    from gfnerf_tpu.data.dataparsers.base import CamerasHost

    n_cams = 48
    img_w, img_h = 96, 72
    c2w, fx, fy, cx, cy, w, h = ring_cameras(n_cams, img_wh=(img_w, img_h))
    intri = np.zeros((n_cams, 3, 3), np.float32)
    intri[:, 0, 0] = fx
    intri[:, 1, 1] = fy
    intri[:, 0, 2] = cx
    intri[:, 1, 2] = cy
    intri[:, 2, 2] = 1
    images = render_spheres(c2w, fx, fy, cx, cy, w, h)
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (n_cams, 1))

    tree = build_octree(c2w, intri, bounds, max_depth=8, bbox_levels=4,
                        n_rand_pts=4096, vis_res_w=64, seed=0)
    oct_dev = octree_to_device(tree, capacity=32768)

    # gf-nerf-perf flagship shape (configs/method_configs.py:126)
    S = 160
    scfg = SamplerConfig(max_samples=S, sample_l=1.0 / 256, locate_iters=12)
    use_prop = args.config == "prop"
    fcfg = FieldConfig(num_images=n_cams, n_volumes=tree.n_volumes,
                       num_levels=8, features_per_level=4,
                       hash_layout="packed", packed_rows_log2=15, n_blocks=2,
                       mlp_dtype="bfloat16", use_proposal=use_prop)
    mcfg = GFNeRFModelConfig(
        n_blocks=2, scale_factor=1.0,
        samples_budget_per_ray=0 if use_prop else S,
        num_proposal_resamples=64 if use_prop else 0)
    params, statics = init_field_params(fcfg, seed=0)
    ocfg = OptimizersConfig()
    tx = build_optimizer(ocfg, params)
    state = TrainState(params=params, opt_state=tx.init(optimizer_arg(params)),
                       step=jnp.asarray(0, jnp.int32))
    K = 8
    stage = STAGE_BLOCK if args.stage == "focal" else STAGE_INIT
    step_fn = make_multi_train_step(fcfg, mcfg, scfg, tx, stage, K)

    cams_host = CamerasHost(
        camera_to_worlds=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
        width=np.full(n_cams, w, np.int32),
        height=np.full(n_cams, h, np.int32),
    )
    cameras = cams_host.to_device()

    R = args.rays

    def make_batches(seed):
        """One stacked (K, ...) batch pytree, staged to device as few
        large arrays (host->device transfers through the relay are slow)."""
        rng = np.random.default_rng(seed)
        ki = rng.integers(0, n_cams, (K, R))
        yi = rng.integers(0, h, (K, R))
        xi = rng.integers(0, w, (K, R))
        return {
            "camera_indices": jnp.asarray(ki, jnp.int32),
            "rel_camera_indices": jnp.asarray(ki, jnp.int32),
            "coords": jnp.asarray(
                np.stack([yi + 0.5, xi + 0.5], -1), jnp.float32),
            "image": jnp.asarray(images[ki, yi, xi], jnp.float32),
        }

    key = jax.random.PRNGKey(0)
    finenesses = jnp.full((K,), 4.0, jnp.float32)
    active = jnp.asarray(0, jnp.int32)

    # warmup / compile
    state, oct_dev, metrics, _ = step_fn(state, statics, oct_dev, cameras,
                                         make_batches(999), finenesses,
                                         active, key)
    float(metrics["loss"][-1])

    n_dispatch = 3
    batch_sets = [make_batches(i) for i in range(n_dispatch)]
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        key, sub = jax.random.split(key)
        state, oct_dev, metrics, _ = step_fn(
            state, statics, oct_dev, cameras, batch_sets[i], finenesses,
            active, sub)
    float(metrics["loss"][-1])  # host readback forces completion
    dt = (time.perf_counter() - t0) / (n_dispatch * K)
    rays_per_sec = R / dt

    suffix = "" if (args.stage, args.config) == ("init", "perf") else (
        f"_{args.stage}_{args.config}")
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip" + suffix,
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC_PER_CHIP,
                             4),
    }))


if __name__ == "__main__":
    main()
