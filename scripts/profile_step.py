#!/usr/bin/env python
"""Wall-clock breakdown of the gf-nerf train step on the real chip.

Times each segment of the step as its own jitted function (warmed, then
averaged over --iters dispatches, forcing a host readback per dispatch —
``block_until_ready`` does not synchronize through this environment's TPU
relay, PERF_NOTES.md).  The readback/sync overhead is measured separately
(``sync_overhead``) and already included in every row; subtract it to
compare segments.

This script is the in-repo source of the PERF_NOTES.md wall-breakdown
tables (VERDICT r2 weak 8: perf claims must be reproducible from the repo).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_step.py \
      [--config perf|prop] [--rays 8192] [--iters 5] [--segments all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_workload(config: str, n_rays: int):
    """Same synthetic workload as bench.py."""
    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.data.dataparsers.base import CamerasHost
    from gfnerf_tpu.engine.optimizers import (
        OptimizersConfig, build_optimizer, optimizer_arg)
    from gfnerf_tpu.fields.field import FieldConfig, init_field_params
    from gfnerf_tpu.models.gfnerf import GFNeRFModelConfig, TrainState
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.sampler.perssampler import SamplerConfig, octree_to_device
    from gfnerf_tpu.utils.synthetic import ring_cameras, render_spheres

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

    if config == "quality":
        # the quality-positive bench default (bench.py): 384-slot march at
        # end-state fineness with auto-calibrated step length
        from bench import _calibrate_sample_l
        S = 384
        sample_l = _calibrate_sample_l(tree, oct_dev, c2w, fx, fy, cx, cy,
                                       w, h, S)
        scfg = SamplerConfig(max_samples=S, sample_l=sample_l,
                             locate_iters=12)
        fcfg = FieldConfig(num_images=n_cams, n_volumes=tree.n_volumes,
                           num_levels=8, features_per_level=4,
                           hash_layout="packed", packed_rows_log2=15,
                           n_blocks=2, mlp_dtype="bfloat16")
        mcfg = GFNeRFModelConfig(n_blocks=2, scale_factor=1.0,
                                 samples_budget_per_ray=S)
    elif config == "parity":
        # reference-exact anchored layout (r4: measures the anchored
        # struct-of-arrays + bf16 pair-packed-table rework vs r2's 1.4k)
        S = 192
        scfg = SamplerConfig(max_samples=S, sample_l=1.0 / 256,
                             locate_iters=12)
        fcfg = FieldConfig(num_images=n_cams, n_volumes=tree.n_volumes,
                           num_levels=16, features_per_level=2,
                           hash_layout="anchored", log2_hashmap_size=19,
                           n_blocks=2, mlp_dtype="bfloat16")
        mcfg = GFNeRFModelConfig(n_blocks=2, scale_factor=1.0,
                                 samples_budget_per_ray=S)
    elif config == "prop":
        S = 160
        scfg = SamplerConfig(max_samples=S, sample_l=1.0 / 256,
                             locate_iters=12)
        fcfg = FieldConfig(num_images=n_cams, n_volumes=tree.n_volumes,
                           num_levels=8, features_per_level=4,
                           hash_layout="packed", packed_rows_log2=15,
                           n_blocks=2, mlp_dtype="bfloat16",
                           use_proposal=True)
        mcfg = GFNeRFModelConfig(n_blocks=2, scale_factor=1.0,
                                 samples_budget_per_ray=0,
                                 num_proposal_resamples=64)
    else:
        S = 160
        scfg = SamplerConfig(max_samples=S, sample_l=1.0 / 256,
                             locate_iters=12)
        fcfg = FieldConfig(num_images=n_cams, n_volumes=tree.n_volumes,
                           num_levels=8, features_per_level=4,
                           hash_layout="packed", packed_rows_log2=15,
                           n_blocks=2, mlp_dtype="bfloat16")
        mcfg = GFNeRFModelConfig(n_blocks=2, scale_factor=1.0,
                                 samples_budget_per_ray=S)
    params, statics = init_field_params(fcfg, seed=0)
    ocfg = OptimizersConfig()
    tx = build_optimizer(ocfg, params)
    state = TrainState(params=params, opt_state=tx.init(optimizer_arg(params)),
                       step=jnp.asarray(0, jnp.int32))

    cams_host = CamerasHost(
        camera_to_worlds=c2w, fx=fx, fy=fy, cx=cx, cy=cy,
        width=np.full(n_cams, w, np.int32),
        height=np.full(n_cams, h, np.int32))
    cameras = cams_host.to_device()

    rng = np.random.default_rng(0)
    ki = rng.integers(0, n_cams, n_rays)
    yi = rng.integers(0, h, n_rays)
    xi = rng.integers(0, w, n_rays)
    batch = {
        "camera_indices": jnp.asarray(ki, jnp.int32),
        "rel_camera_indices": jnp.asarray(ki, jnp.int32),
        "coords": jnp.asarray(np.stack([yi + 0.5, xi + 0.5], -1),
                              jnp.float32),
        "image": jnp.asarray(images[ki, yi, xi], jnp.float32),
    }
    return dict(S=S, scfg=scfg, fcfg=fcfg, mcfg=mcfg, params=params,
                statics=statics, state=state, tx=tx, oct_dev=oct_dev,
                cameras=cameras, batch=batch, tree=tree)


def timeit(fn, args, iters, readback):
    import jax

    out = fn(*args)
    readback(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        readback(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="perf",
                    choices=["perf", "prop", "quality", "parity"])
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.cameras.cameras import generate_rays_multi
    from gfnerf_tpu.fields.field import (
        STAGE_INIT, field_density, field_rgb_per_ray)
    from gfnerf_tpu.models.gfnerf import (
        _train_step_body, model_forward, sample_rays)
    from gfnerf_tpu.model_components.losses import charbonnier_loss, s3im_loss
    from gfnerf_tpu.ops.pallas.composite import fused_composite

    w = build_workload(args.config, args.rays)
    R, S = args.rays, w["S"]
    scfg, fcfg, mcfg = w["scfg"], w["fcfg"], w["mcfg"]
    key = jax.random.PRNGKey(0)
    fineness = jnp.asarray(1.0 if args.config == "quality" else 4.0,
                           jnp.float32)
    results = {"config": args.config, "rays": R, "S": S}

    def rb_sum(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                            jnp.floating)]
        return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves[:2]))

    # 0. sync/readback overhead
    tiny = jnp.ones((8, 8))
    f_id = jax.jit(lambda x: x * 1.0000001)
    results["sync_overhead_ms"] = timeit(f_id, (tiny,), args.iters, rb_sum)

    rays = generate_rays_multi(w["cameras"], w["batch"]["camera_indices"],
                               w["batch"]["coords"])
    noise = (jax.random.uniform(key, (R, S)) - 0.5) + 1.0

    # 1. march
    f_march = jax.jit(lambda o, d, nz, fin: sample_rays(
        w["oct_dev"], o, d, nz, fin, scfg))
    results["march_ms"] = timeit(
        f_march, (rays["origins"], rays["directions"], noise, fineness),
        args.iters, lambda s: float(jnp.sum(s.ts)))

    samples = f_march(rays["origins"], rays["directions"], noise, fineness)
    P = R * S
    pts = jax.random.uniform(jax.random.PRNGKey(1), (P, 3), minval=-1.4,
                             maxval=1.4)
    anc = jnp.zeros((P,), jnp.int32)

    # 2. encode fwd / fwd+bwd at the main field shape (layout-dependent)
    if fcfg.hash_layout == "packed":
        from gfnerf_tpu.fields.packed_hash import (
            pack_for_channels, packed_hash_encode)

        pack = pack_for_channels(fcfg.features_per_level,
                                 fcfg.packed_row_width)
        enc_fn = lambda ft, p: packed_hash_encode(
            ft, w["statics"].global_prim, w["statics"].global_bias, p, anc,
            fcfg.features_per_level, pack)
    else:
        from gfnerf_tpu.fields.hash_encoding import hash_encode_sorted

        enc_fn = lambda ft, p: hash_encode_sorted(
            ft, w["statics"].global_prim, w["statics"].global_bias, p, anc)
    f_enc = jax.jit(enc_fn)
    results["encode_fwd_ms"] = timeit(
        f_enc, (w["params"].global_feat, pts), args.iters,
        lambda o: float(jnp.sum(o)))

    f_encb = jax.jit(jax.grad(lambda ft, p: jnp.sum(enc_fn(ft, p))))
    results["encode_fwdbwd_ms"] = timeit(
        f_encb, (w["params"].global_feat, pts), args.iters,
        lambda o: float(jnp.sum(o)))

    # 3. field (encode+mlp) + head fwd at the model's actual shapes
    def field_fwd(params, samples_):
        out = model_forward(params, w["statics"], fcfg, mcfg, samples_,
                            rays["directions"],
                            w["batch"]["rel_camera_indices"], STAGE_INIT, 0,
                            oct_dev=w["oct_dev"],
                            warp_deferred=scfg.march == "fast",
                            rays_o=rays["origins"],
                            rng=jax.random.PRNGKey(2))
        return out["rgb"]

    f_fwd = jax.jit(lambda p, s: jnp.sum(field_fwd(p, s)))
    results["model_fwd_ms"] = timeit(
        f_fwd, (w["params"].replace(block_feats=None), samples), args.iters,
        float)

    f_fb = jax.jit(jax.grad(
        lambda p, s: charbonnier_loss(field_fwd(p, s), w["batch"]["image"])))
    results["model_fwdbwd_ms"] = timeit(
        f_fb, (w["params"].replace(block_feats=None), samples), args.iters,
        rb_sum)

    # 4. composite + losses alone (fixed density/rgb inputs)
    dens = jax.random.uniform(jax.random.PRNGKey(3), (R, S)) * 3
    rgbs = jax.random.uniform(jax.random.PRNGKey(4), (R, S, 3))

    def comp_loss(dens_, rgbs_):
        wgt, al, rgb, acc, depth = fused_composite(dens_, samples.dists,
                                                   samples.ts, rgbs_)
        loss = charbonnier_loss(rgb, w["batch"]["image"])
        loss = loss + s3im_loss(jax.random.PRNGKey(5), rgb,
                                w["batch"]["image"],
                                kernel_size=mcfg.s3im_kernel_size,
                                stride=mcfg.s3im_stride,
                                repeat_time=mcfg.s3im_repeat_time,
                                patch_height=mcfg.s3im_patch_height)
        return loss

    f_cl = jax.jit(comp_loss)
    results["composite_loss_fwd_ms"] = timeit(f_cl, (dens, rgbs), args.iters,
                                              float)
    f_clb = jax.jit(jax.grad(comp_loss, argnums=(0, 1)))
    results["composite_loss_fwdbwd_ms"] = timeit(f_clb, (dens, rgbs),
                                                 args.iters, rb_sum)

    # 5. full train step (single dispatch)
    step_fn = jax.jit(_train_step_body(fcfg, mcfg, scfg, w["tx"],
                                       STAGE_INIT))
    a0 = jnp.asarray(0, jnp.int32)
    st, od, metrics, err = step_fn(w["state"], w["statics"], w["oct_dev"],
                                   w["cameras"], w["batch"], fineness, a0,
                                   key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st, od, metrics, err = step_fn(st, w["statics"], od, w["cameras"],
                                       w["batch"], fineness, a0, key)
        float(metrics["loss"])
    results["full_step_ms"] = ((time.perf_counter() - t0) / args.iters
                               * 1000.0)
    results["rays_per_sec_single_dispatch"] = R / (
        results["full_step_ms"] / 1000.0)

    print(json.dumps(results, indent=2))
    if args.out:
        args.out.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
