#!/usr/bin/env python
"""March throughput at realistic octree sizes (VERDICT r2 weak 6).

The brute-force leaf march is O(R x Lcap); the hierarchical (tree-cut)
march is O(R x (Ccap + M*F)).  This script builds trees of increasing leaf
count (by deepening subdivision on the quality scene) and times both paths
on the real chip, verifying they agree on the sample lattice.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_march.py \
      [--rays 8192] [--samples 384] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_tree(max_depth, split_thres, n_cams=72):
    from gfnerf_tpu.sampler.octree import build_octree
    from gfnerf_tpu.utils.synthetic import ring_cameras

    c2w1, fx1, fy1, cx1, cy1, w, h = ring_cameras(
        n_cams // 2, radius=4.0, height=1.2, img_wh=(160, 120), focal=110.0)
    c2w2, fx2, fy2, cx2, cy2, _, _ = ring_cameras(
        n_cams - n_cams // 2, radius=5.5, height=2.4, img_wh=(160, 120),
        focal=110.0)
    c2w = np.concatenate([c2w1, c2w2])
    fx = np.concatenate([fx1, fx2]); fy = np.concatenate([fy1, fy2])
    cx = np.concatenate([cx1, cx2]); cy = np.concatenate([cy1, cy2])
    intri = np.zeros((n_cams, 3, 3), np.float32)
    intri[:, 0, 0] = fx; intri[:, 1, 1] = fy
    intri[:, 0, 2] = cx; intri[:, 1, 2] = cy; intri[:, 2, 2] = 1
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (n_cams, 1))
    tree = build_octree(c2w, intri, bounds, max_depth=max_depth,
                        bbox_levels=4, n_rand_pts=4096, vis_res_w=64,
                        seed=0, split_dist_thres=split_thres)
    return tree, c2w, fx, fy, cx, cy, w, h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--coarse-hits", type=int, default=48)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gfnerf_tpu.sampler.fast_march import get_samples_fast
    from gfnerf_tpu.sampler.perssampler import (
        SamplerConfig, octree_to_device)

    R, S = args.rays, args.samples
    results = []
    for max_depth, thres in ((8, 1.5), (10, 3.0), (12, 6.0)):
        tree, c2w, fx, fy, cx, cy, w, h = build_tree(max_depth, thres)
        cap = 1 << int(np.ceil(np.log2(tree.n_nodes + 1)))
        oct_dev = octree_to_device(tree, capacity=cap)
        n_leaves = int(oct_dev.n_leaves)
        lcap = int(oct_dev.leaf_idx.shape[0])
        ccap = int(oct_dev.cut_nodes.shape[0])
        print(f"tree depth<={max_depth}: {tree.n_nodes} nodes, "
              f"{n_leaves} leaves (Lcap {lcap}, Ccap {ccap})", flush=True)

        rng = np.random.default_rng(0)
        ki = rng.integers(0, len(c2w), R)
        # rays through random pixels
        xs = (rng.random(R) * w - cx[ki]) / fx[ki]
        ys = (rng.random(R) * h - cy[ki]) / fy[ki]
        d_cam = np.stack([xs, -ys, -np.ones(R)], -1)
        d_w = np.einsum("rij,rj->ri", c2w[ki, :3, :3], d_cam)
        d_w /= np.linalg.norm(d_w, axis=-1, keepdims=True)
        rays_o = jnp.asarray(c2w[ki, :3, 3], jnp.float32)
        rays_d = jnp.asarray(d_w, jnp.float32)
        noise = jnp.ones((R, S))
        fin = jnp.asarray(1.0)

        row = {"max_depth": max_depth, "n_nodes": tree.n_nodes,
               "n_leaves": n_leaves, "Lcap": lcap, "Ccap": ccap}
        sams = {}
        for name, ch in (("brute", 0), ("hier", args.coarse_hits)):
            cfg = SamplerConfig(max_samples=S, sample_l=1.0 / 256,
                                max_hits=128, ray_chunk=1024,
                                coarse_hits=ch)
            f = jax.jit(lambda o, d, nz, fi, cfg=cfg: get_samples_fast(
                oct_dev, o, d, nz, fi, cfg))
            s = f(rays_o, rays_d, noise, fin)
            float(jnp.sum(s.ts))  # warm + sync
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s = f(rays_o, rays_d, noise, fin)
                float(jnp.sum(s.ts))
            ms = (time.perf_counter() - t0) / args.iters * 1000
            row[f"{name}_ms"] = round(ms, 2)
            row[f"{name}_valid"] = int(jnp.sum(s.valid))
            sams[name] = s
        # agreement: identical valid masks and t values
        bv = np.asarray(sams["brute"].valid)
        hv = np.asarray(sams["hier"].valid)
        row["agree"] = bool(
            (bv == hv).all()
            and np.allclose(np.asarray(sams["brute"].ts)[bv],
                            np.asarray(sams["hier"].ts)[bv], atol=1e-4))
        print(json.dumps(row), flush=True)
        results.append(row)
    if args.out:
        args.out.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
