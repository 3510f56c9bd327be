#!/usr/bin/env python
"""Split the packed-encode BACKWARD wall into its two candidate costs.

r5 chip profile (results/profile_r5_quality.json): encode_fwd 171 ms but
encode_fwdbwd 457 ms at P = 3.1 M — the backward (~286 ms) is now the
encode wall.  Two suspects:

  (a) the table-gradient scatter-add (transpose of the per-level
      ``flat[h]`` gather): 8 levels x 3.1 M rows x 128 B into a
      (L*R, 128) table — fundamental to hash-grid training
      (reference analogue: the CUDA backward's atomicAdd loop,
      /root/reference/gfnerf/bindings/field/Hash3DAnchored_cuda.cu).
  (b) the interp transpose: autodiff of the 108 strided column reads in
      ``_interp_level`` may build pad/scatter chains into (P, 128) temps
      instead of one stacked grad_rows.

This microbench times (a) alone — same shapes, same dtypes, uniform
random rows — plus an f32-table variant (is the bf16 cast on the scatter
path helping or hurting?), and the real encode fwd+bwd for reference.
If (a) ~= the full backward, a custom VJP on the interp cannot help and
the scatter itself is the target; if (a) is small, the interp transpose
is the target.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_encode_bwd.py \
      [--points 3145728] [--iters 5] [--out results/bench_encode_bwd.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, args, iters, readback):
    out = fn(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        readback(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=8192 * 384)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--rows-log2", type=int, default=15)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    P, L, R, W = args.points, args.levels, 1 << args.rows_log2, args.width
    key = jax.random.PRNGKey(0)
    ft = jax.random.normal(key, (L, R, W), jnp.float32) * 0.01
    hs = jax.random.randint(jax.random.PRNGKey(1), (L, P), 0, R)
    g_rows = jax.random.normal(jax.random.PRNGKey(2), (P, W),
                               jnp.float32) * 0.01
    res = {"P": P, "L": L, "R": R, "W": W}

    def rb(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                             .astype(jnp.float32)))

    # (a) gather-transpose alone, bf16 table (the production dtype path):
    # cotangent of sum(flat[h]) is an all-ones (P, W) scattered per level.
    def gather_sum_bf16(ft_, hs_):
        flat = ft_.astype(jnp.bfloat16).reshape(L * R, W)
        s = jnp.float32(0)
        for l in range(L):
            s += jnp.sum(flat[hs_[l] + l * R].astype(jnp.float32) * 0.1)
        return s

    res["scatter_bf16_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(gather_sum_bf16)), (ft, hs), args.iters, rb)

    # same, f32 table (no bf16 cast anywhere on the scatter path)
    def gather_sum_f32(ft_, hs_):
        flat = ft_.reshape(L * R, W)
        s = jnp.float32(0)
        for l in range(L):
            s += jnp.sum(flat[hs_[l] + l * R] * 0.1)
        return s

    res["scatter_f32_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(gather_sum_f32)), (ft, hs), args.iters, rb)

    # forward gather alone (so fwd can be subtracted from the fwdbwd rows)
    res["gather_bf16_fwd_ms"] = timeit(
        jax.jit(gather_sum_bf16), (ft, hs), args.iters, float)

    # (b) interp transpose alone: rows as a DIRECT (P, W) input — grad wrt
    # rows exercises only _interp_level's autodiff, no table scatter.
    from gfnerf_tpu.fields.packed_hash import _interp_level

    fx = jax.random.uniform(jax.random.PRNGKey(3), (P,))
    fy = jax.random.uniform(jax.random.PRNGKey(4), (P,))
    fz = jax.random.uniform(jax.random.PRNGKey(5), (P,))
    lx = jax.random.randint(jax.random.PRNGKey(6), (P,), 0, 2).astype(
        jnp.float32)
    ly = jnp.zeros((P,), jnp.float32)
    lz = jnp.ones((P,), jnp.float32)

    def interp_sum(rows_):
        chans = _interp_level(rows_.astype(jnp.bfloat16), fx, fy, fz,
                              lx, ly, lz, 3, 4)
        return sum(jnp.sum(c) for c in chans)

    res["interp_fwd_ms"] = timeit(
        jax.jit(interp_sum), (g_rows,), args.iters, float)
    res["interp_fwdbwd_ms"] = timeit(
        jax.jit(jax.grad(interp_sum)), (g_rows,), args.iters, rb)

    print(json.dumps(res, indent=2), flush=True)
    if args.out:
        args.out.write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
