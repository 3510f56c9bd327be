#!/usr/bin/env python
"""1080p render-throughput benchmark (BASELINE.md north star: <1 s/frame).

Renders full 1920x1080 frames through the jitted eval path
(``make_render_fn``) in large ray chunks — through this environment's relay
every dispatch costs ~100 ms of host work, so eval chunking is the lever:
the training default of 2048 rays/chunk would spend ~100 s/frame on
dispatch overhead alone (1013 dispatches); the default here is 32768.

Prints one JSON line:
  {"metric": "render_seconds_per_1080p_frame", "value": ..., "rays_per_sec":
   ..., "chunk": ..., "config": ...}

Run on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/render_bench.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="quality",
                    choices=["quality", "perf", "prop"])
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=2,
                    help="timed frames (after one warmup/compile frame)")
    ap.add_argument("--early-term", action="store_true",
                    help="two-phase transmittance early termination "
                         "(models/render_early.py): saturated rays skip "
                         "their tail samples; not valid for --config prop")
    ap.add_argument("--et-s1", type=int, default=0,
                    help="head-segment samples (0 = max_samples // 4)")
    ap.add_argument("--et-eps", type=float, default=5e-3,
                    help="termination transmittance threshold")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/gfnerf_xla_cache_bench")
    import jax
    import jax.numpy as jnp

    from profile_step import build_workload
    from gfnerf_tpu.models.gfnerf import make_render_fn

    w = build_workload(args.config, args.chunk)
    scfg, fcfg, mcfg = w["scfg"], w["fcfg"], w["mcfg"]
    params, statics, oct_dev = w["params"], w["statics"], w["oct_dev"]
    render_fn = make_render_fn(fcfg, mcfg, scfg)

    # virtual 1080p camera on the bench scene's ring
    c2w = np.asarray(w["cameras"].camera_to_worlds[0])
    W, H = args.width, args.height
    focal = H / 2.0 / np.tan(np.deg2rad(60.0) / 2.0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    d_cam = np.stack([(xx + 0.5 - W / 2) / focal,
                      -(yy + 0.5 - H / 2) / focal,
                      -np.ones_like(xx)], -1).reshape(-1, 3)
    d_w = d_cam @ c2w[:3, :3].T
    d_w /= np.linalg.norm(d_w, axis=-1, keepdims=True)
    o_w = np.broadcast_to(c2w[:3, 3], d_w.shape).copy()

    n = W * H
    chunk = args.chunk
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    if pad:
        o_w = np.concatenate([o_w, np.tile(o_w[-1:], (pad, 1))])
        d_w = np.concatenate([d_w, np.tile(d_w[-1:], (pad, 1))])
    # stage all chunks to device BEFORE the timer (ingestion pipelines
    # behind compute in a real renderer; bench.py discipline)
    o_dev = [jnp.asarray(o_w[i * chunk:(i + 1) * chunk]) for i in range(n_chunks)]
    d_dev = [jnp.asarray(d_w[i * chunk:(i + 1) * chunk]) for i in range(n_chunks)]
    _ = float(sum(jnp.sum(x) for x in o_dev) + sum(jnp.sum(x) for x in d_dev))

    rel = jnp.asarray(0, jnp.int32)
    ab = jnp.asarray(0, jnp.int32)
    is_block = False

    et = None
    if args.early_term:
        from gfnerf_tpu.models.render_early import EarlyTermRenderer

        et = EarlyTermRenderer(fcfg, mcfg, scfg,
                               s1=args.et_s1 or None, eps=args.et_eps)

    def frame():
        if et is not None:
            outs = et.render_chunks(params, statics, oct_dev,
                                    list(zip(o_dev, d_dev)), rel, ab,
                                    is_block)
            return float(outs[-1]["rgb"].sum())
        outs = [render_fn(params, statics, oct_dev, o_dev[i], d_dev[i],
                          rel, ab, is_block)["rgb"]
                for i in range(n_chunks)]
        # one readback forces the whole frame (relay: block_until_ready
        # does not synchronize)
        return float(jnp.sum(outs[-1]))

    t0 = time.perf_counter()
    frame()  # compile + warm
    print(f"[render_bench] warmup frame (incl. compile): "
          f"{time.perf_counter() - t0:.1f}s, {n_chunks} chunks of {chunk}",
          file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(args.frames):
        frame()
    dt = (time.perf_counter() - t0) / args.frames
    label = ("1080p" if (W, H) == (1920, 1080) else f"{W}x{H}")
    doc = {
        "metric": f"render_seconds_per_{label}_frame",
        "value": round(dt, 3),
        "unit": "s/frame",
        "rays_per_sec": round(n / dt, 1),
        "fps": round(1.0 / dt, 4),
        "chunk": chunk,
        "config": args.config,
        "vs_baseline": round(1.0 / dt, 4),  # north star: 1 frame/s
    }
    if et is not None:
        doc["early_term"] = {"s1": et.s1, "eps": et.eps,
                             "survivor_frac": round(
                                 et.last_survivor_frac or -1, 4)}
    print(json.dumps(doc))
    if args.out:
        args.out.write_text(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
