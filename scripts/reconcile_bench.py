#!/usr/bin/env python
"""Reconcile bench.py vs profile_step.py throughput (VERDICT r3 weak 2).

Round 3 ended with two numbers for the SAME config (8192 rays, S=384
quality): profile_step.py's single-dispatch full step said 872 ms/step
(9,396 rays/s) while bench.py's K=8 scanned dispatch said ~1.77 s/step
(4,623 rays/s).  A multi-step scan amortizes the ~100 ms relay dispatch
cost and should be FASTER per step, not 2x slower.  This script times the
matrix of variants under one measurement protocol (warm compile, then N
timed dispatches with exactly ONE host readback at the end — readbacks
force completion through this relay; block_until_ready does not):

  single   - the plain jitted step, chained state, 1 step/dispatch
  scan_k8  - make_multi_train_step K=8, batches resident + forced
  scan_k1  - the same scanned program with K=1 (isolates scan overhead)
  scan_k8_noocc - K=8 with the occupancy update compiled out (isolates
                  update_oct_nodes' contribution inside the scan carry)
  scan_k8_coldbatch - K=8 with FRESH batch device-puts created right
                  before the timed loop, NOT forced — bench.py r3 did
                  exactly this, so if host->device staging through the
                  relay is slow, its cost landed inside bench's timing

Prints one JSON report; run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/reconcile_bench.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="quality",
                    choices=["quality", "perf", "prop"])
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--dispatches", type=int, default=3,
                    help="timed dispatches per variant")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from profile_step import build_workload
    from gfnerf_tpu.fields.field import STAGE_INIT
    from gfnerf_tpu.models.gfnerf import (
        _train_step_body, make_multi_train_step)

    w = build_workload(args.config, args.rays)
    scfg, fcfg, mcfg = w["scfg"], w["fcfg"], w["mcfg"]
    R = args.rays
    fineness_val = 1.0 if args.config == "quality" else 4.0
    report = {"config": args.config, "rays": R, "S": w["S"],
              "dispatches": args.dispatches}

    def stack_batch(batch, k, force=True):
        out = {key: jnp.asarray(np.broadcast_to(
                   np.asarray(v)[None], (k,) + v.shape).copy())
               for key, v in batch.items()}
        if force:
            # force the device puts to complete so the timed loop measures
            # compute, not ingestion (readback is the only reliable sync
            # through this relay)
            _ = float(sum(jnp.sum(v.astype(jnp.float32))
                          for v in out.values()))
        return out

    def run_variant(name, k, occupancy=True, force_batch=True):
        """Time `dispatches` chained dispatches of a K-step program."""
        import gfnerf_tpu.models.gfnerf as gfmod

        if not occupancy:
            # compile the occupancy update out by lying about the stage
            # only for update purposes: easiest honest switch is a wrapper
            # that strips it — we instead reuse STAGE_INIT but patch
            # update_oct_nodes to identity for this build.
            orig = gfmod.update_oct_nodes
            gfmod.update_oct_nodes = lambda od, *a, **kw: od
        try:
            if k == 0:   # plain single step
                fn = jax.jit(_train_step_body(fcfg, mcfg, scfg, w["tx"],
                                              STAGE_INIT))
                batch = w["batch"]
                fin = jnp.asarray(fineness_val, jnp.float32)

                def dispatch(st, od, key, b=None):
                    st, od, metrics, err = fn(
                        st, w["statics"], od, w["cameras"],
                        batch if b is None else b, fin,
                        jnp.asarray(0, jnp.int32), key)
                    return st, od, metrics
                steps_per_dispatch = 1
            else:
                fn = make_multi_train_step(fcfg, mcfg, scfg, w["tx"],
                                           STAGE_INIT, k)
                batches = stack_batch(w["batch"], k)
                fins = jnp.full((k,), fineness_val, jnp.float32)

                def dispatch(st, od, key, b=None):
                    st, od, metrics, errs = fn(
                        st, w["statics"], od, w["cameras"],
                        batches if b is None else b, fins,
                        jnp.asarray(0, jnp.int32), key)
                    return st, od, metrics
                steps_per_dispatch = k
        finally:
            if not occupancy:
                gfmod.update_oct_nodes = orig

        key = jax.random.PRNGKey(0)
        # fresh copies: the step donates (state, oct) buffers, so reusing
        # w["state"] across variants reads deleted arrays
        st = jax.tree.map(jnp.copy, w["state"])
        od = jax.tree.map(jnp.copy, w["oct_dev"])
        st, od, metrics = dispatch(st, od, key)          # compile + warm
        loss0 = metrics["loss"]
        _ = float(jnp.sum(loss0))
        keys = [jax.random.PRNGKey(i + 1) for i in range(args.dispatches)]
        _ = float(jnp.sum(keys[-1].astype(jnp.float32)))  # stage the keys
        cold = None
        if k > 0 and not force_batch:
            # fresh, unforced device puts — exactly bench.py r3's staging
            cold = [stack_batch(w["batch"], k, force=False)
                    for _ in range(args.dispatches)]
        t0 = time.perf_counter()
        for i in range(args.dispatches):
            st, od, metrics = dispatch(
                st, od, keys[i], None if cold is None else cold[i])
        _ = float(jnp.sum(metrics["loss"]))              # force completion
        dt = time.perf_counter() - t0
        per_step_ms = dt / (args.dispatches * steps_per_dispatch) * 1000.0
        report[name] = {
            "per_step_ms": round(per_step_ms, 1),
            "rays_per_sec": round(R / (per_step_ms / 1000.0), 1),
        }
        print(f"[reconcile] {name}: {per_step_ms:.1f} ms/step "
              f"({R / (per_step_ms / 1000.0):,.0f} rays/s)",
              file=sys.stderr)

    run_variant("single", 0)
    run_variant("scan_k8", 8)
    run_variant("scan_k1", 1)
    run_variant("scan_k8_noocc", 8, occupancy=False)
    run_variant("scan_k8_coldbatch", 8, force_batch=False)

    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
