#!/bin/bash
# Round-5 chip queue, unattended (docs/TPU_RUNBOOK_R5.md).
#
# Runs the remaining experiments ONE at a time with per-job timeouts,
# logging to results/.  Safe to re-run: each job is skipped if its output
# file already exists and is non-empty.  Launch:
#   setsid nohup bash scripts/chip_session_r5.sh \
#     > results/chip_session_r5.log 2>&1 < /dev/null &
#
# Ordering rationale (2026-08-19 rewrite): relay windows this round have
# been short (~35 min), so jobs are ordered by information-per-minute —
# all ~15-min profiles and benches first (encode wall, prop headline,
# render north star), multi-hour quality/midscale/scale arms after.
#
# Protocol (PERF_NOTES.md): PYTHONPATH includes .axon_site, JAX_PLATFORMS
# unset, no pytest while this runs, never pattern-kill.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
unset JAX_PLATFORMS

log() { echo "[chip_session $(date -u +%H:%M:%S)] $*"; }

relay_up() { ss -tln | grep -qE ':(80[89][0-9]|81[01][0-9])'; }

wait_for_relay() {
  until relay_up; do sleep 30; done
  log "relay listeners present"
}

run_job() {  # name timeout_s outfile cmd...
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then log "$name: $out exists, skipping"; return 0; fi
  if ! relay_up; then log "$name: relay down, waiting"; wait_for_relay; fi
  log "$name: starting ($*)"
  timeout "$tmo" "$@" > "results/${name}.log" 2>&1
  local rc=$?
  log "$name: rc=$rc"
  if [ $rc -ne 0 ] && ! relay_up; then
    log "$name: relay died mid-job; waiting before continuing the queue"
    wait_for_relay
  fi
  return $rc
}

wait_for_relay

# --- tier 1: ~15-min measurements, highest info density ---------------
# (2026-08-20 00:55 reorder: relay is UP with ~95 min of round left.
#  midscale e2e — the never-completed VERDICT ask 3 — is promoted ahead of
#  everything long; the capacity-bound focal arm runs after it and writes
#  incrementally, so whatever lands by round end is kept.  prop profiles/
#  renders demoted: prop promotion already decided NO at CPU scale.)

# encode-wall measurement (7-lerp rewrite vs r3's 347 ms) — runbook item 2
run_job profile_r5_quality 2400 results/profile_r5_quality.json \
  python scripts/profile_step.py --config quality \
  --out results/profile_r5_quality.json

# perf config profile post flat-(P,)-interp fix (K-dispatch flagship shape)
run_job profile_r5_perf 1500 results/profile_r5_perf.json \
  python scripts/profile_step.py --config perf \
  --out results/profile_r5_perf.json

# focal-stage bench at the quality config (100k of the reference's 130k
# steps run in this stage — its rate matters as much as init's)
run_job bench_r5_focal 1500 results/bench_r5_focal.done \
  bash -c "python bench.py --stage focal && echo done > results/bench_r5_focal.done"

# mid-scale e2e: train -> kill mid-focal -> resume -> eval (ask 3);
# also reports the K=8 dispatch coverage fraction (ask 7)
if [ ! -s results/midscale/summary.json ]; then
  run_job midscale_r5 7200 results/midscale/summary.json \
    python scripts/midscale_run.py
fi

# --- tier 2: long arms — incremental output, keep whatever lands -------

# focal at capacity-bound scale (ask 4 — the paper's headline question):
# 300 cams, 512x384, deep tree, capacity-starved global, fixes on; one
# residual arm and one finetune arm. residual arm: capacity-starved
# global (2^8) + full residuals (2^15), 4 blocks, all three finding-7
# fixes on. finetune arm: same global, per-block tables are COPIES
# (capacity redistribution — the reference's own equal-table mechanism,
# gfnerf/config.py:119-127); no shared init-ckpt because the two modes
# store different block_prims in statics.
run_job q_r5_scale_residual 21600 results/q_r5_scale_residual.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --n-train 300 --n-val 8 --img-wh 512x384 --max-depth 14 --n-blocks 4 \
  --rays-per-batch 8192 --init-steps 4000 --split-steps 1500 \
  --rows-log2 8 --block-rows-log2 15 --block-lr 3e-4 \
  --mix-fraction 0.25 --empty-penalty 0.01 --dense-levels 2 \
  --init-ckpt results/q_r5_scale_ckpt --diag \
  --out results/q_r5_scale_residual.json
run_job q_r5_scale_finetune 21600 results/q_r5_scale_finetune.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --n-train 300 --n-val 8 --img-wh 512x384 --max-depth 14 --n-blocks 4 \
  --rays-per-batch 8192 --init-steps 4000 --split-steps 1500 \
  --rows-log2 8 --block-lr 3e-4 --focal-mode finetune --trust-mult 10.0 \
  --diag --out results/q_r5_scale_finetune.json

# --- tier 3: reached only if the long arms finish early ----------------

# render-FPS north star (<1 s / 1080p frame) + early-termination variant
run_job render_r5_quality 3600 results/render_r5_quality.json \
  python scripts/render_bench.py --config quality \
  --out results/render_r5_quality.json
run_job render_r5_quality_et 3600 results/render_r5_quality_et.json \
  python scripts/render_bench.py --config quality --early-term \
  --out results/render_r5_quality_et.json

# packed-vs-anchored on chip at full quality_run scale (ask 6; the
# CPU-scale delta is covered by results/q_r5_{packed,anchored}_cpu.json)
run_job q_r5_packed 7200 results/q_r5_packed.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --out results/q_r5_packed.json
run_job q_r5_anchored 7200 results/q_r5_anchored.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --hash-layout anchored --out results/q_r5_anchored.json

# bench for the record (always rerun last: cheap, leaves a fresh number)
run_job bench_r5_final 2000 /dev/null python bench.py

log "queue complete"
