#!/bin/bash
# Round-5 chip queue, unattended (docs/TPU_RUNBOOK_R5.md).
#
# Runs the remaining experiments in information-value order with per-job
# timeouts, ONE job at a time, logging to results/.  Safe to re-run: each
# job is skipped if its output JSON already exists.  Launch:
#   nohup bash scripts/chip_session_r5.sh > results/chip_session_r5.log 2>&1 &
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

# 2. encode-wall measurement (7-lerp rewrite vs r3's 347 ms)
run_job profile_r5_quality 2400 results/profile_r5_quality.json \
  python scripts/profile_step.py --config quality \
  --out results/profile_r5_quality.json

# 3. perf config profile (K-dispatch flagship shape)
run_job profile_r5_perf 2400 results/profile_r5_perf.json \
  python scripts/profile_step.py --config perf \
  --out results/profile_r5_perf.json

# 3b. proposal-path profile
run_job profile_r5_prop 2400 results/profile_r5_prop.json \
  python scripts/profile_step.py --config prop \
  --out results/profile_r5_prop.json

# 4. proposal quality (if >= dense-384 quality, prop becomes the flagship)
run_job quality_prop_r5 10800 results/quality_prop_r5.json \
  python scripts/quality_run.py --config prop --scene-variant smooth \
  --out results/quality_prop_r5.json

# 7. packed-vs-anchored delta at the full CPU-run scale, on chip
run_job q_r5_packed 7200 results/q_r5_packed.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --out results/q_r5_packed.json
run_job q_r5_anchored 7200 results/q_r5_anchored.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --hash-layout anchored --out results/q_r5_anchored.json

# 6. mid-scale e2e: train -> kill mid-focal -> resume -> eval
if [ ! -s results/midscale/summary.json ]; then
  run_job midscale_r5 10800 results/midscale/summary.json \
    python scripts/midscale_run.py
fi

# 5+8. focal at capacity-bound scale (the paper's headline question):
# 300 cams, 512x384, deep tree, capacity-starved global, fixes on; one
# residual arm and one finetune arm sharing the init checkpoint.
# residual arm: capacity-starved global (2^8) + full residuals (2^15),
# 4 blocks, all three finding-7 fixes on. finetune arm: same global, the
# per-block tables are COPIES (capacity redistribution: each 2^8 copy
# covers 1/4 of the scene — the reference's own equal-table mechanism,
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

# render-FPS north-star measurement (<1 s / 1080p frame): quality + prop
run_job render_r5_quality 3600 results/render_r5_quality.json \
  python scripts/render_bench.py --config quality \
  --out results/render_r5_quality.json
run_job render_r5_prop 3600 results/render_r5_prop.json \
  python scripts/render_bench.py --config prop \
  --out results/render_r5_prop.json

# bench for the record (always rerun last: cheap, leaves a fresh number)
run_job bench_r5_final 2000 /dev/null python bench.py

log "queue complete"
