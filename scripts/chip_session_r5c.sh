#!/bin/bash
# Round-5 final-window chip queue (supersedes chip_session_r5.sh).
#
# The 01:04 UTC window taught us: relay LISTENERS can be up while the
# external tunnel is dead — every job (profile_r5_perf, bench focal, a
# bare jax.devices() probe) wedged before backend init.  So this runner
# waits for relay HEALTH (a 120 s jax.devices() probe), not just
# listeners, before each job.
#
# Launch:
#   setsid nohup bash scripts/chip_session_r5c.sh \
#     > results/chip_session_r5c.log 2>&1 < /dev/null &
#
# Order (final ~70 min of round 5): one quick window-validator profile,
# then the capacity-bound focal arm (VERDICT r4's headline ask; writes
# its JSON incrementally so partials survive round end), then the rest.

set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
unset JAX_PLATFORMS

log() { echo "[r5c $(date -u +%H:%M:%S)] $*"; }

relay_healthy() {
  ss -tln | grep -qE ':(80[89][0-9]|81[01][0-9])' || return 1
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_for_health() {
  until relay_healthy; do sleep 45; done
  log "relay HEALTHY (devices probe passed)"
}

run_job() {  # name timeout_s outfile cmd...
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then log "$name: $out exists, skipping"; return 0; fi
  wait_for_health
  log "$name: starting ($*)"
  timeout "$tmo" "$@" > "results/${name}.log" 2>&1
  local rc=$?
  log "$name: rc=$rc"
  return $rc
}

log "waiting for relay health"
wait_for_health

# window validator + flat-interp perf-config measurement (vs the
# falsified lane-slice 247 ms encode_fwd in profile_r5_perf_laneslice)
run_job profile_r5_perf 1200 results/profile_r5_perf.json \
  python scripts/profile_step.py --config perf \
  --out results/profile_r5_perf.json

# focal at capacity-bound scale (VERDICT r4 ask 2 — the paper's headline
# question).  Incremental JSON: after_init + per-split deltas land as
# they complete.
run_job q_r5_scale_residual 21600 results/q_r5_scale_residual.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --n-train 300 --n-val 8 --img-wh 512x384 --max-depth 14 --n-blocks 4 \
  --rays-per-batch 8192 --init-steps 4000 --split-steps 1500 \
  --rows-log2 8 --block-rows-log2 15 --block-lr 3e-4 \
  --mix-fraction 0.25 --empty-penalty 0.01 --dense-levels 2 \
  --init-ckpt results/q_r5_scale_ckpt --diag \
  --out results/q_r5_scale_residual.json

run_job bench_r5_focal 1800 results/bench_r5_focal.done \
  bash -c "python bench.py --stage focal && echo done > results/bench_r5_focal.done"

if [ ! -s results/midscale/summary.json ]; then
  run_job midscale_r5 7200 results/midscale/summary.json \
    python scripts/midscale_run.py
fi

run_job q_r5_scale_finetune 21600 results/q_r5_scale_finetune.json \
  python scripts/quality_run.py --config perf --scene-variant smooth \
  --n-train 300 --n-val 8 --img-wh 512x384 --max-depth 14 --n-blocks 4 \
  --rays-per-batch 8192 --init-steps 4000 --split-steps 1500 \
  --rows-log2 8 --block-lr 3e-4 --focal-mode finetune --trust-mult 10.0 \
  --diag --out results/q_r5_scale_finetune.json

run_job render_r5_quality 3600 results/render_r5_quality.json \
  python scripts/render_bench.py --config quality \
  --out results/render_r5_quality.json
run_job render_r5_quality_et 3600 results/render_r5_quality_et.json \
  python scripts/render_bench.py --config quality --early-term \
  --out results/render_r5_quality_et.json

log "queue complete"
