#!/bin/bash
# CPU smoke of every script in the round-5 chip queue (tiny shapes): a
# crash found here is a relay window saved. Chained behind the midscale
# rehearsal when a PID is given. Logs to results/cpu_smoke_r5/.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu PYTHONPATH=/root/repo
mkdir -p results/cpu_smoke_r5

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi

run() {  # name cmd...
  local name=$1; shift
  if [ -s "results/cpu_smoke_r5/${name}.rc" ]; then
    echo "[smoke] $name: done already"; return 0; fi
  echo "[smoke] $name: starting $(date -u +%H:%M:%S)"
  nice -n 19 timeout 5400 "$@" > "results/cpu_smoke_r5/${name}.log" 2>&1
  echo $? > "results/cpu_smoke_r5/${name}.rc"
  echo "[smoke] $name: rc=$(cat results/cpu_smoke_r5/${name}.rc)"
}

# profile_step on all three configs (guards chip queue items 2/3/3b)
run profile_quality python scripts/profile_step.py --config quality \
  --rays 64 --iters 1 --out results/cpu_smoke_r5/profile_quality.json
run profile_perf python scripts/profile_step.py --config perf \
  --rays 64 --iters 1 --out results/cpu_smoke_r5/profile_perf.json
run profile_prop python scripts/profile_step.py --config prop \
  --rays 64 --iters 1 --out results/cpu_smoke_r5/profile_prop.json

# render_bench, tiny frame (guards render_r5_{quality,prop})
run render_quality python scripts/render_bench.py --config quality \
  --width 64 --height 48 --frames 1 --chunk 1024 \
  --out results/cpu_smoke_r5/render_quality.json
run render_prop python scripts/render_bench.py --config prop \
  --width 64 --height 48 --frames 1 --chunk 1024 \
  --out results/cpu_smoke_r5/render_prop.json

# bench CPU fallback on the queued variants (guards bench_r5_{prop,focal})
run bench_prop python bench.py --config prop --cpu-fallback
run bench_focal python bench.py --stage focal --cpu-fallback

# scale-arm shape check: full image/dtype/depth shapes at 3+2 steps,
# 12 cams, 1 val image (guards q_r5_scale_residual/finetune shapes)
run scale_residual_shapes python scripts/quality_run.py --config perf \
  --scene-variant smooth --n-train 12 --n-val 1 --img-wh 512x384 \
  --max-depth 14 --n-blocks 4 --rays-per-batch 8192 \
  --init-steps 3 --split-steps 2 --rows-log2 8 --block-rows-log2 15 \
  --block-lr 3e-4 --mix-fraction 0.25 --empty-penalty 0.01 \
  --dense-levels 2 --out results/cpu_smoke_r5/scale_residual_shapes.json
run scale_finetune_shapes python scripts/quality_run.py --config perf \
  --scene-variant smooth --n-train 12 --n-val 1 --img-wh 512x384 \
  --max-depth 14 --n-blocks 4 --rays-per-batch 8192 \
  --init-steps 3 --split-steps 2 --rows-log2 8 \
  --block-lr 3e-4 --focal-mode finetune --trust-mult 10.0 \
  --out results/cpu_smoke_r5/scale_finetune_shapes.json

echo "[smoke] all done $(date -u +%H:%M:%S)"
