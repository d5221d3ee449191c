#!/bin/bash
# r4 queue E: frontier extension (pc16), ctl speed points, flagship profile
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

cell() {  # layers precut ctl
  local layers=$1 precut=$2 ctl=$3
  local args=(--checkpoint trained_tiny12 --prune_k 3 --topk_mode approx
              --recall 0.90 --n_images 32 --prune_stage1 factorized
              --stage1_layers "$layers" --stage1_precut "$precut")
  [ "$ctl" != none ] && args+=(--ctl "$ctl")
  timeout 2400 python tools/trained_quality_cells.py "${args[@]}" 2>&1 | tail -2
}

echo "=== 12L fact17pc16 free";        cell 2 16 none
echo "=== 12L sentiment fact17pc48";   cell 2 48 sentiment
echo "=== 12L pos fact17pc48";         cell 2 48 pos
echo "=== 12L sentiment fact25pc48";   cell 3 48 sentiment

echo "=== perf fact17pc16 B=512"
env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=16 \
  timeout 2400 python bench.py 2>/tmp/qe_err.log | tail -1
tail -2 /tmp/qe_err.log

echo "=== perf fact17pc48 B=512"
env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=48 \
  timeout 2400 python bench.py 2>/tmp/qe_err.log | tail -1
tail -2 /tmp/qe_err.log

echo "QUEUE E DONE"
