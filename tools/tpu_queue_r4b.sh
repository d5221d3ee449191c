#!/bin/bash
# r4 queue B: cascade gate cells at quarter depth + ctl pc48 + fact50 perf retry
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon

cell() {  # layers precut ctl  (prune3 approx0.9 n32 fixed)
  local layers=$1 precut=$2 ctl=$3
  local args=(--checkpoint trained_tiny --prune_k 3 --topk_mode approx
              --recall 0.90 --n_images 32 --prune_stage1 factorized
              --stage1_layers "$layers" --stage1_precut "$precut")
  [ "$ctl" != none ] && args+=(--ctl "$ctl")
  timeout 2400 python tools/trained_quality_cells.py "${args[@]}" 2>&1 | tail -2
}

echo "=== fact25pc24 (layers1 pc24) free"
cell 1 24 none
echo "=== fact25pc48 free"
cell 1 48 none
echo "=== fact50pc48 sentiment"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32 \
  --prune_stage1 factorized --stage1_layers 2 --stage1_precut 48 \
  --ctl sentiment 2>&1 | tail -2
echo "=== fact50pc48 pos"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32 \
  --prune_stage1 factorized --stage1_layers 2 --stage1_precut 48 \
  --ctl pos 2>&1 | tail -2

echo "=== fact50 no-precut perf retry (B=512)"
env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_PRUNE=3 \
  CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
  CONZIC_BENCH_BATCH=512 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 \
  timeout 2400 python bench.py 2>/tmp/fact50_err.log | tail -1
tail -2 /tmp/fact50_err.log
echo "QUEUE B DONE"
