#!/bin/bash
# r4 queue G: flagship evidence hardening
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

echo "=== flagship cell @n64 (12L fact17pc24)"
timeout 3600 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 64 \
  --prune_stage1 factorized --stage1_layers 2 --stage1_precut 24 2>&1 | tail -2

echo "=== flagship cell seed-1 replication (@n32@s1)"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32 --scene_seed 1 \
  --prune_stage1 factorized --stage1_layers 2 --stage1_precut 24 2>&1 | tail -2

echo "=== 12L len77 factorized cell (prune10+fact17pc24+approx0.95 @n16)"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 10 --topk_mode approx --recall 0.95 --n_images 16 --clip_len 77 \
  --prune_stage1 factorized --stage1_layers 2 --stage1_precut 24 2>&1 | tail -2

echo "=== perf len77 prune10+fact17pc24 B=128"
env CONZIC_BENCH_PRUNE=10 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.95 CONZIC_BENCH_BATCH=128 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=2 CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qg_err.log | tail -1
grep -E "WARNING|Error" /tmp/qg_err.log | head -2 || true

echo "=== flagship batch curve B=256"
env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=256 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qg_err.log | tail -1

echo "=== flagship batch curve B=1024"
env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=1024 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qg_err.log | tail -1
echo "QUEUE G DONE"
