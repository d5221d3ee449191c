#!/bin/bash
# r4 queue H: len77 factorized under-gate point + driver bench warm
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

echo "=== 12L len77 cell prune10+fact50pc24+approx0.95 @n16"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 10 --topk_mode approx --recall 0.95 --n_images 16 --clip_len 77 \
  --prune_stage1 factorized --stage1_layers 6 --stage1_precut 24 2>&1 | tail -2

echo "=== perf len77 prune10+fact50pc24 B=128"
env CONZIC_BENCH_PRUNE=10 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.95 CONZIC_BENCH_BATCH=128 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qh_err.log | tail -1
grep -E "WARNING" /tmp/qh_err.log | head -2 || true

echo "=== default driver bench (B=32 full parity, warms the cache)"
timeout 2400 python bench.py 2>/tmp/qh_err.log | tail -1
tail -2 /tmp/qh_err.log
echo "QUEUE H DONE"
