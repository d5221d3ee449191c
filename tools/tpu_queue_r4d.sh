#!/bin/bash
# r4 queue D: ctl settle + fault probe + interactive B=1 rows
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

echo "=== 12L sentiment fact50 no-precut"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32 \
  --prune_stage1 factorized --stage1_layers 6 --stage1_precut 0 \
  --ctl sentiment 2>&1 | tail -2

echo "=== fact50 no-precut fault probe: B=256, row_chunk 1600"
env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=256 \
  CONZIC_BENCH_ROW_CHUNK=1600 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 \
  timeout 2400 python bench.py 2>/tmp/qd_err.log | tail -1
tail -2 /tmp/qd_err.log

echo "=== interactive B=1 full parity"
env CONZIC_BENCH_BATCH=1 timeout 2400 python bench.py 2>/tmp/qd_err.log | tail -1
tail -2 /tmp/qd_err.log

echo "=== interactive B=1 prune5 approx0.90"
env CONZIC_BENCH_BATCH=1 CONZIC_BENCH_PRUNE=5 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 timeout 2400 python bench.py 2>/tmp/qd_err.log | tail -1
tail -2 /tmp/qd_err.log

echo "=== interactive B=1 fact17pc24"
env CONZIC_BENCH_BATCH=1 CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=2 CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qd_err.log | tail -1
tail -2 /tmp/qd_err.log

echo "QUEUE D DONE"
