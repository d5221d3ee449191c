#!/bin/bash
# r4 queue I: controlled-mode throughput (the reference's headline control
# feature finally has honest ctl-program caps/s rows)
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

echo "=== pos-ctl fact50pc48 B=512 (ctl program)"
env CONZIC_BENCH_CTL=pos CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6 \
  CONZIC_BENCH_STAGE1_PRECUT=48 \
  timeout 2400 python bench.py 2>/tmp/qi_err.log | tail -1
grep -E "WARNING|gate" /tmp/qi_err.log | head -2 || true

echo "=== sentiment-ctl fact50 no-precut B=256 rc1600 (ctl program)"
env CONZIC_BENCH_CTL=sentiment CONZIC_BENCH_PRUNE=3 \
  CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
  CONZIC_BENCH_BATCH=256 CONZIC_BENCH_ROW_CHUNK=1600 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6 \
  timeout 2400 python bench.py 2>/tmp/qi_err.log | tail -1
grep -E "WARNING|gate" /tmp/qi_err.log | head -2 || true

echo "=== pos-ctl proxy-era comparison: pos full parity B=32 (ctl program)"
env CONZIC_BENCH_CTL=pos CONZIC_BENCH_BATCH=32 \
  timeout 2400 python bench.py 2>/tmp/qi_err.log | tail -1
echo "QUEUE I DONE"
