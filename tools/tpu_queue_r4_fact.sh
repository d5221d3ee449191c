#!/bin/bash
# r4 factorized-tier perf queue (serialize: ONE TPU user).
# Paired same-VM control first (cross-VM drift rule, CLAUDE.md).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1
OUT=FACT_PERF_R4.jsonl
: > $OUT

run() {
  local label="$1"; shift
  echo "=== $label" >&2
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>/tmp/fact_bench_err.log | tail -1)
  echo "{\"label\": \"$label\", \"bench\": $line}" >> $OUT
  tail -3 /tmp/fact_bench_err.log >&2 || true
}

# 1. paired fp proxy control at the headline point
run "control:prune3+approx0.9 B=512" \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512

# 2. cascade fact50 (6 of 12 layers) pc24
run "fact50pc24:prune3 B=512" \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6 \
  CONZIC_BENCH_STAGE1_PRECUT=24

# 3. cascade fact25 (3 layers) pc24 — the auto-layer hope point
run "fact25pc24:prune3 B=512" \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=3 \
  CONZIC_BENCH_STAGE1_PRECUT=24

# 4. cascade fact17 (2 layers) pc24
run "fact17pc24:prune3 B=512" \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=24

# 5. no-precut fact50 (the ctl-modes tier: sentiment needs no precut)
run "fact50:prune3 B=512" \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6

echo "QUEUE DONE" >&2
