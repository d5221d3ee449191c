#!/bin/bash
# r4 queue F: copy-share attack (row-chunk shapes at B=512) + fact50pc48 perf
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

bench() {
  local label="$1"; shift
  echo "=== $label"
  env "$@" timeout 2400 python bench.py 2>/tmp/qf_err.log | tail -1
  grep -E "WARNING|Error" /tmp/qf_err.log | head -2 || true
}

P3="CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512"
F17="CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 CONZIC_BENCH_STAGE1_PRECUT=24"

bench "proxy rc800 (control)"  $P3 CONZIC_BENCH_ROW_CHUNK=800
bench "proxy rc1600"           $P3 CONZIC_BENCH_ROW_CHUNK=1600
bench "proxy rc3200"           $P3 CONZIC_BENCH_ROW_CHUNK=3200
bench "fact17pc24 rc800 (control)" $P3 $F17 CONZIC_BENCH_ROW_CHUNK=800
bench "fact17pc24 rc1600"      $P3 $F17 CONZIC_BENCH_ROW_CHUNK=1600
bench "fact17pc24 rc3200"      $P3 $F17 CONZIC_BENCH_ROW_CHUNK=3200
bench "fact50pc48 (pos-ctl tier proxy)" $P3 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6 \
  CONZIC_BENCH_STAGE1_PRECUT=48
echo "QUEUE F DONE"
