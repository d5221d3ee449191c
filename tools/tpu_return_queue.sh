#!/bin/bash
# The serialized measurement queue parked during the r3 s6/s7 axon TPU
# outage (ROADMAP "r3 s7" note). Run ON the TPU, with NOTHING else
# touching the device (CLAUDE.md: one TPU process at a time). Each step
# appends to $LOG; quality cells merge into PRUNING_MATRIX.json via the
# tools' own --merge semantics. Stop at any step — order is
# most-valuable-first and steps are independent.
#
# Usage:
#   PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
#     bash tools/tpu_return_queue.sh [logfile]
set -u -o pipefail  # rc= lines must report the tool, not tee
cd "$(dirname "$0")/.."
LOG=${1:-TPU_QUEUE_RUN.log}
run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? ===" | tee -a "$LOG"
}

# 1. headline sanity: full parity should reproduce ~3.19-3.24 caps/s
run python bench.py

# 2. int8 tier speed (fresh programs: first run pays the remote compile)
run env CONZIC_BENCH_QUANT=int8 python bench.py
run env CONZIC_BENCH_QUANT=int8_all python bench.py

# 3. int8_all stacked on the fastest quality-bounded point
#    (prune3+approx0.90/B=512 measured 82.4 caps/s fp; the int8 upside is
#    bounded by the 1.47x op-level rate — gate will warn until step 4's
#    quality cells exist)
run env CONZIC_BENCH_QUANT=int8_all CONZIC_BENCH_PRUNE=3 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
    CONZIC_BENCH_BATCH=512 python bench.py

# 4. quality cells for the quant tiers (full-size random models)
run python tools/validate_quant.py --random_models --quant int8
run python tools/validate_quant.py --random_models --quant int8_all
#    pruned+quant cells (key suffix +int8_all), incl. the stacked point
run python tools/approx_quality_cells.py --prune_k 3 --recall 0.90 \
    --quant int8_all --n_images 16
run python tools/approx_quality_cells.py --prune_k 5 --recall 0.95 \
    --quant int8_all --n_images 16
#    controlled-mode cells at the prune3 operating point (the fp ctl
#    cells exist only at prune5 — stage-1 pruning ignores the gamma=5
#    control term entirely, so the aggressive prune3 point needs its own
#    ctl quality evidence before anyone quotes it for controlled runs)
run python tools/approx_quality_cells.py --prune_k 3 --recall 0.90 \
    --ctl pos --n_images 16
run python tools/approx_quality_cells.py --prune_k 3 --recall 0.90 \
    --ctl sentiment --n_images 16

# 4b. quant-tier attribution on the pruned ladder: CLIP-only int8 at the
#     same stacked point (separates the CLIP-tower vs BERT-tower
#     contributions of step 3's int8_all number), and int8_all at the
#     milder prune5/approx0.95/B=256 point (the 62.9 caps/s fp cell) to
#     see whether the quant win survives a larger stage-2 share
run env CONZIC_BENCH_QUANT=int8 CONZIC_BENCH_PRUNE=3 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
    CONZIC_BENCH_BATCH=512 python bench.py
run env CONZIC_BENCH_QUANT=int8_all CONZIC_BENCH_PRUNE=5 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.95 \
    CONZIC_BENCH_BATCH=256 python bench.py

# 4c. mask_impl=compare (EXACT, test-pinned byte-identical): swaps the
#     pruned tier's largest single op (the f32[V] stop-mask gather,
#     691 us/position at approx/B=256) for a fused compare-reduce.
#     Expected ceiling ~+2-3% (ROADMAP r4 #4); measure at the two top
#     pruned points — adopt as default only on a win at both
run env CONZIC_BENCH_MASK_IMPL=compare CONZIC_BENCH_PRUNE=3 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
    CONZIC_BENCH_BATCH=512 python bench.py
run env CONZIC_BENCH_MASK_IMPL=compare CONZIC_BENCH_PRUNE=5 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.95 \
    CONZIC_BENCH_BATCH=256 python bench.py

# 5. the parked prune3/B=512 flag-sweep copy-share probe (r3 s6)
run python tools/flag_sweep.py --prune 3 --topk_mode approx --recall 0.90 \
    --batch 512 --only winner,base,winner_lhs,winner_async,vmem64_no_dsr,mbl_off

# 6. headline stability re-check after everything (warm cache: seconds)
run python bench.py

echo "queue complete — fold numbers into BASELINE.md / ROADMAP.md and" \
     "commit PRUNING_MATRIX.json" | tee -a "$LOG"
