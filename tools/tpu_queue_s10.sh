#!/bin/bash
# r3 s10: the steps of tools/tpu_queue_s9.sh that the s9 session did not
# reach before ending (its log shows step 1 POS only; the sentiment ctl
# cell, both mask_impl benches, the flag probe and the prune5 n32 cell
# are still missing from PRUNING_MATRIX.json / BASELINE.md). Reordered
# by value so an interrupted run still lands the load-bearing evidence
# first. Serialize: one TPU user at a time (CLAUDE.md).
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-TPU_QUEUE_RUN.log}
run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? ===" | tee -a "$LOG"
}

# 1. the missing controlled-mode quality cell at the prune3 operating
#    point (POS landed in s9; sentiment did not — stage-1 pruning ignores
#    the gamma term entirely so this cell is load-bearing)
run python tools/approx_quality_cells.py --prune_k 3 --recall 0.90 \
    --ctl sentiment --n_images 16

# 2. mask_impl=compare (EXACT, byte-identical) at the two top pruned
#    points; adopt as default only on a win at both (~+2-3% ceiling)
run env CONZIC_BENCH_MASK_IMPL=compare CONZIC_BENCH_PRUNE=3 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
    CONZIC_BENCH_BATCH=512 python bench.py
run env CONZIC_BENCH_MASK_IMPL=compare CONZIC_BENCH_PRUNE=5 \
    CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.95 \
    CONZIC_BENCH_BATCH=256 python bench.py
# 2b. same-session fp control points (fresh VM — absolute numbers drift
#     run to run; the adopt/reject call needs paired measurements)
run env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
    CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 python bench.py
run env CONZIC_BENCH_PRUNE=5 CONZIC_BENCH_TOPK_MODE=approx \
    CONZIC_BENCH_TOPK_RECALL=0.95 CONZIC_BENCH_BATCH=256 python bench.py

# 3. sample upgrade for the quoted 64.3 caps/s point (prune5+approx0.90
#    currently gates on an n16 cell; n32 matches the prune3 evidence bar)
run python tools/approx_quality_cells.py --prune_k 5 --recall 0.90 \
    --n_images 32

# 4. the parked prune3/B=512 flag-sweep copy-share probe (r3 s6)
run python tools/flag_sweep.py --prune 3 --topk_mode approx --recall 0.90 \
    --batch 512 --only winner,base,winner_lhs,winner_async,vmem64_no_dsr,mbl_off

# 5. headline stability re-check (warm cache: seconds)
run python bench.py

echo "s10 queue complete — fold into BASELINE.md / ROADMAP.md, commit" \
     "PRUNING_MATRIX.json" | tee -a "$LOG"
