#!/bin/bash
# r3 s9 continuation of tools/tpu_return_queue.sh after the int8 verdict:
# steps 1-3 of the original queue measured the int8/int8_all tiers as
# definitive end-to-end LOSERS (full parity 1.75 vs 3.25 caps/s; pruned
# prune3/B=512 51.3 vs 82.4 — the per-matmul quantize/dequantize ops are
# fusion barriers, same mechanism as the six losing attention
# reformulations). The original queue's remaining int8 QUALITY steps are
# therefore moot (a tier that is slower AND approximate needs no quality
# bound) — this trimmed queue keeps only the still-valuable steps.
# Serialize: one TPU user at a time (CLAUDE.md).
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-TPU_QUEUE_RUN.log}
run() {
  echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? ===" | tee -a "$LOG"
}

# 1. controlled-mode quality cells at the prune3 operating point (the
#    80-82 caps/s point has no ctl quality evidence; stage-1 pruning
#    ignores the gamma term entirely so these cells are load-bearing)
run python tools/approx_quality_cells.py --prune_k 3 --recall 0.90 \
    --ctl pos --n_images 16
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

# 3. the parked prune3/B=512 flag-sweep copy-share probe (r3 s6)
run python tools/flag_sweep.py --prune 3 --topk_mode approx --recall 0.90 \
    --batch 512 --only winner,base,winner_lhs,winner_async,vmem64_no_dsr,mbl_off

# 4. sample upgrade for the quoted 64.3 caps/s point (prune5+approx0.90
#    currently gates on an n16 cell; n32 matches the prune3 evidence bar)
run python tools/approx_quality_cells.py --prune_k 5 --recall 0.90 \
    --n_images 32

# 5. headline stability re-check (warm cache: seconds)
run python bench.py

echo "s9 queue complete — fold into BASELINE.md / ROADMAP.md, commit" \
     "PRUNING_MATRIX.json" | tee -a "$LOG"
