#!/bin/bash
# r5 queue E (final form): timing-critical full-size benches. Host must
# be otherwise idle (1-core host; see CLAUDE.md). Run AFTER queues F/H
# — the quality verdicts those landed picked these operating points:
#   tiny12-world flagship (fails mid): fact17pc24 — record row only
#   two-worlds-robust free frontier:   fact50pc48 (mid 3/3 under)
#   sentiment ctl: fact50pc96+ctlrank  POS ctl: fact50pc96+ctlrank
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- 1) same-VM proxy control (calibrates this VM against the
#         published 82.42) + the two-worlds-robust free frontier:
#         fact50pc32 (queue J2: mid 3/3 under) with pc48 as the
#         conservative sibling
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 \
  CONZIC_BENCH_BATCH=512 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=32 \
  CONZIC_BENCH_BATCH=512 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=32 \
  CONZIC_BENCH_BATCH=256 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=48 \
  CONZIC_BENCH_BATCH=512 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=48 \
  CONZIC_BENCH_BATCH=256 python bench.py

# ---- 2) tiny12-world flagship record row (its gate now honestly fails
#         on trained_mid; the row stays published with world named)
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=2 CONZIC_BENCH_STAGE1_PRECUT=24 \
  CONZIC_BENCH_BATCH=512 python bench.py

# ---- 3) sentiment ctlrank tier pair at the operating point
#         (fact50pc96, B=256): default (ctlrank auto=on) vs
#         STAGE1_CTL=off — the pair isolates the steering fix's cost
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CTL=sentiment \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=96 \
  CONZIC_BENCH_BATCH=256 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CTL=sentiment \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=96 \
  CONZIC_BENCH_STAGE1_CTL=off \
  CONZIC_BENCH_BATCH=256 python bench.py

# ---- 4) POS tier at its NEW operating point (pc96+ctlrank — pc48
#         failed the r5 gate 3/3): measure both batches
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CTL=pos \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=96 \
  CONZIC_BENCH_BATCH=512 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CTL=pos \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=96 \
  CONZIC_BENCH_BATCH=256 python bench.py

# ---- 5) len77 candidates (VERDICT item 2's speed half). fact50pc24
#         passes on trained_mid (-0.0057; tiny12 disagreed — world-
#         contingent); prune20-proxy is the same-VM honest control.
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CLIP_LEN=77 \
  CONZIC_BENCH_PRUNE=10 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.95 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=24 \
  CONZIC_BENCH_BATCH=128 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CLIP_LEN=77 \
  CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 python bench.py
#    queue-I find: prune3+fact50pc48@len77 passes Dcos on mid (-0.0125)
#    at ~3.3x less stage-2 work than the prune10 rows
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_CLIP_LEN=77 \
  CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.95 CONZIC_BENCH_STAGE1=factorized \
  CONZIC_BENCH_STAGE1_LAYERS=6 CONZIC_BENCH_STAGE1_PRECUT=48 \
  CONZIC_BENCH_BATCH=128 python bench.py

echo QUEUE_E_DONE
