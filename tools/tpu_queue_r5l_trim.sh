#!/bin/bash
# r5 queue L (trimmed for one-session wall clock, cold cache VM):
# the decision-relevant prune20-len77 pair first, win=48 before the
# control so the long cond-doubled cold compile overlaps the CPU test
# suite tail while the TIMED phases stay serialized on an idle host.
# Then the honesty row (C) and the full-parity pair (A) if time remains.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- B2) prune20 len77 windowed (cold compile dominates; timed phase
#          lands after pytest ends)
timeout 4500 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 CONZIC_BENCH_CLIP_WINDOW=48 python bench.py
echo "=== B2_DONE $(date +%s)"

# ---- B1) paired control: same config, window off
timeout 4500 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 python bench.py
echo "=== B1_DONE $(date +%s)"

# ---- C) honesty row: headline len=10 content (~64 synthetic pieces)
#         cannot fit the window — win=48 must be ~neutral vs queue E 5.29
timeout 4500 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 CONZIC_BENCH_CLIP_WINDOW=48 python bench.py
echo "=== C_DONE $(date +%s)"

# ---- A) full-parity pair at the reference demo shape (B=8)
timeout 4500 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_BATCH=8 \
  CONZIC_BENCH_CLIP_WINDOW=48 python bench.py
echo "=== A2_DONE $(date +%s)"
timeout 4500 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_BATCH=8 python bench.py
echo "=== A1_DONE $(date +%s)"

echo QUEUE_L_DONE
