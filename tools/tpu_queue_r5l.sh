#!/bin/bash
# r5 queue L: windowed candidate encode (--clip_window) measurement.
# Host must be otherwise idle (1-core host; CLAUDE.md).
#
# The synthetic bench vocab averages ~5.5 CLIP pieces/word (real BERT:
# ~1.3), so at the headline len=10 the assembled rows run ~64 pieces
# and the window cannot engage under clip_len=77. SENTENCE_LEN=3
# reproduces the ~25-piece content that REAL vocab yields at the
# reference's len=10 — the window's production regime. All rows are
# paired (win off vs on) at the same config, same VM.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- A) production-regime emulation: short content under the len77
#         static bound, full parity, B=8 (the reference demo shape)
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_BATCH=8 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_BATCH=8 \
  CONZIC_BENCH_CLIP_WINDOW=48 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_BATCH=8 \
  CONZIC_BENCH_CLIP_WINDOW=32 python bench.py

# ---- B) same regime on the pruned len77 tier (prune20 = the
#         quality-bounded len77 frontier)
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 python bench.py
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 CONZIC_BENCH_SENTENCE_LEN=3 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 CONZIC_BENCH_CLIP_WINDOW=48 python bench.py

# ---- C) honesty row: the headline len=10 content (~64 pieces) cannot
#         fit the window — win=48 must be ~neutral vs queue E's 5.29
#         (the per-chunk cond always takes the full-width branch)
timeout 7200 env CONZIC_BENCH_SKIP_TORCH=1 \
  CONZIC_BENCH_CLIP_LEN=77 CONZIC_BENCH_PRUNE=20 \
  CONZIC_BENCH_BATCH=64 CONZIC_BENCH_CLIP_WINDOW=48 python bench.py

echo QUEUE_L_DONE
