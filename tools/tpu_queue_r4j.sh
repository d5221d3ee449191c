#!/bin/bash
# r4 queue J: unprobed factorized-frontier cells (quality first, perf only
# for gate-passers, paired same-session controls per the r3 s11 rule).
#
# Motivating evidence (no blind re-probes):
#  - prune2 proxy fails hard (+0.1254 trained) but fact17pc24's exact
#    rescore repaired prune3 to +0.0056; prune_k=2 cuts a third of the
#    stage-2 encode at the 55.76 caps/s flagship -> worth one cell.
#  - pos fact50pc24 passed on the 4L tower (+0.0046) but was never
#    confirmed on 12L; pc24 is FASTER than the published pos tier's pc48
#    (18.88 caps/s) -> a 12L cell + perf row could raise the POS tier.
#  - sentiment pc48 straddles the gate (+0.0110 12L / +0.0098 4L) while
#    no-precut passes (-0.0032) at only 4.92 caps/s -> probe pc96, the
#    midpoint of the cascade knob.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon
export CONZIC_BENCH_SKIP_TORCH=1

echo "=== [q1] cell prune2+fact17pc24+approx0.9 @n32 (12L)"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_stage1 factorized --stage1_layers 2 --stage1_precut 24 \
  --prune_k 2 --topk_mode approx --recall 0.90 --n_images 32 2>&1 | tail -2

echo "=== [q2] cell pos prune3+fact50pc24+approx0.9 @n32 (12L)"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --ctl pos --prune_stage1 factorized --stage1_layers 6 --stage1_precut 24 \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32 2>&1 | tail -2

echo "=== [q3] cell sentiment prune3+fact50pc96+approx0.9 @n32 (12L)"
timeout 2400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --ctl sentiment --prune_stage1 factorized --stage1_layers 6 --stage1_precut 96 \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32 2>&1 | tail -2

echo "=== [p0] paired control: fact17pc24 prune3 B=512 (published 55.76)"
env CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qj_err.log | tail -1
grep -E "gate" /tmp/qj_err.log | head -2 || true

echo "=== [p1] prune2+fact17pc24 B=512"
env CONZIC_BENCH_PRUNE=2 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=2 \
  CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qj_err.log | tail -1
grep -E "gate" /tmp/qj_err.log | head -2 || true

echo "=== [p2] pos-ctl fact50pc24 B=512 (ctl program; published pc48 = 18.88)"
env CONZIC_BENCH_CTL=pos CONZIC_BENCH_PRUNE=3 CONZIC_BENCH_TOPK_MODE=approx \
  CONZIC_BENCH_TOPK_RECALL=0.90 CONZIC_BENCH_BATCH=512 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6 \
  CONZIC_BENCH_STAGE1_PRECUT=24 \
  timeout 2400 python bench.py 2>/tmp/qj_err.log | tail -1
grep -E "gate" /tmp/qj_err.log | head -2 || true

echo "=== [p3] sentiment-ctl fact50pc96 B=256 (ctl program; no-precut = 4.92)"
env CONZIC_BENCH_CTL=sentiment CONZIC_BENCH_PRUNE=3 \
  CONZIC_BENCH_TOPK_MODE=approx CONZIC_BENCH_TOPK_RECALL=0.90 \
  CONZIC_BENCH_BATCH=256 \
  CONZIC_BENCH_STAGE1=factorized CONZIC_BENCH_STAGE1_LAYERS=6 \
  CONZIC_BENCH_STAGE1_PRECUT=96 \
  timeout 2400 python bench.py 2>/tmp/qj_err.log | tail -1
grep -E "gate" /tmp/qj_err.log | head -2 || true

echo "QUEUE J DONE"
