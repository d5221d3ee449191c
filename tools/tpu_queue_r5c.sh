#!/bin/bash
# r5 queue C: ctl-aware stage-1 rank (ctlrank) evidence + the r5b
# remainder. Serialize on the TPU; one item at a time.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- 1) the headline capability fix: does control steering survive the
#         speed tiers under the ctl-aware rank? (labels +ctlrank)
timeout 10800 python tools/control_efficacy.py --checkpoint trained_mid \
  --n_images 32 --n_samples 2 --iters 10 --k 200 \
  --out CONTROL_EFFICACY_MID_CTLRANK.json

# ---- 2) Δcos gate cells for the ctlrank ctl tiers (the operating
#         points' quality bound under the new rank), tiny12 = gate world
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 32

# ---- 3) ctlrank tier throughput with a paired same-VM cosine-only
#         control (full-size models; sentiment tier = fact50pc96)
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

# ---- 4) r5b remainder: the trained_mid re-gate ladder (free tiers —
#         where does the wider world's passing frontier sit?)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 3 --stage1_precut 24 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --stage1_precut_mode tower \
  --stage1_precut_layers 2 --n_images 32

# ---- 5) ctl table-vs-exact on trained weights (VERDICT item 4)
timeout 7200 python tools/ctl_table_vs_exact.py --checkpoint trained_tiny12 \
  --n_images 16

# ---- 6) len77 tower-cascade quality cells (VERDICT item 2)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 10 --topk_mode approx --recall 0.95 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --stage1_precut_mode tower \
  --stage1_precut_layers 2 --clip_len 77 --n_images 16
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 10 --topk_mode approx --recall 0.95 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --clip_len 77 --n_images 16

echo QUEUE_C_DONE
