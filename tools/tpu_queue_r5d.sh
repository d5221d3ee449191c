#!/bin/bash
# r5 queue D: the queue-C remainder, phase 1 — quality/evidence cells
# (Δcos cells are not host-timing-critical; benches live in queue E).
# Serialize on the TPU; one item at a time.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- 1) POS ctlrank gate cell (queue C item 2 remainder; tiny12 = gate
#         world). Sentiment cell landed at +0.0043 @n32 under.
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 32

# ---- 2) trained_mid re-gate ladder (free tiers — where does the wider
#         world's passing frontier sit? fact17pc24 failed at +0.0441)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 3 --stage1_precut 24 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --n_images 32
#    tower pre-cut at the same budget: does replacing the bag fix the cut?
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --stage1_precut_mode tower \
  --stage1_precut_layers 2 --n_images 32

# ---- 3) ctl table-vs-exact on trained weights (VERDICT item 4)
timeout 7200 python tools/ctl_table_vs_exact.py --checkpoint trained_tiny12 \
  --n_images 16

# ---- 4) len77 tower-cascade quality cells (VERDICT item 2)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 10 --topk_mode approx --recall 0.95 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --stage1_precut_mode tower \
  --stage1_precut_layers 2 --clip_len 77 --n_images 16
#    control: same cell with the (collapsing) proxy pre-cut, same session
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 10 --topk_mode approx --recall 0.95 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --clip_len 77 --n_images 16

# ---- 5) triangulation of the NEW ctlrank operating points (VERDICT
#         item 5 transferred to the r5 cells): n64 + second scene seed
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 32 \
  --scene_seed 9100
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 32 \
  --scene_seed 9100

echo QUEUE_D_DONE
