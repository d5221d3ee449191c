#!/bin/bash
# r5 queue B: len77 tower cascade + ctl table-vs-exact + triangulation.
# Serialize on the TPU; run AFTER queue A.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# 0) the trained_mid re-gate ladder: fact17pc24 FAILED the gate on the
#    wider world (+0.0441 @n32) — find the passing depth (item 3 verdict)
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

# 1) ctl table-vs-exact on trained weights (VERDICT item 4)
timeout 7200 python tools/ctl_table_vs_exact.py --checkpoint trained_tiny12 --n_images 16

# 2) len77 quality cells for the tower cascade on trained_mid
#    (12L tower; fact50=6L main, fact17=2L tower pre-cut; prune10 as the
#    published len77 ladder; rich world has ~20-word captions)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 10 --topk_mode approx --recall 0.95 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --stage1_precut_mode tower \
  --stage1_precut_layers 2 --clip_len 77 --n_images 16
#    control: same cell with the (collapsing) proxy pre-cut, same session
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 10 --topk_mode approx --recall 0.95 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --clip_len 77 --n_images 16

# 3) triangulation of the marginal ctl cells (VERDICT item 5): n64 + seed
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 32 --scene_seed 9100
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 32 --scene_seed 9100
echo QUEUE_B_DONE
