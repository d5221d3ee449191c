#!/bin/bash
# r5 queue F: probe cells after queue D's demotions (quality cells —
# not host-timing-critical). Serialize on the TPU; one item at a time.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- 1) POS replacement operating point: pc96+ctlrank (tiny12 = gate
#         world; pc48+ctlrank failed 3/3) + immediate triangulation.
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl pos --n_images 32
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl pos --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl pos --n_images 32 --scene_seed 9100

# ---- 2) mid fine ladder: locate the frontier between 3L (fail +0.028)
#         and 6L (pass +0.0008)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 4 --stage1_precut 24 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 5 --stage1_precut 24 --n_images 32

# ---- 3) new-frontier triangulation on mid: fact50pc24 n64 + second seed
#         (the two-worlds-robust tier gets the same treatment the old
#         flagship got)
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 24 --n_images 32 --scene_seed 9100

# ---- 4) mid-world ctl gate cells at the r5 ctl operating points
#         (steering efficacy was proven on this world; the Dcos gate
#         cell should exist here too)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl pos --n_images 32

echo QUEUE_F_DONE
