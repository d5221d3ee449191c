#!/bin/bash
# r5 queue A: trained_mid evidence (VERDICT items 1+3) — serialize on the TPU.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# 1) control-efficacy dossier on the rich world (sentiment channel now live)
timeout 7200 python tools/control_efficacy.py --checkpoint trained_mid \
  --n_images 32 --n_samples 2 --iters 10 --k 200 \
  --out CONTROL_EFFICACY_MID.json

# 2) width/vocab transfer cells: the four shipped operating points (item 3)
timeout 3600 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 2 --stage1_precut 24 --n_images 32
timeout 3600 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --n_images 32
timeout 3600 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --ctl sentiment --n_images 32
timeout 3600 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --ctl pos --n_images 32
echo QUEUE_A_DONE
