#!/bin/bash
# r5 queue G: land the mid-world fact17pc24 overwrites at BOTH sample
# sizes. Queue C measured mid fact17pc24 at +0.0441 but never persisted
# it to PRUNING_MATRIX.json, so bench's gate still resolves the tiny12
# @n64 cell (+0.0084, under) and reports the 55.76 caps/s point as
# under-gate — contradicting the r5 width-transfer verdict. The gate
# reads the LARGEST @n sample, so both n32 and n64 must carry the mid
# estimate.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 2 --stage1_precut 24 --n_images 32
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 2 --stage1_precut 24 --n_images 64

echo QUEUE_G_DONE
