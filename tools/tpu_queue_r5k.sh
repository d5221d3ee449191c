#!/bin/bash
# r5 queue K: two-worlds evidence for the pc32 frontier (mid 3/3 under;
# tiny12 cell completes the cross-world claim like pc48's -0.0143).
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 32 --n_images 32
echo QUEUE_K_DONE
