#!/bin/bash
# r5 queue J2: triangulate the pc32 width-sweep pass (mid @n32 -0.0041)
# — pc24's @n32 pass did not survive this exact treatment, so the
# frontier only moves if pc32 holds at n64 + a second seed.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 32 --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 32 --n_images 32 --scene_seed 9100

echo QUEUE_J2_DONE
