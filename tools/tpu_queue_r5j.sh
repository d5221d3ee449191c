#!/bin/bash
# r5 queue J: pre-cut width sweep between the mid-world fail (pc24,
# 31.2 caps/s) and the robust pass (pc48, ~18.9) — if pc32/pc40 pass,
# the two-worlds frontier moves up. Probe @n32 first; triangulation of
# any pass is queued separately (n64 + second seed).
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 40 --n_images 32
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 32 --n_images 32

echo QUEUE_J_DONE
