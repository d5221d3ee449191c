#!/bin/bash
# r5 queue H: locate the mid-robust free frontier + make the bench gate
# honest about the width-transfer fail. Quality cells — not host-timing-
# critical. Serialize on the TPU; one item at a time.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- 1) persist the mid fact17pc24 fail at BOTH sample sizes (queue C
#         measured +0.0441 @n32 but never persisted; bench's gate reads
#         the largest @n key, so @n64 must carry the mid estimate too —
#         otherwise the 55.76 caps/s point still reports under-gate)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 2 --stage1_precut 24 --n_images 32
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 2 --stage1_precut 24 --n_images 64

# ---- 2) triangulate mid fact50pc48 (the surviving @n32 pass -0.0008):
#         n64 + second seed, the same treatment that demoted fact50pc24
timeout 7200 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --n_images 64
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --n_images 32 --scene_seed 9100

# ---- 3) mid free fact50pc96 probe (the ctl cells pass at pc96 on this
#         world; if free passes too, the pre-cut-width hypothesis holds
#         and pc96 is the mid-robust cascade point)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 96 --n_images 32

# ---- 4) mid free fact50 no-precut anchor (no proxy pre-cut at all —
#         the conservative end of the cascade)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --n_images 32

echo QUEUE_H_DONE
