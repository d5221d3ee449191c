#!/bin/bash
# r5 queue I: capability + two-worlds evidence for the r5 operating
# points (quality cells + one dossier row — not host-timing-critical).
# Run AFTER queue H, BEFORE queue E.
set -x
export PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon
cd /root/repo

# ---- 1) POS steering efficacy AT the new pc96+ctlrank operating point
#         (EVAL.md currently infers it from the pc48 row; measure it) —
#         merges the pos rows into the existing mid ctlrank dossier
timeout 7200 python tools/control_efficacy.py --checkpoint trained_mid \
  --only pos --out CONTROL_EFFICACY_MID_CTLRANK.json

# ---- 2) two-worlds evidence for the new free frontier: tiny12
#         fact50pc48 @n32 (mid triangulated 3/3; the 4L world said
#         -0.0180 — this adds the 12L tiny world)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_tiny12 \
  --prune_k 3 --topk_mode approx --recall 0.90 --prune_stage1 factorized \
  --stage1_layers 6 --stage1_precut 48 --n_images 32

# ---- 3) len77 speed candidate probe: prune_k=3 at len77 (stage-2 rows
#         10->3 vs the prune10 rows) with the pc48 cascade on the world
#         that grounds len77 evidence (trained_mid)
timeout 5400 python tools/trained_quality_cells.py --checkpoint trained_mid \
  --clip_len 77 --prune_k 3 --topk_mode approx --recall 0.95 \
  --prune_stage1 factorized --stage1_layers 6 --stage1_precut 48 \
  --n_images 16

echo QUEUE_I_DONE
