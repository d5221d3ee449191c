#!/bin/bash
# r4 queue C: the 12-layer-tower evidence (depth-transfer question)
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:${PYTHONPATH:-}
export JAX_PLATFORMS=axon

echo "=== fidelity on trained_tiny12 (layers 1 2 3 4 6)"
timeout 3600 python tools/factorized_fidelity.py --checkpoint trained_tiny12 \
  --layers 1 2 3 4 6 --out FACTORIZED_FIDELITY_12L.json 2>&1 | tail -12

cell() {  # layers precut ctl recall
  local layers=$1 precut=$2 ctl=$3 recall=${4:-0.90}
  local args=(--checkpoint trained_tiny12 --prune_k 3 --topk_mode approx
              --recall "$recall" --n_images 32 --prune_stage1 factorized
              --stage1_layers "$layers" --stage1_precut "$precut")
  [ "$ctl" != none ] && args+=(--ctl "$ctl")
  timeout 2400 python tools/trained_quality_cells.py "${args[@]}" 2>&1 | tail -2
}

echo "=== 12L fact17pc24 (layers2)"; cell 2 24 none
echo "=== 12L fact25pc24 (layers3)"; cell 3 24 none
echo "=== 12L fact50pc24 (layers6) cross-check"; cell 6 24 none
echo "=== 12L fact17 no-precut"; cell 2 0 none
echo "=== 12L sentiment fact50pc48"; cell 6 48 sentiment
echo "=== 12L pos fact50pc48"; cell 6 48 pos
echo "QUEUE C DONE"
