#!/usr/bin/env python
"""Merge single (sequential, free) quality cells into PRUNING_MATRIX.json.

Originally the on-TPU driver for ``--topk_mode approx`` cells (approx_max_k
only actually drops candidates on TPU backends — on CPU it lowers to an
exact sort, so a CPU run would reproduce the exact-top-k cells and say
nothing about the approximation). Now the general merge driver for any
(prune_k, topk_mode, final_exact, n_images) headline-family cell:

- keys: ``sequential/<ctl|free>/prune<k>[+approx<recall>][+final_exact]
  [+int8|+int8_all][@n<N>][@len<L>][@s<seed>]`` (``@n<N>`` marks a non-default sample
  size — bench.py's gate matches base and ``@n`` keys and prefers
  ``@len`` cells when benching that clip_len; ``@s<seed>`` replication
  cells are informational and never gate).
- the matrix's standard config otherwise (len=10, iters=10, k=200,
  clip_len=24, seed-0 embeddings).

Usage (serialize with any other TPU user):
  PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon \
    python tools/approx_quality_cells.py --prune_k 5 10 --recall 0.95
  # 16-image re-measure of the hybrid cell:
  ... --prune_k 5 --final_exact --n_images 16
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_pruning import (  # noqa: E402
    MATRIX_PATH,
    build_quant_captioner,
    cell_key,
    run_cell,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prune_k", type=int, nargs="+", default=[5, 10])
    p.add_argument("--topk_mode", default="approx",
                   choices=["approx", "exact"])
    p.add_argument("--recall", type=float, default=0.95)
    p.add_argument("--final_exact", action="store_true",
                   help="hybrid schedule: pruned sweeps + full-parity "
                        "final sweep (keys gain a +final_exact suffix)")
    p.add_argument("--n_images", type=int, default=4,
                   help="sample size; non-default adds an @n<N> key suffix")
    p.add_argument("--ctl", choices=["sentiment", "pos"], default=None,
                   help="controlled-generation cell (key path segment)")
    p.add_argument("--clip_len", type=int, default=24,
                   help="CLIP context length; non-default adds an "
                        "@len<N> key suffix (long-context cells)")
    p.add_argument("--seed", type=int, default=0,
                   help="image-embedding seed; non-default adds an "
                        "@s<seed> key suffix (replication cells)")
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int8_all"],
                   help="quantize the PRUNED side (+<tier> key suffix)")
    p.add_argument("--out", default=MATRIX_PATH)
    p.add_argument("--cpu", action="store_true",
                   help="CPU run (vacuous for approx — smoke-testing only)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.out == MATRIX_PATH:
            # tiny-random-model smoke cells must never land in (or fold
            # into the worst_... of) the committed quality artifact
            args.out = MATRIX_PATH + ".cpu-smoke.json"
            print(f"--cpu smoke run: writing to {args.out} instead of "
                  f"the committed matrix (pass --out to override)")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()  # cell programs are bench-sized: ~5 min cold
    import jax.numpy as jnp

    from conzic_tpu.api.demo import build_captioner
    from conzic_tpu.config import ConzicConfig

    cfg = ConzicConfig()
    cfg.clip_len = args.clip_len  # 24 = the matrix's standard config
    cfg.verbose = False
    cfg.topk_recall = args.recall
    cap = build_captioner(
        cfg, random_models="tiny" if args.cpu else "full"
    )
    cap.cfg.verbose = False
    cap_pruned = None
    if args.quant != "none":
        cap_pruned = build_quant_captioner(
            cfg, args.quant, args.recall,
            "tiny" if args.cpu else "full",
        )

    rng = np.random.RandomState(args.seed)  # 0 = the matrix's embeddings
    embeds = jnp.asarray(
        rng.randn(args.n_images,
                  cap.clip_model.config.projection_dim).astype(np.float32)
    )
    if os.path.exists(args.out):
        with open(args.out) as f:
            matrix = json.load(f)
    else:
        matrix = {"cells": {}}
    for pk in args.prune_k:
        cell = run_cell(cap, embeds, order="sequential", ctl=args.ctl,
                        prune_k=pk, sentence_len=10, iters=10, k=200,
                        topk_mode=args.topk_mode,
                        final_exact=args.final_exact,
                        cap_pruned=cap_pruned)
        key = cell_key(ctl=args.ctl, prune_k=pk, topk_mode=args.topk_mode,
                       recall=args.recall, final_exact=args.final_exact,
                       quant=args.quant, n_images=args.n_images,
                       clip_len=args.clip_len, seed=args.seed,
                       ctl_rank=(args.ctl is not None
                                 and cap.cfg.prune_stage1_ctl != "off"))
        if args.cpu:
            key += "+CPU-SMOKE"
        print(key, json.dumps(cell))
        matrix["cells"][key] = cell
    matrix["worst_best_cosine_delta"] = max(
        c["best_cosine_delta"] for c in matrix["cells"].values()
    )
    with open(args.out, "w") as f:
        json.dump(matrix, f, indent=1)
    print(f"merged into {args.out}")


if __name__ == "__main__":
    main()
