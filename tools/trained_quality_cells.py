#!/usr/bin/env python
"""Trained-weights quality cells: re-measure the published pruned-ladder
operating points on tiny SEMANTIC models (VERDICT r3 item 1).

The random-weight cells in PRUNING_MATRIX.json bound numerical drift but
say nothing about caption quality — random cosines carry no semantics.
This tool loads a tools/train_tiny.py checkpoint (whose meta records
that CLIPScore separates correct from shuffled captions), renders
HELD-OUT scenes, and measures full-vs-pruned deltas for every published
operating point, writing them into a ``trained`` section of
PRUNING_MATRIX.json. bench.py's quality gate prefers these cells.

Beyond the standard metrics it records per-side SEMANTIC numbers:
  - best_cos_full / best_cos_pruned: absolute best-of-run CLIP cosine
    (meaningful on semantic weights; the published delta's denominators),
  - attr_recall_full / attr_recall_pruned: fraction of each scene's
    ground-truth color/shape words present in the best caption — does
    the pruned tier still DESCRIBE the image?

Approx cells (`+approx<r>`) are only meaningful on TPU backends
(jax.lax.approx_max_k lowers to an exact sort on CPU).

Reference semantics being protected: /root/reference/gen_utils.py:76-92.

Usage (serialize with any other TPU user):
  PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon \
    python tools/trained_quality_cells.py --checkpoint trained_tiny --ladder
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_pruning import (  # noqa: E402
    MATRIX_PATH,
    cell_key,
    run_cell,
    session_tag,
)

# the published ladder (BASELINE.md): (prune_k, topk_mode, recall,
# final_exact, ctl, clip_len, n_images[, stage1, stage1_layers[, precut]]).
# clip_len=24 cells at n32, long-context at n16, mirroring the
# random-weight evidence bar.
LADDER = [
    (3, "approx", 0.90, False, None, 24, 32),   # 82.4 caps/s point
    (5, "approx", 0.90, False, None, 24, 32),   # 64.3
    (5, "approx", 0.95, False, None, 24, 32),   # 62.9
    (5, "exact", 0.95, False, None, 24, 32),    # 52.5
    (2, "approx", 0.90, False, None, 24, 32),   # 95.8 boundary (over-gate)
    (3, "approx", 0.90, True, None, 24, 32),    # 28.2 hybrid
    (5, "approx", 0.95, True, None, 24, 32),    # 25.9 hybrid
    (3, "approx", 0.90, False, "sentiment", 24, 32),
    (3, "approx", 0.90, False, "pos", 24, 32),
    (10, "approx", 0.95, False, None, 77, 16),  # 10.9 long-context
    (20, "exact", 0.95, False, None, 77, 16),   # 5.4 long-context
    (10, "approx", 0.95, True, None, 77, 16),   # 4.8 long-context hybrid
]

# factorized stage-1 points (--prune_stage1 factorized): the truncated-
# tower scorer replacing the bag proxy (VERDICT r3 item 2). Layer counts
# are FRACTIONS of the full tower depth — the trained checkpoint has 4
# text layers, so layers 1/2 probe the 25%- and 50%-depth scorers
# (cell keys record the PERCENT: fact25/fact50 — validate_pruning
# .cell_key). The pc<m> entries are the cascade (proxy pre-cut k -> m
# before the truncated-tower encode — the full-size throughput lever).
FACTORIZED = [
    (3, "approx", 0.90, False, None, 24, 32, "factorized", 2),
    (3, "approx", 0.90, False, None, 24, 32, "factorized", 1),
    (5, "approx", 0.95, False, None, 24, 32, "factorized", 2),
    (3, "approx", 0.90, True, None, 24, 32, "factorized", 2),  # + hybrid
    (3, "approx", 0.90, False, "sentiment", 24, 32, "factorized", 2),
    (3, "approx", 0.90, False, "pos", 24, 32, "factorized", 2),
    (10, "approx", 0.95, False, None, 77, 16, "factorized", 2),
]

CASCADE = [
    (3, "approx", 0.90, False, None, 24, 32, "factorized", 2, 24),
    (3, "approx", 0.90, False, None, 24, 32, "factorized", 2, 48),
    (3, "approx", 0.90, False, None, 24, 32, "factorized", 2, 12),
    (5, "approx", 0.95, False, None, 24, 32, "factorized", 2, 24),
    (3, "approx", 0.90, False, "sentiment", 24, 32, "factorized", 2, 24),
    (3, "approx", 0.90, False, "pos", 24, 32, "factorized", 2, 24),
]


def attr_recall(captions, scenes) -> float:
    """Mean fraction of each scene's color/shape words present in its
    caption."""
    from conzic_tpu.data.synthetic import scene_attribute_words

    vals = []
    for cap, scene in zip(captions, scenes):
        words = set(cap.split())
        attrs = scene_attribute_words(scene)
        vals.append(sum(w in words for w in attrs) / len(attrs))
    return float(np.mean(vals))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="trained_tiny")
    p.add_argument("--ladder", action="store_true",
                   help="run every published operating point")
    p.add_argument("--factorized", action="store_true",
                   help="run the factorized stage-1 points (FACTORIZED)")
    p.add_argument("--cascade", action="store_true",
                   help="run the cascade (proxy pre-cut) points (CASCADE)")
    p.add_argument("--stage1_precut", type=int, default=0,
                   help="single-cell mode: cascade pre-cut width")
    p.add_argument("--stage1_precut_mode", default="proxy",
                   choices=["proxy", "tower"],
                   help="single-cell mode: pre-cut scorer (tower = the "
                        "r5 two-stage cascade)")
    p.add_argument("--stage1_precut_layers", type=int, default=1,
                   help="single-cell mode: tower pre-cut depth")
    p.add_argument("--prune_stage1", default="proxy",
                   choices=["proxy", "factorized"],
                   help="single-cell mode: stage-1 scorer")
    p.add_argument("--stage1_layers", type=int, default=2)
    p.add_argument("--prune_k", type=int, default=None,
                   help="single-cell mode: one prune_k")
    p.add_argument("--topk_mode", default="approx",
                   choices=["approx", "exact"])
    p.add_argument("--recall", type=float, default=0.90)
    p.add_argument("--final_exact", action="store_true")
    p.add_argument("--ctl", choices=["sentiment", "pos"], default=None)
    p.add_argument("--stage1_ctl", choices=["auto", "on", "off"],
                   default="auto",
                   help="control-aware stage-1 ranking (r5 default for "
                        "ctl cells; 'off' re-measures the r4 cosine-"
                        "ranked program — different cell keys)")
    p.add_argument("--clip_len", type=int, default=24)
    p.add_argument("--n_images", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--scene_seed", type=int, default=9000,
                   help="held-out scene stream (training used seed+1)")
    p.add_argument("--out", default=MATRIX_PATH)
    p.add_argument("--cpu", action="store_true",
                   help="CPU run (approx cells vacuous — smoke only; "
                        "diverted from the committed matrix)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.out == MATRIX_PATH:
            args.out = MATRIX_PATH + ".cpu-smoke.json"
            print(f"--cpu smoke run: writing to {args.out}")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    from PIL import Image

    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.data.synthetic import build_dataset
    from conzic_tpu.engine.sampler import Captioner

    with open(os.path.join(args.checkpoint, "conzic_tiny.json")) as f:
        doc = json.load(f)

    jobs = []
    if args.ladder:
        jobs += LADDER
    if args.factorized:
        jobs += FACTORIZED
    if args.cascade:
        jobs += CASCADE
    if not jobs:
        if args.prune_k is None:
            p.error("pass --ladder, --factorized, --cascade, or --prune_k")
        jobs = [(args.prune_k, args.topk_mode, args.recall,
                 args.final_exact, args.ctl, args.clip_len, args.n_images,
                 args.prune_stage1, args.stage1_layers,
                 args.stage1_precut, args.stage1_precut_mode,
                 args.stage1_precut_layers)]
    # pad short tuples: default proxy stage-1, no precut, proxy pre-cut
    jobs = [(*j, "proxy", 2)[:9] if len(j) < 9 else j for j in jobs]
    jobs = [j if len(j) >= 10 else (*j, 0) for j in jobs]
    jobs = [j if len(j) == 12 else (*j, "proxy", 1) for j in jobs]

    # one captioner per clip_len (static shape); scenes shared per n
    captioners = {}
    datasets = {}

    def get_cap(clip_len):
        if clip_len not in captioners:
            cfg = ConzicConfig()
            cfg.lm_model = args.checkpoint
            cfg.match_model = args.checkpoint
            cfg.clip_len = clip_len
            cfg.verbose = False
            captioners[clip_len] = Captioner.from_pretrained(cfg)
            captioners[clip_len].cfg.verbose = False
        return captioners[clip_len]

    def get_data(n):
        if n not in datasets:
            imgs, caps, scenes = build_dataset(n, seed=args.scene_seed)
            datasets[n] = (imgs, caps, scenes)
        return datasets[n]

    if os.path.exists(args.out):
        with open(args.out) as f:
            matrix = json.load(f)
    else:
        matrix = {"cells": {}}
    trained = matrix.setdefault("trained", {
        "weights": "trained-tiny",
        "cells": {},
    })
    # header provenance describes the LATEST run (validation/train_meta
    # are overwritten below from this run's checkpoint doc) — refresh it
    # so a later run against a different checkpoint can't leave the
    # header attributing those fields to the first checkpoint. Each CELL
    # records its own 'checkpoint' (absent = trained_tiny, pre-field).
    trained["checkpoint"] = args.checkpoint
    trained["checkpoint_note"] = (
        "header checkpoint/validation/train_meta describe the most "
        "recent merge run; per-cell provenance is each cell's "
        "'checkpoint' field (absent = trained_tiny)")
    trained["validation"] = doc.get("meta", {}).get("validation", {})
    trained["train_meta"] = {
        k: doc.get("meta", {}).get(k)
        for k in ("session", "params_m", "dataset", "wall_s")
    }
    trained["config"] = {"iters": args.iters,
                         "sentence_len": args.sentence_len, "k": args.k,
                         "scene_seed": args.scene_seed}

    for (pk, mode, recall, fe, ctl, clip_len, n, stage1, s1_layers,
         precut, pc_mode, pc_layers) in jobs:
        cap = get_cap(clip_len)
        cap.cfg.topk_recall = recall
        cap.cfg.prune_stage1 = stage1
        cap.cfg.prune_stage1_layers = s1_layers
        cap.cfg.prune_stage1_precut = precut
        cap.cfg.prune_stage1_precut_mode = pc_mode
        cap.cfg.prune_stage1_precut_layers = pc_layers
        cap.cfg.prune_stage1_ctl = args.stage1_ctl
        tower_layers = cap.clip_model.config.text.num_layers
        s1_pct = round(100 * s1_layers / tower_layers)
        pc_tower_pct = (round(100 * pc_layers / tower_layers)
                        if precut and pc_mode == "tower" else 0)
        imgs, gt_caps, scenes = get_data(n)
        pils = [Image.fromarray(imgs[i]) for i in range(n)]
        embeds = cap.encode_images(pils)
        # non-default scene seeds get an @s<seed> key suffix (seed
        # replication cells must not overwrite the primary estimate)
        key_seed = 0 if args.scene_seed == 9000 else args.scene_seed
        key = cell_key(ctl=ctl, prune_k=pk, topk_mode=mode, recall=recall,
                       final_exact=fe, n_images=n, clip_len=clip_len,
                       stage1=stage1, stage1_pct=s1_pct, precut=precut,
                       precut_tower_pct=pc_tower_pct, seed=key_seed,
                       ctl_rank=(ctl is not None
                                 and args.stage1_ctl != "off"))
        if args.cpu:
            key += "+CPU-SMOKE"
        print(f"--- trained/{key}", flush=True)
        cell, runs = run_cell(
            cap, embeds, order="sequential", ctl=ctl, prune_k=pk,
            sentence_len=args.sentence_len, iters=args.iters, k=args.k,
            final_exact=fe, topk_mode=mode, return_runs=True)
        # per-cell provenance: two trained checkpoints of different tower
        # depth share the matrix (percent keys) — a same-key re-measure on
        # a deeper (more production-like) tower intentionally overwrites,
        # and this field says which tower produced the surviving estimate
        cell["checkpoint"] = args.checkpoint
        cell["tower_layers"] = tower_layers
        cell["best_cos_full"] = float(np.mean(runs["full"].best_cos))
        cell["best_cos_pruned"] = float(np.mean(runs["pruned"].best_cos))
        cell["attr_recall_full"] = attr_recall(
            runs["full"].gen_texts_list[-1], scenes)
        cell["attr_recall_pruned"] = attr_recall(
            runs["pruned"].gen_texts_list[-1], scenes)
        print("  " + json.dumps(cell))
        trained["cells"][key] = cell

    trained["session"] = session_tag()
    trained["worst_best_cosine_delta"] = max(
        c["best_cosine_delta"] for c in trained["cells"].values())
    with open(args.out, "w") as f:
        json.dump(matrix, f, indent=1)
    print(f"wrote {args.out} ({len(trained['cells'])} trained cells)")


if __name__ == "__main__":
    main()
