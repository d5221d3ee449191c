#!/usr/bin/env python
"""Measure the default ctl TABLE mode's end-to-end approximation against
ctl_mode=exact on TRAINED weights (VERDICT r4 item 4).

The in-loop control energies default to per-token lexicon tables
(energies.sentiment_scores / pos_accuracy over the candidate slot);
``--ctl_mode exact`` instead scores each candidate SENTENCE host-side
with the reference's pipeline (sentiments_classifer.py:14-32 /
POS_classifier.py:6-31 semantics — eval/sentiment_eval.py,
eval/pos_eval.py). The per-word gold tests pin the table's entries, but
caption-level divergence of the two modes had never been measured on
semantic weights — and the published ctl tiers all run table mode, so
their numbers carry this approximation. This tool runs the SAME
generation twice (table vs exact; host-stepped exact works on axon) and
reports Δcos, mean ctl-score delta, and caption agreement per control.

Writes CTL_TABLE_VS_EXACT.json; PARITY.md gets the quantified sentence.

Usage (serialize with any other TPU user):
  PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon \
    python tools/ctl_table_vs_exact.py --checkpoint trained_tiny12
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_pruning import session_tag  # noqa: E402

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "CTL_TABLE_VS_EXACT.json",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="trained_tiny12")
    p.add_argument("--n_images", type=int, default=16)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--gamma", type=float, default=5.0)
    p.add_argument("--scene_seed", type=int, default=9000)
    p.add_argument("--out", default=OUT_PATH)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.out == OUT_PATH:
            args.out = OUT_PATH + ".cpu-smoke.json"
            print(f"--cpu smoke run: writing to {args.out}")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()

    from PIL import Image

    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.data.synthetic import build_dataset
    from conzic_tpu.engine.sampler import Captioner

    cfg = ConzicConfig()
    cfg.lm_model = args.checkpoint
    cfg.match_model = args.checkpoint
    cfg.verbose = False
    cap = Captioner.from_pretrained(cfg)
    cap.cfg.verbose = False

    imgs, _gt, _scenes = build_dataset(args.n_images, seed=args.scene_seed)
    pils = [Image.fromarray(imgs[i]) for i in range(args.n_images)]
    embeds = cap.encode_images(pils)

    results = {}
    for ctl in ("sentiment", "pos"):
        runs = {}
        for mode in ("table", "exact"):
            cap.cfg.ctl_mode = mode
            print(f"--- {ctl}/{mode}", flush=True)
            runs[mode] = cap.run(
                embeds, prompt="Image of a", max_len=args.sentence_len,
                top_k=args.k, temperature=0.1, max_iter=args.iters,
                alpha=0.02, beta=2.0, gamma=args.gamma,
                order="sequential", ctl=ctl, negative=False,
                rng=np.random.RandomState(42))
        cap.cfg.ctl_mode = "table"
        t, e = runs["table"], runs["exact"]
        finals_t = t.gen_texts_list[-2]
        finals_e = e.gen_texts_list[-2]
        cell = {
            "caption_exact": float(np.mean(
                [a == b for a, b in zip(finals_t, finals_e)])),
            "token_agreement": float(
                (t.iter_ids[-1] == e.iter_ids[-1]).mean()),
            # positive = exact mode reaches a better cosine (the table
            # approximation costs quality); near-zero = modes equivalent
            "best_cosine_delta_exact_minus_table": float(
                np.mean(e.best_cos - t.best_cos)),
            # committed-step ctl scores as each engine saw them (final
            # iteration) — scale differs between modes by construction
            # (per-token table sums vs sentence-level scores), so the
            # deltas to compare are within-mode vs free, not cross-mode
            "ctl_score_final_table": float(np.mean(t.iter_ctl[-1])),
            "ctl_score_final_exact": float(np.mean(e.iter_ctl[-1])),
            "final_captions_table": finals_t[:4],
            "final_captions_exact": finals_e[:4],
        }
        print("  " + json.dumps(
            {k: v for k, v in cell.items() if not k.startswith("final_")}))
        results[ctl] = cell

    doc = {
        "checkpoint": args.checkpoint,
        "config": {"n_images": args.n_images, "iters": args.iters,
                   "sentence_len": args.sentence_len, "k": args.k,
                   "gamma": args.gamma, "scene_seed": args.scene_seed},
        "session": session_tag(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
