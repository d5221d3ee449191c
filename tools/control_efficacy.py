#!/usr/bin/env python
"""Control-efficacy + diversity dossier (VERDICT r4 item 1).

The reference ships an evaluation harness proving its headline
capability — that control WORKS: POS template-match accuracy over
generated captions (/root/reference/POS_classifier.py:40-65) and the
Div-1/Div-2/vocab diversity script (/root/reference/compute_n_div.py:
32-51). The rebuild had the evaluators but never published measured
control-efficacy numbers on trained checkpoints. This tool closes that:
on a trained world's HELD-OUT scenes it generates captions in every
control mode — free, sentiment-positive, sentiment-negative,
POS-templated — at FULL PARITY and at each shipped ctl operating point
(BASELINE.md r4: free fact17pc24, sentiment fact50pc96, POS fact50pc48),
then reports per (mode, tier):

  - mean sentence-level sentiment valence of the best captions
    (eval/sentiment_eval.py — the reference's scorer semantics) and the
    fraction of captions containing any positive-/negative-valence word,
  - POS template-match accuracy (eval/pos_eval.py, exact reference
    operator semantics) against the SAME template used for control,
  - Div-1 / Div-2 / vocab size over each image's samples
    (eval/ndiv.py, reference per-image accumulation),
  - mean best-of-run CLIP cosine (quality context).

Control efficacy = the deltas BETWEEN modes (sentiment+ vs free vs
sentiment−; POS-controlled vs free), and tier fidelity = each ctl
tier's metrics staying at its full-parity mode's level.

Writes CONTROL_EFFICACY.json (committed); EVAL.md summarizes.

Vocabulary caveat (recorded in the JSON): the shape-world vocabulary
carries only a few valence-bearing words (trained_tiny12: nice/cute/
love vs hate/lose), so the sentiment channel is narrow — the measured
shift is real steering evidence, but its magnitude is world-limited.

Usage (serialize with any other TPU user):
  PYTHONPATH=/root/.axon_site:$PYTHONPATH JAX_PLATFORMS=axon \
    python tools/control_efficacy.py --checkpoint trained_tiny12
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
    "CONTROL_EFFICACY.json",
)

# Template matched to the trained shape-world's caption grammar
# ("image of a small white square with a ... on a red background .");
# slots cover prompt words + generated slots from word 0
# (energies.pos_accuracy contract). Control and evaluation use the SAME
# template, mirroring the reference's own eval (POS_classifier.py:44).
WORLD_TEMPLATE = [
    ["NOUN"], ["ADP"], ["DET"],                      # image of a
    ["ADJ"], ["ADJ", "NOUN"], ["NOUN"],              # small white square
    ["ADP"], ["DET"],                                # with a
    ["ADJ", "NOUN"], ["NOUN"],                       # green triangle
    ["ADP", "NOUN"], ["NOUN", "."], ["."],           # on a background .
]


def sentiment_metrics(captions) -> dict:
    from conzic_tpu.eval.ndiv import word_tokenize
    from conzic_tpu.eval.sentiment_eval import batch_texts_sentiment_scores
    from conzic_tpu.text.lexicons import _NEGATIVE, _POSITIVE

    scores = batch_texts_sentiment_scores(captions, negative=False)
    pos_rate = neg_rate = 0.0
    for cap in captions:
        words = {w.lower() for w in word_tokenize(cap)}
        pos_rate += bool(words & set(_POSITIVE))
        neg_rate += bool(words & set(_NEGATIVE))
    n = max(len(captions), 1)
    return {
        "sentiment_mean": float(np.mean(scores)),
        "positive_word_rate": pos_rate / n,
        "negative_word_rate": neg_rate / n,
    }


def pos_metrics(captions, template) -> dict:
    from conzic_tpu.eval.pos_eval import batch_texts_pos_analysis

    _, scores = batch_texts_pos_analysis(captions, template)
    return {"pos_template_accuracy": float(np.mean(scores))}


def diversity_metrics(per_image_captions) -> dict:
    """Reference per-image accumulation (compute_n_div.py:32-51):
    ``per_image_captions`` is a list of caption lists, one per image."""
    from conzic_tpu.eval.ndiv import calc_diversity

    div1 = div2 = 0.0
    vocab: list = []
    for caps in per_image_captions:
        dn, vocab = calc_diversity(caps, vocab)
        div1 += dn[0]
        div2 += dn[1]
    n = max(len(per_image_captions), 1)
    return {
        "div_1": div1 / n,
        "div_2": div2 / n,
        "vocab_len": len(set(vocab)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="trained_tiny12")
    p.add_argument("--n_images", type=int, default=32)
    p.add_argument("--n_samples", type=int, default=2,
                   help="samples per image (Div-n needs >1 caption/image)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--scene_seed", type=int, default=9000,
                   help="held-out scene stream (training used seed+1)")
    p.add_argument("--gamma", type=float, default=5.0)
    p.add_argument("--template", type=str, default=None,
                   help="JSON slot-list template overriding the "
                        "world-matched default")
    p.add_argument("--stage1_ctl", choices=["auto", "on", "off"],
                   default="auto",
                   help="control-aware stage-1 ranking for the ctl speed "
                        "tiers (r5 default; 'off' measures the r4 "
                        "cosine-ranked tiers — labels carry +ctlrank "
                        "when on so the two never collide)")
    p.add_argument("--skip_tiers", action="store_true",
                   help="full-parity modes only (no ctl speed tiers)")
    p.add_argument("--only", default=None,
                   help="comma-separated mode filter (free,sent_pos,"
                        "sent_neg,pos) — re-measure a subset; merges "
                        "into an existing --out file")
    p.add_argument("--out", default=OUT_PATH)
    p.add_argument("--cpu", action="store_true",
                   help="CPU run — approx stage-1 lowers to exact; "
                        "diverted from the committed dossier")
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

    template = json.loads(args.template) if args.template else [
        list(s) for s in WORLD_TEMPLATE
    ]

    cfg = ConzicConfig()
    cfg.lm_model = args.checkpoint
    cfg.match_model = args.checkpoint
    cfg.verbose = False
    cap = Captioner.from_pretrained(cfg)
    cap.cfg.verbose = False
    tower_layers = cap.clip_model.config.text.num_layers

    def layers(pct):  # depth-percent -> layer count on THIS tower
        return max(1, round(pct * tower_layers / 100))

    # shipped ctl operating points (BASELINE.md r5: queue F moved POS
    # pc48 -> pc96 after the pc48+ctlrank gate demotion); tier key
    # grammar matches the PRUNING_MATRIX cell keys
    tiers = {"free": "fact17pc24",
             "sentiment": "fact50pc96",
             "pos": "fact50pc96"}
    tier_cfg = {
        "fact17pc24": dict(prune_k=3, s1_layers=layers(17), precut=24),
        "fact50pc96": dict(prune_k=3, s1_layers=layers(50), precut=96),
        "fact50pc48": dict(prune_k=3, s1_layers=layers(50), precut=48),
    }

    imgs, _gt, scenes = build_dataset(args.n_images, seed=args.scene_seed)
    pils = [Image.fromarray(imgs[i]) for i in range(args.n_images)]
    embeds = cap.encode_images(pils)

    modes = [
        ("free", None, False),
        ("sent_pos", "sentiment", False),
        ("sent_neg", "sentiment", True),
        ("pos", "pos", False),
    ]

    def one_run(ctl, negative, tier):
        if tier is None:
            cap.cfg.topk_mode = "exact"
            pk = None
        else:
            t = tier_cfg[tier]
            cap.cfg.topk_mode = "approx"
            cap.cfg.topk_recall = 0.90
            cap.cfg.prune_stage1 = "factorized"
            cap.cfg.prune_stage1_layers = t["s1_layers"]
            cap.cfg.prune_stage1_precut = t["precut"]
            cap.cfg.prune_stage1_ctl = args.stage1_ctl
            pk = t["prune_k"]
        try:
            return cap.run(
                embeds, prompt="Image of a", max_len=args.sentence_len,
                top_k=args.k, temperature=0.1, max_iter=args.iters,
                alpha=0.02, beta=2.0,
                gamma=args.gamma if ctl else 0.0,
                order="sequential", ctl=ctl, negative=negative,
                rng=np.random.RandomState(42), n_samples=args.n_samples,
                prune_k=pk,
                pos_template=template if ctl == "pos" else None,
            )
        finally:
            cap.cfg.topk_mode = "exact"

    results = {}
    if args.only:
        keep = {m.strip() for m in args.only.split(",")}
        modes = [m for m in modes if m[0] in keep]
        # partial re-measures extend the existing dossier in place
        if os.path.exists(args.out):
            with open(args.out) as f:
                results = json.load(f).get("results", {})
    for mode, ctl, negative in modes:
        tier_names = [None]
        if not args.skip_tiers:
            tier_names.append(tiers[ctl] if ctl else tiers["free"])
        for tier in tier_names:
            label = f"{mode}/{tier or 'full'}"
            if tier and ctl and args.stage1_ctl != "off":
                label += "+ctlrank"
            print(f"--- {label}", flush=True)
            res = one_run(ctl, negative, tier)
            best = res.gen_texts_list[-1]      # best-by-CLIPScore
            # rows are sample-major: [s0_img0..s0_imgN, s1_img0..]
            per_image = [
                [best[s * args.n_images + i]
                 for s in range(args.n_samples)]
                for i in range(args.n_images)
            ]
            entry = {
                "best_cos_mean": float(np.mean(res.best_cos)),
                **sentiment_metrics(best),
                **pos_metrics(best, template),
                **diversity_metrics(per_image),
                "final_captions_sample": res.gen_texts_list[-2][:4],
                "best_captions_sample": best[:4],
            }
            print("  " + json.dumps(
                {k: v for k, v in entry.items()
                 if not k.endswith("_sample")}))
            results[label] = entry

    doc = {
        "checkpoint": args.checkpoint,
        "tower_layers": tower_layers,
        "config": {
            "n_images": args.n_images, "n_samples": args.n_samples,
            "iters": args.iters, "sentence_len": args.sentence_len,
            "k": args.k, "gamma": args.gamma,
            "scene_seed": args.scene_seed,
            "template": template,
            "tiers": tier_cfg,
            "stage1_ctl": args.stage1_ctl,
        },
        "vocab_caveat": (
            "shape-world vocab carries few valence words; sentiment "
            "shifts are real steering evidence but world-limited in "
            "magnitude"),
        "session": session_tag(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out} ({len(results)} runs)")


if __name__ == "__main__":
    main()
