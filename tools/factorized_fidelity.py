#!/usr/bin/env python
"""Offline stage-1 fidelity study: can a truncated-tower scorer select
better candidates than the bag-of-embeddings pruning proxy?

VERDICT r3 item 2 (the factorized-scoring tier) hinges on one question:
how faithfully does a CHEAP scorer rank the k=200 candidates relative to
the full CLIP text tower? This tool measures exactly that on the trained
semantic checkpoint (tools/train_tiny.py), comparing three stage-1
scorers at a Gibbs-like substitution point:

  proxy      the engine's bag-of-embeddings proxy
             (energies.prune_proxy_scores — what --prune_k uses today)
  trunc<N>   the first N transformer layers of the SAME text tower +
             final LN + a least-squares-calibrated linear map into the
             projection space (calibration is checkpoint-specific and
             fits in seconds — viable on real checkpoints too)
  random     floor baseline

Metrics per (image, slot): recall@m (|stage1 top-m ∩ full top-m| / m)
and REGRET@m = best-full-cosine minus best full cosine within the
stage-1 top-m — the quantity the engine actually loses when it
exact-rescores only the stage-1 survivors.

Reference semantics: the full scorer is the reference's candidate
scoring (/root/reference/gen_utils.py:76-77, clip/clip.py:86-98).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit_calibration(pooled: np.ndarray, target: np.ndarray,
                    l2: float = 1e-3) -> np.ndarray:
    """Ridge least-squares map from truncated pooled states (B, H) to
    full projected embeddings (B, D)."""
    H = pooled.shape[1]
    A = pooled.T @ pooled + l2 * np.eye(H, dtype=np.float64)
    W = np.linalg.solve(A, pooled.T @ target)
    return W.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default="trained_tiny")
    p.add_argument("--n_images", type=int, default=32)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--slots", type=int, default=3,
                   help="substitution slots probed per image")
    p.add_argument("--calib_n", type=int, default=2048)
    p.add_argument("--layers", type=int, nargs="+", default=[1, 2])
    p.add_argument("--m", type=int, nargs="+", default=[3, 5, 10])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="FACTORIZED_FIDELITY.json")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    from PIL import Image

    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.data.synthetic import build_dataset, caption_words
    from conzic_tpu.energies import prune_proxy_scores
    from conzic_tpu.engine.sampler import Captioner
    from conzic_tpu.models.clip import (
        CLIPModel,
        CLIPTextTower,
        truncated_text_params,
    )

    rng = np.random.RandomState(args.seed)
    cfg = ConzicConfig()
    cfg.lm_model = args.checkpoint
    cfg.match_model = args.checkpoint
    cfg.verbose = False
    cap = Captioner.from_pretrained(cfg)
    cap._ensure_word_embeds()
    word_embeds = np.asarray(cap.tables["word_embeds"])
    wp, bpe = cap.wp, cap.bpe
    clip_params = cap.params["clip"]
    clip_model = cap.clip_model

    # held-out scenes, DIFFERENT stream from training and the quality cells
    imgs, caps_gt, scenes = build_dataset(args.n_images, seed=7777)
    img_emb = np.asarray(cap.encode_images(
        [Image.fromarray(imgs[i]) for i in range(args.n_images)]
    ), np.float32)
    img_n = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)

    encode_text = jax.jit(lambda prms, i, m: clip_model.apply(
        {"params": prms}, i, m, method=CLIPModel.encode_text))

    def full_cosines(texts, img_row):
        ids, mask = bpe.batch_encode(texts, max_length=24, pad_to_max=True)
        emb = np.asarray(encode_text(clip_params, jnp.asarray(ids),
                                     jnp.asarray(mask)), np.float32)
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        return emb @ img_n[img_row]

    # ---- calibration sentences: dataset captions + random-word strings ----
    vocab_words = [w for w in wp.vocab if w.isalpha()]
    calib_texts = list(caps_gt)
    while len(calib_texts) < args.calib_n:
        n_w = rng.randint(4, 12)
        calib_texts.append(" ".join(
            vocab_words[i] for i in rng.randint(0, len(vocab_words), n_w)))
    calib_texts = calib_texts[: args.calib_n]
    c_ids, c_mask = bpe.batch_encode(calib_texts, max_length=24,
                                     pad_to_max=True)
    target = np.asarray(encode_text(clip_params, jnp.asarray(c_ids),
                                    jnp.asarray(c_mask)), np.float32)

    truncs = {}
    for N in args.layers:
        tcfg = dataclasses.replace(clip_model.config.text, num_layers=N)
        tower = CLIPTextTower(tcfg, dtype=clip_model.dtype)
        tparams = truncated_text_params(clip_params, N)
        pool = jax.jit(lambda prms, i, m, tower=tower: tower.apply(
            {"params": prms}, i, m))
        pooled = np.asarray(pool(tparams, jnp.asarray(c_ids),
                                 jnp.asarray(c_mask)), np.float32)
        W = fit_calibration(pooled.astype(np.float64),
                            target.astype(np.float64))
        # calibration quality on its own fit set (upper bound indicator)
        pred = pooled @ W
        pred_n = pred / np.linalg.norm(pred, axis=-1, keepdims=True)
        tgt_n = target / np.linalg.norm(target, axis=-1, keepdims=True)
        calib_cos = float((pred_n * tgt_n).sum(-1).mean())
        truncs[N] = (tower, tparams, pool, W, calib_cos)
        print(f"trunc{N}: calibration cosine {calib_cos:.4f}")

    # ---- the substitution experiment -------------------------------------
    content_ids = [wp.vocab[w] for w in caption_words() if w in wp.vocab]
    all_word_ids = [wp.vocab[w] for w in vocab_words]
    results = {f"trunc{N}": {m: {"recall": [], "regret": []}
                             for m in args.m} for N in args.layers}
    results["proxy"] = {m: {"recall": [], "regret": []} for m in args.m}
    results["random"] = {m: {"recall": [], "regret": []} for m in args.m}

    for b in range(args.n_images):
        base_words = caps_gt[b].split()
        base_ids_row = wp.encode(caps_gt[b])
        S = len(base_ids_row)
        slot_positions = rng.choice(
            # inner word positions (skip [CLS]=0 and trailing ". [SEP]")
            np.arange(1, S - 2), size=min(args.slots, S - 3), replace=False)
        for col in slot_positions:
            cands = list(rng.choice(all_word_ids, args.k - len(content_ids),
                                    replace=False)) + content_ids
            cands = np.asarray(cands[: args.k], np.int32)
            # full scoring of the substituted sentences
            texts = []
            for cid in cands:
                row = list(base_ids_row)
                row[col] = int(cid)
                texts.append(wp.decode(row[1:-1]))
            fc = full_cosines(texts, b)

            base = np.asarray(base_ids_row, np.int32)[None]
            proxy = np.asarray(prune_proxy_scores(
                jnp.asarray(word_embeds), jnp.asarray(base),
                jnp.asarray([col]), jnp.asarray(cands[None]),
                jnp.asarray(img_emb[b][None]), seq_len=S))[0]

            scores = {"proxy": proxy,
                      "random": rng.rand(args.k)}
            for N in args.layers:
                tower, tparams, pool, W, _ = truncs[N]
                t_ids, t_mask = bpe.batch_encode(texts, max_length=24,
                                                 pad_to_max=True)
                pooled = np.asarray(pool(tparams, jnp.asarray(t_ids),
                                         jnp.asarray(t_mask)), np.float32)
                emb = pooled @ W
                emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
                scores[f"trunc{N}"] = emb @ img_n[b]

            order_full = np.argsort(-fc)
            for name, sc in scores.items():
                order_s = np.argsort(-sc)
                for m in args.m:
                    top_s = set(order_s[:m].tolist())
                    top_f = set(order_full[:m].tolist())
                    recall = len(top_s & top_f) / m
                    regret = float(fc[order_full[0]]
                                   - fc[list(top_s)].max())
                    results[name][m]["recall"].append(recall)
                    results[name][m]["regret"].append(regret)

    summary = {"checkpoint": args.checkpoint, "n_images": args.n_images,
               "k": args.k, "slots_per_image": args.slots,
               "calibration_cos": {f"trunc{N}": truncs[N][4]
                                   for N in args.layers},
               "scorers": {}}
    for name, per_m in results.items():
        summary["scorers"][name] = {
            str(m): {"recall": float(np.mean(v["recall"])),
                     "mean_regret": float(np.mean(v["regret"])),
                     "p90_regret": float(np.percentile(v["regret"], 90))}
            for m, v in per_m.items()}
    print(json.dumps(summary, indent=1))
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
