#!/usr/bin/env python
"""Quality check for the two-stage candidate-pruning mode.

Runs the same generations with full scoring (reference semantics) and with
``prune_k`` pre-selection, then reports:
  - caption agreement (exact-match rate of final captions),
  - token agreement (fraction of committed sentence tokens equal),
  - CLIPScore delta (mean best-cosine difference).

With real checkpoints (``--lm_model/--match_model`` dirs) this quantifies
the speed/quality trade; with ``--random_models`` it sanity-checks proxy
ordering only (random weights carry no semantics).

Usage:
  python tools/validate_pruning.py --random_models --prune_k 40 --n_images 4
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lm_model", default="bert-base-uncased")
    p.add_argument("--match_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--random_models", action="store_true")
    p.add_argument("--prune_k", type=int, default=40)
    p.add_argument("--n_images", type=int, default=4)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--clip_len", type=int, default=24)
    args = p.parse_args()

    import jax.numpy as jnp

    from conzic_tpu.api.demo import build_captioner
    from conzic_tpu.config import ConzicConfig

    cfg = ConzicConfig()
    cfg.lm_model = args.lm_model
    cfg.match_model = args.match_model
    cfg.clip_len = args.clip_len
    cfg.verbose = False
    cap = build_captioner(cfg, random_models=args.random_models)
    cap.cfg.verbose = False

    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        rng.randn(args.n_images, cap.clip_model.config.projection_dim).astype(
            np.float32
        )
    )
    runs = {}
    for name, pk in (("full", None), ("pruned", args.prune_k)):
        runs[name] = cap.run(
            embeds, prompt="Image of a", max_len=args.sentence_len,
            top_k=args.k, temperature=0.1, max_iter=args.iters,
            alpha=0.02, beta=2.0, order="sequential",
            rng=np.random.RandomState(42), prune_k=pk,
        )
        print(f"{name}: {args.n_images / runs[name].elapsed_s:.2f} caps/s",
              flush=True)

    full, pruned = runs["full"], runs["pruned"]
    finals_f = full.gen_texts_list[-2]
    finals_p = pruned.gen_texts_list[-2]
    exact = np.mean([a == b for a, b in zip(finals_f, finals_p)])
    tok_f = full.iter_ids[-1]
    tok_p = pruned.iter_ids[-1]
    tok_agree = float((tok_f == tok_p).mean())
    cos_delta = float(np.mean(full.best_cos - pruned.best_cos))
    print(f"caption exact-match: {exact:.2%}")
    print(f"token agreement:     {tok_agree:.2%}")
    print(f"best-cosine delta (full - pruned): {cos_delta:+.4f}")
    speedup = full.elapsed_s / pruned.elapsed_s
    print(f"speedup: {speedup:.2f}x")


if __name__ == "__main__":
    main()
