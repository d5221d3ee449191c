#!/usr/bin/env python
"""Quality check for the int8 scoring tier (``--quant int8``).

Runs the same generations with bf16/fp32 scoring (reference semantics)
and with the dynamic-int8 matmul path (conzic_tpu/ops/quant.py) and
reports caption agreement, token agreement, and CLIPScore delta — the
same metrics as tools/validate_pruning.py reports for the pruning tier.

With real checkpoints (``--lm_model/--match_model`` dirs) this
quantifies the precision/quality trade; with ``--random_models`` it
checks numerical stability only (random weights carry no semantics).

Usage:
  python tools/validate_quant.py --random_models            # full arch
  python tools/validate_quant.py --random_models tiny       # CPU-fast
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
    p.add_argument("--random_models", nargs="?", const="full",
                   choices=["full", "tiny"], default=False)
    p.add_argument("--n_images", type=int, default=4)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--clip_len", type=int, default=24)
    p.add_argument("--order", default="sequential")
    p.add_argument("--quant", default="int8", choices=["int8", "int8_all"],
                   help="tier to compare against full precision: int8 = "
                        "CLIP candidate scoring only; int8_all = also the "
                        "BERT proposal encoder")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "overrides JAX_PLATFORMS; see CLAUDE.md)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()  # full-size programs: ~5 min cold compile
    import jax.numpy as jnp

    from conzic_tpu.api.demo import build_captioner
    from conzic_tpu.config import ConzicConfig

    runs = {}
    embeds = None
    for quant in ("none", args.quant):
        cfg = ConzicConfig()
        cfg.lm_model = args.lm_model
        cfg.match_model = args.match_model
        cfg.clip_len = args.clip_len
        cfg.verbose = False
        cfg.quant = quant
        if not args.random_models and not os.path.isdir(args.lm_model):
            p.error(
                f"--lm_model {args.lm_model!r} is not a local checkpoint "
                "directory and this environment has no egress to download "
                "one — pass --random_models (full-architecture random "
                "weights) or --random_models tiny, or point "
                "--lm_model/--match_model at local checkpoint dirs."
            )
        cap = build_captioner(cfg, random_models=args.random_models)
        cap.cfg.verbose = False
        if embeds is None:
            rng = np.random.RandomState(0)
            embeds = jnp.asarray(
                rng.randn(
                    args.n_images, cap.clip_model.config.projection_dim
                ).astype(np.float32)
            )
        runs[quant] = cap.run(
            embeds, prompt="Image of a", max_len=args.sentence_len,
            top_k=args.k, temperature=0.1, max_iter=args.iters,
            alpha=0.02, beta=2.0, order=args.order,
            rng=np.random.RandomState(42),
        )
    full, q8 = runs["none"], runs[args.quant]
    finals_f = full.gen_texts_list[-2]
    finals_q = q8.gen_texts_list[-2]
    exact = float(np.mean([a == b for a, b in zip(finals_f, finals_q)]))
    tok = float((full.iter_ids[-1] == q8.iter_ids[-1]).mean())
    cos_delta = float(np.mean(full.best_cos - q8.best_cos))
    print(f"tier: {args.quant}")
    print(f"caption exact-match: {exact:.2%}")
    print(f"token agreement:     {tok:.2%}")
    print(f"best-cosine delta (full - {args.quant}): {cos_delta:+.4f}")
    print(f"speedup: {full.elapsed_s / max(q8.elapsed_s, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
