"""CLIPScore evaluation of caption files against images.

The reference tracks CLIP cosine in-loop only (gen_utils.py:80-92); this
module scores any (image, caption) set offline with the same embedding +
cosine pipeline — used by the golden-parity harness and benchmark reports.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np


def clip_scores(captioner, image_paths: Sequence[str], captions: Sequence[str]) -> np.ndarray:
    """Cosine similarity per (image, caption) pair, reference scale
    (raw cosine, not logit-scaled)."""
    from PIL import Image

    import jax.numpy as jnp

    from conzic_tpu.models.clip import CLIPModel

    imgs = [Image.open(p).convert("RGB") for p in image_paths]
    img_emb = np.asarray(captioner.encode_images(imgs))
    ids, mask = captioner.bpe.batch_encode(list(captions), max_length=77,
                                           pad_to_max=True)
    txt_emb = np.asarray(
        captioner.clip_model.apply(
            {"params": captioner.params["clip"]},
            jnp.asarray(ids),
            jnp.asarray(mask),
            method=CLIPModel.encode_text,
        )
    )
    img_emb = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
    txt_emb = txt_emb / np.linalg.norm(txt_emb, axis=-1, keepdims=True)
    return np.sum(img_emb * txt_emb, axis=-1)


def score_results_file(captioner, results_json: str, image_dir: str) -> Dict[str, float]:
    """Score a run.py-format results file {image_id: caption}."""
    with open(results_json, encoding="utf-8") as f:
        res = json.load(f)
    names, caps = [], []
    for image_id, caption in res.items():
        for ext in (".jpg", ".jpeg", ".png", ""):
            p = os.path.join(image_dir, image_id + ext)
            if os.path.exists(p):
                names.append(p)
                caps.append(caption if isinstance(caption, str) else caption[0])
                break
    scores = clip_scores(captioner, names, caps)
    return {os.path.basename(n): float(s) for n, s in zip(names, scores)}
