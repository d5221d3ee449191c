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


def clip_scores(captioner, image_paths: Sequence[str], captions: Sequence[str],
                batch_size: int = 64) -> np.ndarray:
    """Cosine similarity per (image, caption) pair, reference scale
    (raw cosine, not logit-scaled).

    Both sides run in fixed-size padded chunks so exactly ONE program per
    side compiles regardless of corpus size (a whole-file batch would
    shape-specialize a fresh ~4-6 min remote compile per distinct file
    length and risk HBM exhaustion on large files) — the same pattern as
    ``api/retrieval._encode_texts``, which the text side reuses."""
    from PIL import Image

    from conzic_tpu.api.retrieval import _encode_texts

    if not image_paths:
        return np.zeros((0,), np.float32)
    imgs = [Image.open(p).convert("RGB") for p in image_paths]
    embs = []
    for i in range(0, len(imgs), batch_size):
        chunk = imgs[i : i + batch_size]
        padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
        embs.append(np.asarray(captioner.encode_images(padded))[: len(chunk)])
    img_emb = np.concatenate(embs, axis=0)
    txt_emb = _encode_texts(captioner, list(captions), batch_size)
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
