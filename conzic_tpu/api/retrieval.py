"""Offline CLIP text-index building + retrieval baseline.

Equivalents of the reference side tools, artifact-format compatible:
  - ``build_index_main``: corpus JSON -> CLIP text embeddings, saved as one
    whitespace-separated vector per line plus a ``{row: caption}`` mapping
    JSON (``/root/reference/clip/build_text_index.py:45-105``).
  - ``retrieval_main``: per test image, retrieve the nearest caption by
    ``image_vec @ index.T`` over row-normalized index vectors and write a
    predictions JSON (``/root/reference/clip/clipretrieval.py:65-134``);
    per-image failures are skipped and counted (``:121-127``).

TPU-native: the index is encoded in large static batches on device; search
is one matmul. The reference's trailing-partial-batch drop
(build_text_index.py:33-41) is NOT reproduced — all captions are indexed
(divergence noted in PARITY.md).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List

import numpy as np


def _encode_texts(captioner, texts: List[str], batch_size: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from conzic_tpu.models.clip import CLIPModel

    clip = captioner.clip_model
    params = captioner.params["clip"]

    @jax.jit
    def encode(ids, mask):
        return clip.apply(
            {"params": params}, ids, mask, method=CLIPModel.encode_text
        )

    out = []
    for i in range(0, len(texts), batch_size):
        chunk = texts[i : i + batch_size]
        pad_to = batch_size  # static shape -> one compilation
        ids, mask = captioner.bpe.batch_encode(
            chunk + [""] * (pad_to - len(chunk)),
            max_length=77,
            pad_to_max=True,
        )
        emb = np.asarray(encode(jnp.asarray(ids), jnp.asarray(mask)))
        out.append(emb[: len(chunk)])
    return np.concatenate(out, axis=0)


def build_index(captioner, corpus_json: str, out_dir: str,
                batch_size: int = 128) -> None:
    with open(corpus_json, encoding="utf-8") as f:
        data = json.load(f)
    texts = data if isinstance(data, list) else list(data.values())
    texts = [t if isinstance(t, str) else t.get("caption", str(t)) for t in texts]
    emb = _encode_texts(captioner, texts, batch_size)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "index_matrix.txt"), "w") as f:
        for row in emb:
            f.write(" ".join(str(float(x)) for x in row) + "\n")
    mapping = {str(i): t for i, t in enumerate(texts)}
    with open(os.path.join(out_dir, "mapping_dict.json"), "w") as f:
        json.dump(mapping, f)


class CLIPIndex:
    """Row-normalized text index + argmax cosine search
    (clipretrieval.py:8-49 semantics)."""

    def __init__(self, index_matrix_path: str, mapping_dict_path: str, captioner):
        rows = []
        with open(index_matrix_path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    rows.append([float(x) for x in line.split()])
        matrix = np.asarray(rows, np.float32)
        norm = np.linalg.norm(matrix, axis=1, keepdims=True)
        self.matrix = matrix / np.maximum(norm, 1e-12)
        with open(mapping_dict_path, encoding="utf-8") as f:
            self.mapping = json.load(f)
        self.captioner = captioner

    def get_image_representation(self, image_path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(image_path).convert("RGB")
        emb = np.asarray(self.captioner.encode_images([img]))[0]
        return emb / np.maximum(np.linalg.norm(emb), 1e-12)

    def search_text(self, image_path: str) -> str:
        vec = self.get_image_representation(image_path)
        scores = vec @ self.matrix.T
        return self.mapping[str(int(np.argmax(scores)))]


def _make_captioner(args):
    from conzic_tpu.api.demo import build_captioner
    from conzic_tpu.config import config_from_args

    # config_from_args provides the functional --device cpu and the
    # persistent compile cache (CLAUDE.md rules for every TPU-heavy CLI)
    cfg = config_from_args(args)
    cfg.match_model = args.clip_name  # reference flag name differs
    return build_captioner(cfg, random_models=args.random_models)


def _add_device_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument("--device", type=str, default="tpu",
                   choices=["tpu", "cpu", "cuda"],
                   help="cpu forces the CPU backend (functional; required "
                        "for side processes while a bench holds the TPU)")


def build_index_main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clip_name", default="openai/clip-vit-base-patch32")
    p.add_argument("--lm_model", default="bert-base-uncased")
    p.add_argument("--text_file_path", required=True)
    p.add_argument("--save_index_prefix", required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--random_models", action="store_true")
    _add_device_arg(p)
    args = p.parse_args(argv)
    captioner = _make_captioner(args)
    build_index(captioner, args.text_file_path, args.save_index_prefix,
                args.batch_size)
    print(f"index written to {args.save_index_prefix}")


def retrieval_main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clip_name", default="openai/clip-vit-base-patch32")
    p.add_argument("--lm_model", default="bert-base-uncased")
    p.add_argument("--index_matrix_path", required=True)
    p.add_argument("--mapping_dict_path", required=True)
    p.add_argument("--test_image_prefix_path", required=True)
    p.add_argument("--test_path", required=True)
    p.add_argument("--save_path_prefix", default=".")
    p.add_argument("--save_name", default="retrieval_result.json")
    p.add_argument("--random_models", action="store_true")
    _add_device_arg(p)
    args = p.parse_args(argv)
    captioner = _make_captioner(args)
    index = CLIPIndex(args.index_matrix_path, args.mapping_dict_path, captioner)

    with open(args.test_path, encoding="utf-8") as f:
        items = json.load(f)
    os.makedirs(args.save_path_prefix, exist_ok=True)
    results, invalid_num = [], 0
    for item in items:
        name = item["image_name"] if isinstance(item, dict) else item
        path = os.path.join(args.test_image_prefix_path, name)
        try:
            pred = index.search_text(path)
            out = dict(item) if isinstance(item, dict) else {"image_name": name}
            out["prediction"] = pred
            results.append(out)
        except Exception:
            invalid_num += 1  # skip bad images (clipretrieval.py:121-127)
    save_path = os.path.join(args.save_path_prefix, args.save_name)
    with open(save_path, "w") as f:
        json.dump(results, f, indent=4)
    print(f"Inference completed! invalid number is {invalid_num}")


if __name__ == "__main__":
    build_index_main()
