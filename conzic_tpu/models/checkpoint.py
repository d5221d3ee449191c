"""Native flax checkpoint directories for locally trained models.

``models/convert.py`` loads *HF torch* checkpoint dirs; this module is
the save/load pair for models trained HERE (tools/train_tiny.py) — flax
param msgpack + dataclass configs + the tokenizer files, all in one
directory, marked by ``conzic_tiny.json`` so loaders can tell the two
formats apart.

Layout:
  conzic_tiny.json   format marker, both model configs, training meta
  bert.msgpack       BertForMaskedLM params (flax serialization)
  clip.msgpack       CLIPModel params
  vocab.txt          WordPiece vocab (BERT side)
  bpe_vocab.json / bpe_merges.txt   CLIP BPE files
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from conzic_tpu.models.configs import (
    BertConfig,
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)

MARKER = "conzic_tiny.json"


def is_tiny_checkpoint(path: str) -> bool:
    return os.path.isfile(os.path.join(path, MARKER))


def _cast(params, dtype):
    import jax

    def leaf(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(leaf, params)


def save_tiny_checkpoint(
    path: str,
    bert_config: BertConfig,
    bert_params,
    clip_config: CLIPConfig,
    clip_params,
    wp_vocab: Dict[str, int],
    bpe_vocab_file: str,
    bpe_merges_file: str,
    meta: Optional[Dict[str, Any]] = None,
    save_dtype: str = "bfloat16",
) -> str:
    """Write the checkpoint directory (created/overwritten)."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    dtype = jnp.bfloat16 if save_dtype == "bfloat16" else jnp.float32
    with open(os.path.join(path, "bert.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_cast(bert_params, dtype)))
    with open(os.path.join(path, "clip.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(_cast(clip_params, dtype)))
    with open(os.path.join(path, "vocab.txt"), "w", encoding="utf-8") as f:
        for tok in sorted(wp_vocab, key=wp_vocab.get):
            f.write(tok + "\n")
    shutil.copyfile(bpe_vocab_file, os.path.join(path, "bpe_vocab.json"))
    shutil.copyfile(bpe_merges_file, os.path.join(path, "bpe_merges.txt"))
    doc = {
        "format": "conzic-flax-v1",
        "save_dtype": save_dtype,
        "bert_config": dataclasses.asdict(bert_config),
        "clip_config": dataclasses.asdict(clip_config),
        "meta": meta or {},
    }
    with open(os.path.join(path, MARKER), "w") as f:
        json.dump(doc, f, indent=1)
    return path


def load_tiny_checkpoint(
    path: str,
) -> Tuple[BertConfig, Any, CLIPConfig, Any, Dict[str, Any]]:
    """Read back (bert_cfg, bert_params, clip_cfg, clip_params, doc).
    Params are returned as stored (see doc['save_dtype']); the Captioner
    casts per its own param_dtype policy."""
    from flax import serialization

    with open(os.path.join(path, MARKER)) as f:
        doc = json.load(f)
    if doc.get("format") != "conzic-flax-v1":
        raise ValueError(f"unknown checkpoint format in {path}: "
                         f"{doc.get('format')!r}")
    bert_cfg = BertConfig(**doc["bert_config"])
    cd = doc["clip_config"]
    clip_cfg = CLIPConfig(
        text=CLIPTextConfig(**cd["text"]),
        vision=CLIPVisionConfig(**cd["vision"]),
        projection_dim=cd["projection_dim"],
        logit_scale_init=cd["logit_scale_init"],
    )
    with open(os.path.join(path, "bert.msgpack"), "rb") as f:
        bert_params = serialization.msgpack_restore(f.read())
    with open(os.path.join(path, "clip.msgpack"), "rb") as f:
        clip_params = serialization.msgpack_restore(f.read())
    return bert_cfg, bert_params, clip_cfg, clip_params, doc
