"""HF checkpoint -> JAX parameter conversion.

The reference downloads pretrained ``bert-base-uncased`` and
``openai/clip-vit-base-patch32`` via ``transformers``
(``/root/reference/demo.py:125-128``). This module is the rebuild's
checkpoint-compatibility layer: it maps an HF state dict (safetensors or
torch ``.bin``) onto the parameter pytrees of
:class:`conzic_tpu.models.bert.BertForMaskedLM` and
:class:`conzic_tpu.models.clip.CLIPModel`.

Pure numpy in/out — no torch import needed on the load path when the
checkpoint is safetensors.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from conzic_tpu.models.configs import (
    BertConfig,
    CLIPConfig,
    load_hf_config,
)

Array = np.ndarray
StateDict = Dict[str, Array]


def _dense(sd: StateDict, prefix: str) -> dict:
    """HF Linear (out,in) -> linen Dense {kernel:(in,out), bias:(out,)}."""
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def _dense_general_in(sd: StateDict, prefix: str, heads: int, head_dim: int) -> dict:
    """HF Linear -> DenseGeneral with features=(heads, head_dim)."""
    w = sd[f"{prefix}.weight"]  # (out, in)
    kernel = np.ascontiguousarray(w.T).reshape(-1, heads, head_dim)
    bias = sd[f"{prefix}.bias"].reshape(heads, head_dim)
    return {"kernel": kernel, "bias": bias}


def _dense_general_out(sd: StateDict, prefix: str, heads: int, head_dim: int) -> dict:
    """HF Linear -> DenseGeneral with axis=(-2,-1): kernel (H, D, out)."""
    w = sd[f"{prefix}.weight"]  # (out, in) with in = heads*head_dim
    kernel = np.ascontiguousarray(w.T).reshape(heads, head_dim, -1)
    return {"kernel": kernel, "bias": sd[f"{prefix}.bias"]}


def _ln(sd: StateDict, prefix: str) -> dict:
    return {"ln": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def bert_params_from_state_dict(sd: StateDict, config: BertConfig) -> dict:
    """Map an HF ``BertForMaskedLM`` or ``RobertaForMaskedLM`` state dict
    onto our param tree (the encoders are structurally identical; RoBERTa
    differs in prefix and MLM head naming)."""
    H, D = config.num_heads, config.head_dim
    if any(k.startswith("roberta.") for k in sd):
        return _roberta_params(sd, config)
    p = "bert."
    if not any(k.startswith(p) for k in sd):
        p = ""  # bare encoder checkpoints

    params: dict = {
        "embeddings": {
            "word": {"embedding": sd[f"{p}embeddings.word_embeddings.weight"]},
            "position": {
                "embedding": sd[f"{p}embeddings.position_embeddings.weight"]
            },
            "token_type": {
                "embedding": sd[f"{p}embeddings.token_type_embeddings.weight"]
            },
            "ln": _ln(sd, f"{p}embeddings.LayerNorm"),
        },
        "encoder": {},
        "mlm": {},
    }
    for i in range(config.num_layers):
        lp = f"{p}encoder.layer.{i}."
        params["encoder"][f"layer_{i}"] = {
            "attention": {
                "query": _dense_general_in(sd, lp + "attention.self.query", H, D),
                "key": _dense_general_in(sd, lp + "attention.self.key", H, D),
                "value": _dense_general_in(sd, lp + "attention.self.value", H, D),
                "out": _dense_general_out(sd, lp + "attention.output.dense", H, D),
            },
            "ln1": _ln(sd, lp + "attention.output.LayerNorm"),
            "mlp": {
                "fc1": _dense(sd, lp + "intermediate.dense"),
                "fc2": _dense(sd, lp + "output.dense"),
            },
            "ln2": _ln(sd, lp + "output.LayerNorm"),
        }
    params["mlm"] = {
        "transform": _dense(sd, "cls.predictions.transform.dense"),
        "ln": _ln(sd, "cls.predictions.transform.LayerNorm"),
        "bias": _first_key(sd, "cls.predictions.bias", "cls.predictions.decoder.bias"),
    }
    return params


def _first_key(sd: StateDict, *names: str):
    """First present tensor among ``names``; a missing-everywhere lookup
    raises NOW with the candidate names instead of planting a None leaf
    that surfaces later as a cryptic tree-map error."""
    for n in names:
        if n in sd:
            return sd[n]
    raise KeyError(
        f"checkpoint has none of {names!r} — not a *ForMaskedLM export?"
    )


def _roberta_params(sd: StateDict, config: BertConfig) -> dict:
    """HF RobertaForMaskedLM: ``roberta.`` prefix, MLM head under
    ``lm_head.{dense,layer_norm,bias}``."""
    H, D = config.num_heads, config.head_dim
    p = "roberta."
    params: dict = {
        "embeddings": {
            "word": {"embedding": sd[f"{p}embeddings.word_embeddings.weight"]},
            "position": {
                "embedding": sd[f"{p}embeddings.position_embeddings.weight"]
            },
            "token_type": {
                "embedding": sd[f"{p}embeddings.token_type_embeddings.weight"]
            },
            "ln": _ln(sd, f"{p}embeddings.LayerNorm"),
        },
        "encoder": {},
    }
    for i in range(config.num_layers):
        lp = f"{p}encoder.layer.{i}."
        params["encoder"][f"layer_{i}"] = {
            "attention": {
                "query": _dense_general_in(sd, lp + "attention.self.query", H, D),
                "key": _dense_general_in(sd, lp + "attention.self.key", H, D),
                "value": _dense_general_in(sd, lp + "attention.self.value", H, D),
                "out": _dense_general_out(sd, lp + "attention.output.dense", H, D),
            },
            "ln1": _ln(sd, lp + "attention.output.LayerNorm"),
            "mlp": {
                "fc1": _dense(sd, lp + "intermediate.dense"),
                "fc2": _dense(sd, lp + "output.dense"),
            },
            "ln2": _ln(sd, lp + "output.LayerNorm"),
        }
    params["mlm"] = {
        "transform": _dense(sd, "lm_head.dense"),
        "ln": _ln(sd, "lm_head.layer_norm"),
        "bias": _first_key(sd, "lm_head.bias", "lm_head.decoder.bias"),
    }
    return params


def clip_params_from_state_dict(sd: StateDict, config: CLIPConfig) -> dict:
    """Map an HF ``CLIPModel`` state dict onto our param tree."""

    def tower(prefix: str, heads: int, head_dim: int, num_layers: int) -> dict:
        enc: dict = {}
        for i in range(num_layers):
            lp = f"{prefix}.encoder.layers.{i}."
            enc[f"layer_{i}"] = {
                "attention": {
                    "query": _dense_general_in(sd, lp + "self_attn.q_proj", heads, head_dim),
                    "key": _dense_general_in(sd, lp + "self_attn.k_proj", heads, head_dim),
                    "value": _dense_general_in(sd, lp + "self_attn.v_proj", heads, head_dim),
                    "out": _dense_general_out(sd, lp + "self_attn.out_proj", heads, head_dim),
                },
                "ln1": _ln(sd, lp + "layer_norm1"),
                "mlp": {
                    "fc1": _dense(sd, lp + "mlp.fc1"),
                    "fc2": _dense(sd, lp + "mlp.fc2"),
                },
                "ln2": _ln(sd, lp + "layer_norm2"),
            }
        return enc

    t, v = config.text, config.vision
    # HF spells the vision pre-norm "pre_layrnorm" (checkpoint typo kept).
    pre_ln_key = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    patch_w = sd["vision_model.embeddings.patch_embedding.weight"]  # (O,I,KH,KW)
    params = {
        "text_model": {
            "token_embedding": {
                "embedding": sd["text_model.embeddings.token_embedding.weight"]
            },
            "position_embedding": sd[
                "text_model.embeddings.position_embedding.weight"
            ],
            "encoder": tower("text_model", t.num_heads, t.head_dim, t.num_layers),
            "final_ln": _ln(sd, "text_model.final_layer_norm"),
        },
        "vision_model": {
            "patch_embedding": {
                "kernel": np.ascontiguousarray(patch_w.transpose(2, 3, 1, 0))
            },
            "class_embedding": sd["vision_model.embeddings.class_embedding"].reshape(
                -1
            ),
            "position_embedding": sd[
                "vision_model.embeddings.position_embedding.weight"
            ],
            "pre_ln": _ln(sd, pre_ln_key),
            "encoder": tower("vision_model", v.num_heads, v.head_dim, v.num_layers),
            "post_ln": _ln(sd, "vision_model.post_layernorm"),
        },
        "text_projection": {
            "kernel": np.ascontiguousarray(sd["text_projection.weight"].T)
        },
        "visual_projection": {
            "kernel": np.ascontiguousarray(sd["visual_projection.weight"].T)
        },
        "logit_scale": np.asarray(sd["logit_scale"]).reshape(()),
    }
    return params


def stack_layers(encoder_params: dict) -> dict:
    """Re-pack an unrolled ``{"layer_i": tree}`` encoder into the stacked
    ``{"layers": tree-with-leading-L-axis}`` layout used by
    ``TransformerStack(scan_layers=True)``."""
    n = len(encoder_params)
    layers = [encoder_params[f"layer_{i}"] for i in range(n)]
    import jax

    return {
        "layers": jax.tree.map(lambda *xs: np.stack(xs, axis=0), *layers)
    }


def params_with_scanned_encoders(params: dict) -> dict:
    """Convert any ``encoder`` subtree from per-layer to stacked layout
    (works for the BERT tree and both CLIP towers)."""
    out = dict(params)
    if "encoder" in out:
        out["encoder"] = stack_layers(out["encoder"])
    for tower in ("text_model", "vision_model"):
        if tower in out and "encoder" in out[tower]:
            sub = dict(out[tower])
            sub["encoder"] = stack_layers(sub["encoder"])
            out[tower] = sub
    return out


def torch_state_dict_to_numpy(module) -> StateDict:
    """In-memory torch module -> numpy state dict (for parity tests)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def load_state_dict(checkpoint_dir: str) -> StateDict:
    """Read model weights from a local HF checkpoint directory
    (safetensors preferred, torch ``.bin`` fallback)."""
    st_path = os.path.join(checkpoint_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    # sharded safetensors
    index = os.path.join(checkpoint_dir, "model.safetensors.index.json")
    if os.path.exists(index):
        import json

        from safetensors.numpy import load_file

        with open(index) as f:
            shard_names = sorted(set(json.load(f)["weight_map"].values()))
        sd: StateDict = {}
        for name in shard_names:
            sd.update(load_file(os.path.join(checkpoint_dir, name)))
        return sd
    bin_path = os.path.join(checkpoint_dir, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd_t = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd_t.items()}
    raise FileNotFoundError(
        f"no model.safetensors / pytorch_model.bin under {checkpoint_dir}"
    )


def load_bert(checkpoint_dir: str) -> Tuple[BertConfig, dict]:
    config = BertConfig.from_hf_dict(load_hf_config(checkpoint_dir))
    sd = load_state_dict(checkpoint_dir)
    return config, bert_params_from_state_dict(sd, config)


def load_clip(checkpoint_dir: str) -> Tuple[CLIPConfig, dict]:
    config = CLIPConfig.from_hf_dict(load_hf_config(checkpoint_dir))
    sd = load_state_dict(checkpoint_dir)
    return config, clip_params_from_state_dict(sd, config)
