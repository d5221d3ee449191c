"""Flax BERT encoder + masked-LM head.

Rebuild of the proposal model the reference loads via
``AutoModelForMaskedLM`` (``/root/reference/demo.py:125``) and queries once
per Gibbs position (``/root/reference/gen_utils.py:69``:
``out = model(inp).logits``).

Post-LayerNorm residual blocks, exact (erf) gelu, learned absolute position
embeddings, token-type embeddings, and the standard MLM transform head whose
decoder is tied to the word-embedding matrix plus a per-vocab bias.

TPU-first split: ``hidden()`` runs the encoder, ``lm_head()`` projects to
vocab. The Gibbs engine applies the (hidden x 30522) projection only at the
masked position(s) instead of the whole sequence — the reference pays the
full ``(B, S, V)`` logits matmul every step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from conzic_tpu.models.configs import BertConfig
from conzic_tpu.models.layers import (
    ACTIVATIONS,
    LayerNorm,
    TransformerStack,
)
from conzic_tpu.ops.attention import make_attn_mask


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        token_type_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        B, S = input_ids.shape
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word"
        )(input_ids)
        positions = jnp.arange(S)[None, :] + cfg.position_offset
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=self.dtype,
            name="position",
        )(positions)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok_type = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            dtype=self.dtype,
            name="token_type",
        )(token_type_ids)
        x = word + pos + tok_type
        return LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="ln")(x)


class BertMlmHead(nn.Module):
    """Transform (dense + act + LN) then project onto the tied word-embedding
    matrix plus a free bias. Accepts ``(..., H)`` hidden states."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, word_embedding: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform")(hidden)
        h = ACTIVATIONS[cfg.hidden_act](h)
        h = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="ln")(h)
        bias = self.param(
            "bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32
        )
        logits = jnp.einsum(
            "...h,vh->...v",
            h,
            word_embedding.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits + bias.astype(jnp.float32)


class BertForMaskedLM(nn.Module):
    """Full masked-LM model.

    ``__call__`` -> fp32 ``(B, S, V)`` logits (HF-equivalent surface).
    ``hidden``  -> ``(B, S, H)`` encoder states.
    ``lm_head`` -> vocab logits for any ``(..., H)`` slice.
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    scan_layers: bool = False
    # "int8": encoder projections/MLPs through the int8 MXU path (the
    # --quant int8_all tier; param shapes unchanged, so fp checkpoints
    # load as-is). The MLM vocab projection stays full precision — it is
    # ~2% of the engine's BERT FLOPs (one masked slot per row).
    quant: str = "none"

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, dtype=self.dtype)
        self.encoder = TransformerStack(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            intermediate_size=cfg.intermediate_size,
            act=cfg.hidden_act,
            eps=cfg.layer_norm_eps,
            pre_ln=False,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
            quant=self.quant,
        )
        self.mlm = BertMlmHead(cfg, dtype=self.dtype)

    def hidden(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        pool_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``pool_idx`` (B, Q): only those positions' hidden states are
        consumed (the engine projects vocab logits at masked slots only),
        so the final encoder layer computes just those rows — output
        becomes (B, Q, H)."""
        x = self.embeddings(input_ids, token_type_ids)
        mask = make_attn_mask(attention_mask, input_ids.shape[1])
        if pool_idx is not None and not self.scan_layers:
            return self.encoder(x, mask, pool_idx=pool_idx)
        out = self.encoder(x, mask)
        if pool_idx is not None:
            out = jnp.take_along_axis(out, pool_idx[:, :, None], axis=1)
        return out

    def lm_head(self, hidden: jax.Array) -> jax.Array:
        word_table = self.variables["params"]["embeddings"]["word"]["embedding"]
        return self.mlm(hidden, word_table)

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.lm_head(self.hidden(input_ids, attention_mask, token_type_ids))

    def init_params(self, rng: jax.Array, seq_len: int = 16):
        ids = jnp.zeros((1, seq_len), jnp.int32)
        return self.init(rng, ids)["params"]
