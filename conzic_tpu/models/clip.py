"""Flax CLIP: vision tower (ViT), text tower, joint projection space.

Rebuild of the scoring model the reference wraps at
``/root/reference/clip/clip.py``:
  - image embedding = vision_model pooled output -> visual_projection
    (``clip/clip.py:55-62``), computed ONCE per image;
  - text embedding = text_model pooled (EOT position) -> text_projection
    (``clip/clip.py:78-84``), the hot loop (k candidate sentences per Gibbs
    position);
  - similarity = ``logit_scale.exp() * cos(text, image)`` with a softmax over
    candidates and the raw cosine both returned (``clip/clip.py:86-98``).

Differences by design (TPU-first): pixel input is NHWC; both towers run in
bf16 with fp32 LayerNorm/softmax; candidate scoring is a single batched
forward instead of per-sentence host loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from conzic_tpu.models.configs import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
from conzic_tpu.models.layers import LayerNorm, TransformerStack
from conzic_tpu.ops.attention import make_attn_mask


class CLIPTextTower(nn.Module):
    """Pre-LN causal transformer over BPE ids; pooled at the first EOS token."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    scan_layers: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        B, S = input_ids.shape
        x = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos_table = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos_table[:S].astype(self.dtype)[None, :, :]
        bias = make_attn_mask(attention_mask, S, causal=True)
        x = TransformerStack(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            intermediate_size=cfg.intermediate_size,
            act=cfg.hidden_act,
            eps=cfg.layer_norm_eps,
            pre_ln=True,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
            name="encoder",
        )(x, bias)
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="final_ln")(x)
        # Pool at the first EOS position (HF CLIP pools at argmax(ids), valid
        # because EOS is the highest id in the CLIP vocab; we use the explicit
        # first-EOS index which matches for right-padded sequences).
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=1)  # first occurrence
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)
        return pooled[:, 0, :]


class CLIPVisionTower(nn.Module):
    """ViT with class token; pooled output = post-LN of the class token."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    scan_layers: bool = False

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: (B, H, W, C) NHWC, already preprocessed."""
        cfg = self.config
        B = pixel_values.shape[0]
        patches = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)  # (B, P, H)
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            jnp.float32,
        )
        cls_tok = jnp.broadcast_to(
            cls.astype(self.dtype)[None, None, :], (B, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls_tok, patches], axis=1)
        pos_table = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.seq_len, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos_table.astype(self.dtype)[None, :, :]
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="pre_ln")(x)
        x = TransformerStack(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            head_dim=cfg.head_dim,
            intermediate_size=cfg.intermediate_size,
            act=cfg.hidden_act,
            eps=cfg.layer_norm_eps,
            pre_ln=True,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
            name="encoder",
        )(x)
        pooled = x[:, 0, :]
        return LayerNorm(eps=cfg.layer_norm_eps, dtype=self.dtype, name="post_ln")(
            pooled
        )


class CLIPModel(nn.Module):
    """Dual tower + projections + logit_scale.

    Methods mirror the reference wrapper's public surface
    (``clip/clip.py:31-147``) as pure functions over params.
    """

    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    scan_layers: bool = False

    def setup(self):
        cfg = self.config
        self.text_model = CLIPTextTower(
            cfg.text, dtype=self.dtype, attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
        )
        self.vision_model = CLIPVisionTower(
            cfg.vision, dtype=self.dtype, attn_impl=self.attn_impl,
            scan_layers=self.scan_layers,
        )
        self.text_projection = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype
        )
        self.visual_projection = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(cfg.logit_scale_init),
            (),
            jnp.float32,
        )

    def encode_image(self, pixel_values: jax.Array) -> jax.Array:
        """(B, H, W, C) -> (B, projection_dim). Reference: clip/clip.py:55-62."""
        return self.visual_projection(self.vision_model(pixel_values))

    def encode_text(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """(N, S) ids -> (N, projection_dim). Reference: clip/clip.py:78-84."""
        return self.text_projection(self.text_model(input_ids, attention_mask))

    def similarity(
        self, image_embeds: jax.Array, text_embeds: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Candidate-set similarity, reference semantics (clip/clip.py:86-98).

        Args:
          image_embeds: (B, D).
          text_embeds: (B*K, D) — K candidate sentences per image.

        Returns:
          (softmax over K of scaled cosine, raw cosine), both (B, K) fp32.
        """
        B = image_embeds.shape[0]
        text = text_embeds.reshape(B, -1, text_embeds.shape[-1]).astype(jnp.float32)
        img = image_embeds.astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        cosine = jnp.einsum("bkd,bd->bk", text, img)
        scaled = cosine * jnp.exp(self.logit_scale)
        return jax.nn.softmax(scaled, axis=-1), cosine

    def __call__(
        self,
        pixel_values: jax.Array,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Joint forward (used for init/shape-checks): returns
        (image_embeds, text_embeds)."""
        return self.encode_image(pixel_values), self.encode_text(
            input_ids, attention_mask
        )

    def init_params(self, rng: jax.Array):
        cfg = self.config
        pixels = jnp.zeros(
            (1, cfg.vision.image_size, cfg.vision.image_size, cfg.vision.num_channels),
            jnp.float32,
        )
        ids = jnp.zeros((1, cfg.text.max_position_embeddings), jnp.int32)
        return self.init(rng, pixels, ids)["params"]
