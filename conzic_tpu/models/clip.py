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
from conzic_tpu.ops.attention import make_attention_bias, make_attn_mask


class CLIPTextTower(nn.Module):
    """Pre-LN causal transformer over BPE ids; pooled at the first EOS token."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    scan_layers: bool = False
    quant: str = "none"  # int8 MXU path for the hot candidate scoring

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        *,
        pos_offset: int = 0,
        prefix_kvs: Optional[list] = None,
        return_kvs: bool = False,
    ):
        """Standard full-row encode, or one side of the exact prefix-KV
        split (engine/gibbs.py): ``return_kvs=True`` additionally returns
        the per-layer attention K/V of this pass; ``prefix_kvs`` runs the
        pass as a SUFFIX continuation — positions offset by ``pos_offset``
        (static), every query attending the cached prefix keys plus the
        causal suffix prefix."""
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
        if pos_offset + S > cfg.max_position_embeddings:
            # lane-padding experiment (config.clip_pad_to): rows beyond the
            # table are zeros and belong to masked-off PAD columns only —
            # they never reach the pooled output (first-EOS row)
            pos_table = jnp.pad(
                pos_table,
                ((0, pos_offset + S - cfg.max_position_embeddings), (0, 0)),
            )
        x = x + pos_table[pos_offset : pos_offset + S].astype(self.dtype)[None, :, :]
        if prefix_kvs is not None:
            # full-key-width additive bias: prefix keys unmasked (all real
            # tokens preceding every suffix query) + causal/padding over the
            # suffix keys; lens carries full key lengths for the fused
            # (Pallas) rectangular-attention path
            from conzic_tpu.ops.attention import AttnMask

            P = prefix_kvs[0][0].shape[1]
            bias_suf = make_attention_bias(attention_mask, S, causal=True)
            full_bias = jnp.concatenate(
                [jnp.zeros((*bias_suf.shape[:-1], P), jnp.float32), bias_suf],
                axis=-1,
            )
            lens = None
            if attention_mask is not None:
                lens = P + jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
            bias = AttnMask(bias=full_bias, lens=lens, causal=True)
        else:
            bias = make_attn_mask(attention_mask, S, causal=True)
        stack = TransformerStack(
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
            quant=self.quant,
            name="encoder",
        )
        # Pool at the first EOS position (HF CLIP pools at argmax(ids), valid
        # because EOS is the highest id in the CLIP vocab; we use the explicit
        # first-EOS index which matches for right-padded sequences). Only
        # that row is consumed, so the final layer computes just it
        # (pool_idx) — exact, ~1/12 of the tower's q/out/MLP work saved.
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=1)  # first occurrence
        kvs = None
        if return_kvs:
            x, kvs = stack(x, bias, return_kvs=True)
            x = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)
        elif self.scan_layers:
            x = stack(x, bias)
            x = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)
        else:
            x = stack(x, bias, prefix_kvs=prefix_kvs,
                      pool_idx=eos_pos[:, None])
        pooled = LayerNorm(
            eps=cfg.layer_norm_eps, dtype=self.dtype, name="final_ln"
        )(x)[:, 0, :]
        if return_kvs:
            return pooled, kvs
        return pooled


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


def truncated_text_params(clip_params, n_layers: int):
    """First-``n_layers`` subtree of the text tower (+ embeddings + final
    LN) — the parameter pytree a truncated :class:`CLIPTextTower`
    (``num_layers=n_layers``) applies. References the SAME arrays as the
    full params (no device copies); used by the factorized stage-1
    scorer (engine/gibbs.py) and tools/factorized_fidelity.py.

    Unrolled layer naming only — scan-stacked params (scan_layers) store
    layers as one stacked tree and cannot be truncated this way."""
    tm = clip_params["text_model"]
    if "layer_0" not in tm["encoder"]:
        raise ValueError(
            "truncated_text_params requires unrolled layer params "
            "(scan_layers=False)")
    enc = {f"layer_{i}": tm["encoder"][f"layer_{i}"] for i in range(n_layers)}
    return {
        "token_embedding": tm["token_embedding"],
        "position_embedding": tm["position_embedding"],
        "encoder": enc,
        "final_ln": tm["final_ln"],
    }


class CLIPModel(nn.Module):
    """Dual tower + projections + logit_scale.

    Methods mirror the reference wrapper's public surface
    (``clip/clip.py:31-147``) as pure functions over params.
    """

    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    scan_layers: bool = False
    quant: str = "none"  # applies to the text tower (the hot loop) only

    def setup(self):
        cfg = self.config
        self.text_model = CLIPTextTower(
            cfg.text, dtype=self.dtype, attn_impl=self.attn_impl,
            scan_layers=self.scan_layers, quant=self.quant,
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

    def encode_text_shared_prefix(
        self,
        prefix_ids: jax.Array,
        suffix_ids: jax.Array,
        suffix_mask: jax.Array,
    ) -> jax.Array:
        """Exact prefix-KV candidate encoding (engine hot path).

        All candidate rows of an image share ``prefix_ids`` (their common
        CLIP prefix up to the edited word): its per-layer K/V are computed
        once at image-batch width and shared by every candidate suffix.
        With causal attention this is bit-for-bit the same function as
        :meth:`encode_text` on the full rows — only cheaper (the reference
        re-encodes every full candidate sentence per position,
        /root/reference/gen_utils.py:76 + clip/clip.py:78-84).

        Args:
          prefix_ids: ``(B, P)`` shared prefix (starts with BOS; all real
            tokens — the engine guarantees P precedes every row's EOS).
          suffix_ids: ``(B, G, S)`` per-candidate continuation rows.
          suffix_mask: ``(B, G, S)`` suffix attention mask (EOS inclusive).

        Returns:
          ``(B*G, projection_dim)`` text embeddings.
        """
        kvs = self.text_prefix_kvs(prefix_ids)
        return self.encode_text_suffix(
            kvs, prefix_ids.shape[1], suffix_ids, suffix_mask
        )

    def text_prefix_kvs(self, prefix_ids: jax.Array):
        """(B, P) shared prefix -> per-layer attention K/V. For a fixed
        prompt the prefix never changes within a generation, so the engine
        computes this ONCE per generation and reuses it at every Gibbs
        position (engine/gibbs.py run_generation)."""
        _, kvs = self.text_model(prefix_ids, return_kvs=True)
        return kvs

    def encode_text_suffix(
        self,
        prefix_kvs,
        prefix_len: int,
        suffix_ids: jax.Array,
        suffix_mask: jax.Array,
    ) -> jax.Array:
        """Suffix half of :meth:`encode_text_shared_prefix` against cached
        prefix K/V. suffix_ids/suffix_mask: (B, G, S)."""
        B, G, S = suffix_ids.shape
        pooled = self.text_model(
            suffix_ids.reshape(B * G, S),
            suffix_mask.reshape(B * G, S),
            pos_offset=prefix_len,
            prefix_kvs=prefix_kvs,
        )
        return self.text_projection(pooled)

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
