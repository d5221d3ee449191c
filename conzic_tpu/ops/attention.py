"""Multi-head attention compute op.

One functional attention used by every tower (BERT encoder, CLIP text, CLIP
vision). Shapes are ``(batch, seq, heads, head_dim)`` throughout; softmax is
always computed in float32 for bf16 stability.

Two implementations:
  - ``"xla"``: plain einsum formulation — XLA fuses the softmax chain and at
    the short sequence lengths of this workload (<= 77 tokens) maps cleanly
    onto the MXU.
  - ``"pallas"``: fused Pallas flash-attention kernel
    (:mod:`conzic_tpu.ops.fused_attention`): VMEM-resident
    logits/softmax, 4x faster than the XLA lowering at this workload's
    shapes and immune to its copy/padding pathologies at large batch.

The reference delegates attention to HF/torch (cuDNN); this is the rebuilt
TPU-native equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative additive mask; safe in fp32 softmax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AttnMask:
    """Attention masking in both representations: additive fp32 ``bias``
    for the XLA path, (``lens``, ``causal``) for the fused Pallas kernel."""

    bias: Optional[jax.Array] = None  # (B,1,S,S) or (1,1,S,S) additive
    lens: Optional[jax.Array] = None  # (B,) valid key lengths
    causal: bool = dataclasses.field(default=False, metadata=dict(static=True))


def make_attn_mask(
    padding_mask: Optional[jax.Array],
    seq_len: int,
    *,
    causal: bool = False,
) -> AttnMask:
    bias = make_attention_bias(padding_mask, seq_len, causal=causal)
    lens = None
    if padding_mask is not None:
        # engine masks are contiguous prefixes (right padding): length = sum
        lens = jnp.sum(padding_mask.astype(jnp.int32), axis=-1)
    return AttnMask(bias=bias, lens=lens, causal=causal)


def make_attention_bias(
    padding_mask: Optional[jax.Array],
    seq_len: int,
    *,
    causal: bool = False,
) -> Optional[jax.Array]:
    """Build an additive fp32 attention bias.

    Args:
      padding_mask: optional ``(B, S)`` array, 1 for real tokens, 0 for pad.
      seq_len: S (static).
      causal: also apply a lower-triangular causal mask (CLIP text tower).

    Returns:
      ``(B, 1, S, S)`` additive bias (or ``(1, 1, S, S)`` if only causal),
      or None if no masking is needed.
    """
    bias = None
    if padding_mask is not None:
        keep = padding_mask[:, None, None, :].astype(jnp.float32)  # (B,1,1,S)
        bias = (1.0 - keep) * NEG_INF
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
        causal_bias = jnp.where(col <= row, 0.0, NEG_INF).astype(jnp.float32)
        causal_bias = causal_bias[None, None, :, :]
        bias = causal_bias if bias is None else bias + causal_bias
    return bias


def two_block_prefix_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pk: jax.Array,
    pv: jax.Array,
    bias: Optional[jax.Array],
) -> jax.Array:
    """Shared-prefix attention WITHOUT materializing broadcast+concat K/V.

    The standard prefix path broadcasts the per-image prefix K/V to all
    B*G candidate rows and concatenates onto the suffix keys — real HBM
    traffic per layer (the broadcasts measure ~5% of device time, plus the
    concat copies). Here the logits are computed in two blocks — a grouped
    prefix einsum at image-batch width and the standard suffix einsum —
    concatenated along the (small, fp32) key axis, softmaxed once, and the
    value contraction split the same way. Identical math to the concat
    path (same dots, same softmax over the same key set); only the
    value-sum association differs (two fp32 partial sums added), which is
    below bf16 output precision.

    MEASURED 50% SLOWER end-to-end (1.38 vs 2.79 caps/s at the r2
    headline config): the explicit concat + 5-D transposes perturb the
    attention-neighborhood mega-fusions — the fusion-preservation lesson
    (CLAUDE.md / ROADMAP). Kept as a tested opt-in (``attn_impl
    "twoblock"``) for other toolchains; do not re-measure blind.

    Args:
      q, k, v: (B*G, S, H, D) suffix projections.
      pk, pv: (B, P, H, D) shared prefix K/V.
      bias: additive fp32 bias broadcastable to (B*G, H, S, P+S) —
        full key width, prefix keys first.
    """
    N, S, H, D = q.shape
    B, P = pk.shape[0], pk.shape[1]
    G = N // B
    scale = D ** -0.5

    l_s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                     preferred_element_type=jnp.float32)
    qg = q.reshape(B, G * S, H, D)
    l_p = jnp.einsum("bqhd,bphd->bhqp", qg, pk.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    l_p = (
        l_p.reshape(B, H, G, S, P)
        .transpose(0, 2, 1, 3, 4)
        .reshape(N, H, S, P)
    )
    logits = jnp.concatenate([l_p, l_s], axis=-1) * scale
    if bias is not None:
        logits = logits + bias
    w = jax.nn.softmax(logits, axis=-1)
    w_s = w[..., P:].astype(q.dtype)
    w_p = w[..., :P].astype(q.dtype)
    out_s = jnp.einsum("bhqk,bkhd->bqhd", w_s, v,
                       preferred_element_type=jnp.float32)
    w_pg = (
        w_p.reshape(B, G, H, S, P)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, H, G * S, P)
    )
    out_p = jnp.einsum("bhqp,bphd->bqhd", w_pg, pv.astype(q.dtype),
                       preferred_element_type=jnp.float32)
    out = out_s + out_p.reshape(N, S, H, D)
    return out.astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[AttnMask] = None,
    impl: str = "xla",
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q, k, v: ``(B, S, H, D)``.
      bias: optional additive fp32 bias broadcastable to ``(B, H, S, S)``.
      mask: optional AttnMask (carries bias + lens/causal); supersedes bias.
      impl: "xla" | "xla_bhsd" | "pallas" (fused VMEM-resident kernel on
        TPU; falls back to xla off-TPU).

    Returns:
      ``(B, S, H, D)`` in q's dtype.
    """
    if mask is not None:
        bias = mask.bias
    if impl == "pallas":
        if mask is None and bias is not None:
            # a raw additive bias without the structured AttnMask (the
            # pooled-readout query_idx path converts the mask to a bias
            # array, layers.py) cannot be expressed through the fused
            # kernel's (lens, causal) interface — running it anyway would
            # silently DROP the causal/padding mask. Fall back to xla.
            impl = "xla"
        elif jax.default_backend() == "tpu":
            from conzic_tpu.ops.fused_attention import fused_masked_attention

            return fused_masked_attention(
                q, k, v,
                mask.lens if mask is not None else None,
                causal=mask.causal if mask is not None else False,
                group=8,
            )
        else:
            impl = "xla"  # fallback off-TPU

    dtype = q.dtype
    depth = q.shape[-1]
    scale = depth ** -0.5

    if impl == "xla_bhsd":
        # explicit (B, H, S, D) layout: the transposes sit right after the
        # projections where XLA can fuse them into the matmul epilogue. At
        # large batch (B*k >= 3200 rows) the bqhd einsum formulation makes
        # XLA materialize 48 full-tensor layout copies per step (measured:
        # 17% of device time at B=16); this variant avoids the flip.
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                       preferred_element_type=jnp.float32)
            * scale
        )
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, vt)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(dtype)

    # (B, H, Sq, Sk) logits in fp32. NOTE: storing them bf16 was measured
    # SLOWER (2.35 vs 2.69 caps/s) — the softmax chain is VPU-bound, not
    # HBM-bound, and the dtype change broke XLA's logits+max tuple fusion.
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out.astype(dtype)
