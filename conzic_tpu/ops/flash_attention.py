"""Fused attention kernel (Pallas TPU), with XLA fallback.

The workload's sequence lengths are short (BERT ~17 tokens, CLIP text 77,
CLIP vision 50) but the *batch* is large in the hot loop (B x k candidate
sentences, k=200 by default). The kernel therefore tiles over the flattened
batch*heads grid and keeps each whole (S, D) attention instance resident in
VMEM — one fused softmax(QK^T)V with no HBM round-trip for the logits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PALLAS_OK = None


def _pallas_available() -> bool:
    global _PALLAS_OK
    if _PALLAS_OK is None:
        _PALLAS_OK = jax.default_backend() == "tpu"
    return _PALLAS_OK


def _xla_reference(q, k, v, bias):
    from conzic_tpu.ops.attention import dot_product_attention

    return dot_product_attention(q, k, v, bias=bias, impl="xla")


@functools.partial(jax.jit, static_argnames=())
def _fused_attention_tpu(q, k, v):
    """Bias-free fused attention for (B, S, H, D) with small S."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, H, D = q.shape
    dtype = q.dtype
    scale = D ** -0.5

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]  # (S, D)
        kb = k_ref[0]
        vb = v_ref[0]
        logits = jnp.dot(
            qb, kb.T, preferred_element_type=jnp.float32
        ) * scale  # (S, S)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        w = (p / denom).astype(dtype)
        o_ref[0] = jnp.dot(w, vb, preferred_element_type=jnp.float32).astype(dtype)

    # flatten (B, H) into the grid; each program handles one head instance
    qt = q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    kt = k.transpose(0, 2, 1, 3).reshape(B * H, S, D)
    vt = v.transpose(0, 2, 1, 3).reshape(B * H, S, D)

    spec = pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), dtype),
    )(qt, kt, vt)
    return out.reshape(B, H, S, D).transpose(0, 2, 1, 3)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused attention; falls back to the XLA path off-TPU or when a bias
    (padding/causal mask) is present.

    Note: the Gibbs hot path calls the CLIP text tower with fixed-length
    right-padded sequences whose mask is static per shape — those still carry
    a bias, so the current kernel is used for the bias-free BERT path. A
    masked variant is an optimization candidate tracked in ROADMAP.md.
    """
    if bias is not None or not _pallas_available():
        return _xla_reference(q, k, v, bias)
    return _fused_attention_tpu(q, k, v)
