"""Dynamic int8 matmul path (opt-in NON-parity speed tier).

The v5e MXU runs int8 at ~2x its bf16 rate (~394 TOPS). The candidate
CLIP scoring is matmul-bound at ~100% bf16 MXU utilization (DESIGN.md), so
the remaining per-chip headroom at fixed FLOPs is precision. This module
provides symmetric dynamic quantization for the hot matmuls:

  - weights: per-output-channel int8, quantized from the fp32/bf16 params
    INSIDE the program — XLA hoists the (loop-invariant) quantization out
    of the Gibbs scan, so it runs once per generation, not per step;
  - activations: per-row dynamic int8 (max-abs / 127);
  - accumulation in int32, dequantized to fp32 and cast to the module
    compute dtype.

Like ``prune_k`` this changes numerics and is off by default
(``--quant int8``); quality is measured by tools/validate_quant.py.
The reference has no analogous tier (it is fp32 torch end to end).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quantize_rows(x: jax.Array):
    """Symmetric per-row int8: x (..., D) -> (int8 values, (..., 1) scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_cols(w: jax.Array):
    """Symmetric per-output-channel int8 for a (D_in, D_out) kernel."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x (..., D_in) @ w (D_in, D_out)`` through int8 MXU.

    Returns fp32. Weight quantization is loop-invariant and hoisted by XLA;
    activation quantization is one cheap VPU pass per call.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    xq, sx = _quantize_rows(x2)
    wq, sw = _quantize_cols(w)
    y = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * sx * sw
    return y.reshape(*shape[:-1], w.shape[-1])
