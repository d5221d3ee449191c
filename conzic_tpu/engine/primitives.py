"""Standalone sampling primitives from the reference's generation toolbox.

``generate_step`` rebuilds ``/root/reference/gen_utils.py:10-31`` — the
top-k / full-categorical / greedy word sampler over a logits tensor. It is
dead code in the reference (unreachable from any CLI; the Gibbs engines use
``generate_caption_step``, whose rebuilt equivalent is
``energies.masked_lm_probs`` + ``energies.topk_candidates``), but it is part
of the public surface, so it exists here with the same semantics on jax
arrays: explicit PRNG key instead of torch's global generator, otherwise the
same three modes with the same precedence (top_k overrides sample overrides
greedy).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def generate_step(
    out: jax.Array,
    gen_idx: int,
    rng: Optional[jax.Array] = None,
    temperature: Optional[float] = None,
    top_k: int = 0,
    sample: bool = False,
) -> jax.Array:
    """Pick one token id per batch row from ``out[:, gen_idx]``.

    Args:
      out: (B, S, V) logits.
      gen_idx: position to generate for.
      rng: PRNG key; required when ``top_k > 0`` or ``sample`` (the
        reference draws from torch's global RNG, gen_utils.py:24-28).
      temperature: optional logits divisor, applied before any mode.
      top_k: if > 0, sample from the categorical over the top-k logits.
      sample: if True (and top_k == 0), sample from the full categorical.

    Returns:
      (B,) int32 token ids (greedy argmax when neither mode is set,
      gen_utils.py:30).
    """
    logits = out[:, gen_idx].astype(jnp.float32)
    if temperature is not None:
        logits = logits / temperature
    if top_k > 0:
        if rng is None:
            raise ValueError("top_k sampling requires a PRNG key")
        kth_vals, kth_idx = jax.lax.top_k(logits, top_k)
        draw = jax.random.categorical(rng, kth_vals, axis=-1)  # (B,)
        idx = jnp.take_along_axis(kth_idx, draw[:, None], axis=1)[:, 0]
    elif sample:
        if rng is None:
            raise ValueError("sample=True requires a PRNG key")
        idx = jax.random.categorical(rng, logits, axis=-1)
    else:
        idx = jnp.argmax(logits, axis=-1)
    return idx.astype(jnp.int32)
