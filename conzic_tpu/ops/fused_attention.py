"""Fused masked multi-head attention (Pallas TPU kernel).

Motivation (tools/profile_engine.py traces): at S=24 the XLA lowering
materializes per-layer fp32 logits ``(N, H, S, S)`` in HBM with the last
dim lane-padded 24 -> 128 — 5.3x wasted bandwidth on the bias-add/softmax
passes, ~38% of hot-loop device time at B=4 and the copy explosion at
B>=16. This kernel keeps the whole attention instance in VMEM: one read of
q/k/v, one write of the output.

Shapes: q/k/v ``(N, S, H, D)``; optional ``lens (N,)`` key-padding lengths;
static causal flag. Processes ``G`` instances per grid step with batched
``dot_general`` over (G*H).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, lens_ref, o_ref, *, causal: bool,
            scale: float):
    G, S, H, D = q_ref.shape
    # (G,S,H,D) -> (G,H,S,D) -> (G*H, S, D)
    q = jnp.transpose(q_ref[:], (0, 2, 1, 3)).reshape(G * H, S, D)
    k = jnp.transpose(k_ref[:], (0, 2, 1, 3)).reshape(G * H, S, D)
    v = jnp.transpose(v_ref[:], (0, 2, 1, 3)).reshape(G * H, S, D)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G*H, S, S)
    logits = logits * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    if causal:
        logits = jnp.where((col <= row)[None, :, :], logits, NEG_INF)
    # key padding: keys at index >= lens[g] masked for every head of g
    lens = lens_ref[:]  # (G, 1) int32
    key_idx = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    keep = key_idx < lens  # (G, S)
    keep = jnp.repeat(keep[:, None, :], H, axis=1).reshape(G * H, 1, S)
    logits = jnp.where(keep, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    out = jax.lax.dot_general(
        w, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G*H, S, D)
    out = out.reshape(G, H, S, D).transpose(0, 2, 1, 3)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "group", "interpret")
)
def fused_masked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    lens: Optional[jax.Array] = None,
    *,
    causal: bool = True,
    group: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """q/k/v: (N, S, H, D); lens: (N,) valid key lengths (None = all S)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, S, H, D = q.shape
    if lens is None:
        lens = jnp.full((N,), S, jnp.int32)
    G = min(group, N)
    pad = (-N) % G
    if pad:
        zpad = jnp.zeros((pad, S, H, D), q.dtype)
        q = jnp.concatenate([q, zpad], axis=0)
        k = jnp.concatenate([k, zpad], axis=0)
        v = jnp.concatenate([v, zpad], axis=0)
        lens = jnp.concatenate([lens, jnp.ones((pad,), jnp.int32)], axis=0)
    lens2d = lens.astype(jnp.int32).reshape(-1, 1)
    grid = (q.shape[0] // G,)
    spec = pl.BlockSpec((G, S, H, D), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, causal=causal, scale=D ** -0.5),
        grid=grid,
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, lens2d)
    if pad:
        out = out[:N]
    return out
