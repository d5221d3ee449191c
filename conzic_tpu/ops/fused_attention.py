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


def masked_softmax_core(q, k, v, lens, *, num_heads: int, causal: bool,
                        scale: float):
    """Shared kernel core for every fused-attention variant: projected
    ``q (G*H, Sq, D)``, ``k/v (G*H, Sk, D)``, ``lens (G, 1)`` key-padding
    lengths -> fp32 attention output ``(G*H, Sq, D)``. Rectangular causal
    offset ``Sk - Sq`` (shared-prefix suffix attention; square reduces to
    ``col <= row``). One definition so a masking fix applies everywhere
    (this file's two kernels + fused_attn_block)."""
    GH, Sq, D = q.shape
    Sk = k.shape[1]
    H = num_heads
    G = GH // H
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G*H, Sq, Sk)
    row = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 1)
    if causal:
        logits = jnp.where((col <= row + (Sk - Sq))[None, :, :], logits,
                           NEG_INF)
    # key padding: keys at index >= lens[g] masked for every head of g
    key_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Sk), 1)
    keep = key_idx < lens  # (G, Sk)
    keep = jnp.repeat(keep[:, None, :], H, axis=1).reshape(GH, 1, Sk)
    logits = jnp.where(keep, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    return jax.lax.dot_general(
        w, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G*H, Sq, D) fp32


def _kernel(q_ref, k_ref, v_ref, lens_ref, o_ref, *, causal: bool,
            scale: float):
    G, Sq, H, D = q_ref.shape
    Sk = k_ref.shape[1]
    # (G,S,H,D) -> (G,H,S,D) -> (G*H, S, D)
    q = jnp.transpose(q_ref[:], (0, 2, 1, 3)).reshape(G * H, Sq, D)
    k = jnp.transpose(k_ref[:], (0, 2, 1, 3)).reshape(G * H, Sk, D)
    v = jnp.transpose(v_ref[:], (0, 2, 1, 3)).reshape(G * H, Sk, D)
    out = masked_softmax_core(q, k, v, lens_ref[:], num_heads=H,
                              causal=causal, scale=scale)
    out = out.reshape(G, H, Sq, D).transpose(0, 2, 1, 3)
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
    """q: (N, Sq, H, D); k/v: (N, Sk, H, D) with Sk >= Sq (rectangular =
    shared-prefix suffix attention, causal offset Sk-Sq); lens: (N,) valid
    KEY lengths (None = all Sk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, Sq, H, D = q.shape
    Sk = k.shape[1]
    if lens is None:
        lens = jnp.full((N,), Sk, jnp.int32)
    G = min(group, N)
    pad = (-N) % G
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, Sq, H, D), q.dtype)], axis=0)
        zk = jnp.zeros((pad, Sk, H, D), k.dtype)
        k = jnp.concatenate([k, zk], axis=0)
        v = jnp.concatenate([v, zk], axis=0)
        lens = jnp.concatenate([lens, jnp.ones((pad,), jnp.int32)], axis=0)
    lens2d = lens.astype(jnp.int32).reshape(-1, 1)
    grid = (q.shape[0] // G,)
    qspec = pl.BlockSpec((G, Sq, H, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((G, Sk, H, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, causal=causal, scale=D ** -0.5),
        grid=grid,
        in_specs=[
            qspec, kspec, kspec,
            pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, lens2d)
    if pad:
        out = out[:N]
    return out


def _kernel_with_out(q_ref, k_ref, v_ref, lens_ref, wo_ref, bo_ref, o_ref,
                     *, causal: bool, scale: float):
    """Attention + out-projection in one VMEM pass.

    Every previous attention kernel on this toolchain lost end-to-end
    because pallas_call cut the exp/normalize -> out-projection fusion
    chain; this kernel CONTAINS the out-projection. The head-merge reshape
    Mosaic rejects ((G,H,Sq,D) -> (G,Sq,H*D)) is avoided by accumulating
    per-head (Sq,D) @ (D,E) products against sublane slices of Wo.
    """
    G, Sq, H, D = q_ref.shape
    Sk = k_ref.shape[1]
    E = wo_ref.shape[1]
    q = jnp.transpose(q_ref[:], (0, 2, 1, 3)).reshape(G * H, Sq, D)
    k = jnp.transpose(k_ref[:], (0, 2, 1, 3)).reshape(G * H, Sk, D)
    v = jnp.transpose(v_ref[:], (0, 2, 1, 3)).reshape(G * H, Sk, D)
    out = masked_softmax_core(q, k, v, lens_ref[:], num_heads=H,
                              causal=causal, scale=scale).astype(v.dtype)
    out4 = out.reshape(G, H, Sq, D)
    y = jnp.zeros((G, Sq, E), jnp.float32) + bo_ref[:].astype(jnp.float32)
    for h in range(H):
        y = y + jax.lax.dot_general(
            out4[:, h], wo_ref[h * D : (h + 1) * D, :],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "group", "interpret")
)
def fused_attention_with_out(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    lens: Optional[jax.Array] = None,
    *,
    causal: bool = True,
    group: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """q (N,Sq,H,D); k/v (N,Sk,H,D); wo (H*D, E); bo (E,). Returns the
    out-projected attention output (N, Sq, E) (residual NOT added)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, Sq, H, D = q.shape
    Sk = k.shape[1]
    E = wo.shape[1]
    if lens is None:
        lens = jnp.full((N,), Sk, jnp.int32)
    G = min(group, N)
    pad = (-N) % G
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, Sq, H, D), q.dtype)], axis=0)
        zk = jnp.zeros((pad, Sk, H, D), k.dtype)
        k = jnp.concatenate([k, zk], axis=0)
        v = jnp.concatenate([v, zk], axis=0)
        lens = jnp.concatenate([lens, jnp.ones((pad,), jnp.int32)], axis=0)
    lens2d = lens.astype(jnp.int32).reshape(-1, 1)
    grid = (q.shape[0] // G,)
    qspec = pl.BlockSpec((G, Sq, H, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((G, Sk, H, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_with_out, causal=causal, scale=D ** -0.5),
        grid=grid,
        in_specs=[
            qspec, kspec, kspec,
            pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H * D, E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Sq, E), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], Sq, E), q.dtype),
        interpret=interpret,
    )(q, k, v, lens2d, wo, bo)
    if pad:
        out = out[:N]
    return out
