"""Fully-fused attention block (Pallas TPU): projections + attention +
output projection + residual in one kernel.

The standalone fused attention kernel (ops/fused_attention.py) loses
end-to-end because the ``pallas_call`` is a fusion barrier: q/k/v and the
attention output materialize in HBM where XLA had fused the projections
into the chain. This kernel moves the barrier to the block edge — reads the
(normalized) block input and the residual ONCE, keeps q/k/v, logits,
softmax and the output projection in VMEM, writes the residual-added block
output ONCE. Weight blocks have constant index maps, so Mosaic's pipeline
fetches them a single time and keeps them resident across grid steps.

Workload shapes: x (N, S<=32, E<=768), H*D = E, D=64.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from conzic_tpu.ops.fused_attention import masked_softmax_core


def _kernel(x_ref, res_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, lens_ref, o_ref, *, heads: int, causal: bool):
    G, S, E = x_ref.shape
    D = E // heads
    scale = D ** -0.5
    x = x_ref[:].reshape(G * S, E)

    def proj(w_ref, b_ref):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        y = y + b_ref[:].astype(jnp.float32)
        y = y.astype(x.dtype).reshape(G, S, heads, D)
        return y.transpose(0, 2, 1, 3).reshape(G * heads, S, D)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    ctx = masked_softmax_core(q, k, v, lens_ref[:], num_heads=heads,
                              causal=causal, scale=scale)  # (G*H, S, D)
    ctx = (
        ctx.astype(x.dtype)
        .reshape(G, heads, S, D)
        .transpose(0, 2, 1, 3)
        .reshape(G * S, E)
    )
    out = jnp.dot(ctx, wo_ref[:], preferred_element_type=jnp.float32)
    out = out + bo_ref[:].astype(jnp.float32)
    out = out.astype(x.dtype).reshape(G, S, E) + res_ref[:]
    o_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("heads", "causal", "group", "interpret")
)
def fused_attention_block(
    x: jax.Array,
    residual: jax.Array,
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    lens: Optional[jax.Array] = None,
    *,
    heads: int,
    causal: bool = False,
    group: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """residual + OutProj(Attn(x)). x/residual: (N, S, E); w*: (E, E);
    b*: (E,); lens: (N,) valid key lengths or None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, S, E = x.shape
    if lens is None:
        lens = jnp.full((N,), S, jnp.int32)
    G = min(group, N)
    pad = (-N) % G
    if pad:
        zpad = jnp.zeros((pad, S, E), x.dtype)
        x = jnp.concatenate([x, zpad], axis=0)
        residual = jnp.concatenate([residual, zpad], axis=0)
        lens = jnp.concatenate([lens, jnp.ones((pad,), jnp.int32)], axis=0)
    lens2d = lens.astype(jnp.int32).reshape(-1, 1)
    grid = (x.shape[0] // G,)
    xspec = pl.BlockSpec((G, S, E), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, causal=causal),
        grid=grid,
        in_specs=[
            xspec, xspec,
            wspec, bspec, wspec, bspec, wspec, bspec, wspec, bspec,
            pl.BlockSpec((G, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(
        x, residual,
        wq, bq.reshape(1, E), wk, bk.reshape(1, E),
        wv, bv.reshape(1, E), wo, bo.reshape(1, E), lens2d,
    )
    if pad:
        out = out[:N]
    return out
