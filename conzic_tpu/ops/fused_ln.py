"""Fused LayerNorm (Pallas TPU kernel).

Trace analysis (tools/profile_engine.py) shows LayerNorm statistics
(convert+reduce fusions) at ~30% of device time in the Gibbs hot loop: XLA
materializes fp32 conversions around the mean/variance reductions over the
(B*k, S, hidden) activations. This kernel does one bf16 read + one bf16
write per row with fp32 statistics computed in VMEM.

Used by models.layers.LayerNorm on TPU for bf16 activations; the jnp path
remains the reference implementation (flax-equivalent numerics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ROW_BLOCK = 256


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (R, F)
    mean = jnp.mean(x, axis=1, keepdims=True)
    mean2 = jnp.mean(x * x, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-5, interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis. x: (..., F); scale/bias: (F,).

    Differentiable: a custom VJP supplies the standard LN backward in
    plain jnp (XLA fuses it fine for training steps — the kernel's value
    is the inference hot loop), since pallas_call itself has no autodiff
    rule. tools/train_tiny.py trains through this path on TPU."""
    return _fused_ln_diff(x, scale, bias, eps, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln_diff(x, scale, bias, eps, interpret):
    return _fused_ln_forward(x, scale, bias, eps, interpret)


def _fused_ln_fwd(x, scale, bias, eps, interpret):
    return _fused_ln_forward(x, scale, bias, eps, interpret), (x, scale)


def _fused_ln_bwd(eps, interpret, res, dy):
    x, scale = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * r
    dyg = dyf * scale.astype(jnp.float32)
    dx = r * (dyg - jnp.mean(dyg, axis=-1, keepdims=True)
              - xhat * jnp.mean(dyg * xhat, axis=-1, keepdims=True))
    reduce_axes = tuple(range(dy.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=reduce_axes)
    dbias = jnp.sum(dyf, axis=reduce_axes)
    return dx.astype(x.dtype), dscale, dbias


_fused_ln_diff.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def _fused_ln_forward(x: jax.Array, scale: jax.Array, bias: jax.Array,
                      eps: float, interpret: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    F = orig_shape[-1]
    flat = x.reshape(-1, F)
    N = flat.shape[0]
    pad = (-N) % ROW_BLOCK
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, F), flat.dtype)], axis=0
        )
    grid = (flat.shape[0] // ROW_BLOCK,)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        interpret=interpret,
    )(flat, scale.reshape(1, F), bias.reshape(1, F))
    if pad:
        out = out[:N]
    return out.reshape(orig_shape)


def use_fused_ln(dtype) -> bool:
    return jax.default_backend() == "tpu" and dtype == jnp.bfloat16
