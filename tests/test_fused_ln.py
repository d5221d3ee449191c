"""Fused Pallas LayerNorm == jnp reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from conzic_tpu.ops.fused_ln import fused_layer_norm


def test_fused_ln_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(300, 7, 64).astype(np.float32) * 3 + 1
    scale = rng.rand(64).astype(np.float32) + 0.5
    bias = rng.randn(64).astype(np.float32)
    eps = 1e-5
    got = np.asarray(
        fused_layer_norm(jnp.asarray(x), jnp.asarray(scale),
                         jnp.asarray(bias), eps=eps, interpret=True)
    )
    xf = x.astype(np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mean * mean
    ref = ((xf - mean) / np.sqrt(var + eps)) * scale + bias
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_fused_ln_bf16_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(40, 32).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    out = fused_layer_norm(x, scale, bias, eps=1e-5, interpret=True)
    assert out.dtype == jnp.bfloat16
    f = np.asarray(out.astype(jnp.float32))
    assert abs(f.mean()) < 0.05 and abs(f.std() - 1) < 0.1
