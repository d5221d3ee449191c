"""Fused Pallas attention == XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conzic_tpu.ops.attention import dot_product_attention, make_attention_bias
from conzic_tpu.ops.fused_attention import fused_masked_attention


@pytest.mark.parametrize("causal", [True, False])
def test_fused_attention_matches_xla(causal):
    rng = np.random.RandomState(0)
    N, S, H, D = 7, 12, 4, 16
    q, k, v = (jnp.asarray(rng.randn(N, S, H, D).astype(np.float32))
               for _ in range(3))
    lens = np.array([12, 5, 8, 1, 12, 3, 10], np.int32)
    pad_mask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
    bias = make_attention_bias(jnp.asarray(pad_mask), S, causal=causal)
    ref = dot_product_attention(q, k, v, bias=bias, impl="xla")
    got = fused_masked_attention(q, k, v, jnp.asarray(lens), causal=causal,
                                 group=4, interpret=True)
    # rows beyond a query's own length attend to garbage in both paths only
    # insofar as padding queries are unused downstream; compare valid rows
    for n in range(N):
        np.testing.assert_allclose(
            np.asarray(got[n, : lens[n]]), np.asarray(ref[n, : lens[n]]),
            rtol=2e-5, atol=2e-5,
        )


def test_fused_attention_no_lens():
    rng = np.random.RandomState(1)
    N, S, H, D = 4, 8, 2, 8
    q, k, v = (jnp.asarray(rng.randn(N, S, H, D).astype(np.float32))
               for _ in range(3))
    ref = dot_product_attention(
        q, k, v, bias=make_attention_bias(None, S, causal=True), impl="xla"
    )
    got = fused_masked_attention(q, k, v, None, causal=True, group=2,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_block_matches_composition():
    """projections + attention + out-proj + residual fused == composed ops
    (interpret mode)."""
    from conzic_tpu.ops.fused_attn_block import fused_attention_block

    rng = np.random.RandomState(2)
    N, S, H, D = 5, 10, 4, 16
    E = H * D
    x = jnp.asarray(rng.randn(N, S, E).astype(np.float32))
    res = jnp.asarray(rng.randn(N, S, E).astype(np.float32))
    ws = {n: jnp.asarray(rng.randn(E, E).astype(np.float32) * 0.05)
          for n in "qkvo"}
    bs = {n: jnp.asarray(rng.randn(E).astype(np.float32) * 0.1)
          for n in "qkvo"}
    lens = np.array([10, 4, 7, 1, 9], np.int32)

    got = fused_attention_block(
        x, res, ws["q"], bs["q"], ws["k"], bs["k"], ws["v"], bs["v"],
        ws["o"], bs["o"], jnp.asarray(lens), heads=H, causal=True,
        group=4, interpret=True,
    )

    def proj(w, b):
        return (x.reshape(-1, E) @ w + b).reshape(N, S, H, D)

    q, k, v = proj(ws["q"], bs["q"]), proj(ws["k"], bs["k"]), proj(ws["v"], bs["v"])
    pad_mask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
    bias = make_attention_bias(jnp.asarray(pad_mask), S, causal=True)
    ctx = dot_product_attention(q, k, v, bias=bias, impl="xla")
    ref = (ctx.reshape(N * S, E) @ ws["o"] + bs["o"]).reshape(N, S, E) + res
    for n in range(N):
        np.testing.assert_allclose(
            np.asarray(got[n, : lens[n]]), np.asarray(ref[n, : lens[n]]),
            rtol=2e-4, atol=2e-4,
        )


def test_fused_attention_rectangular_matches_xla():
    """Rectangular (shared-prefix suffix) attention: q over Sq suffix
    positions, k/v over Sk = P + Sq keys, causal offset P, key-padding
    lens — must equal the XLA bias formulation."""
    import jax.numpy as jnp
    import numpy as np

    from conzic_tpu.ops.attention import (
        dot_product_attention,
        make_attention_bias,
    )
    from conzic_tpu.ops.fused_attention import fused_masked_attention

    rng = np.random.RandomState(0)
    N, Sq, P, H, D = 6, 5, 3, 2, 8
    Sk = P + Sq
    q = jnp.asarray(rng.randn(N, Sq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(N, Sk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(N, Sk, H, D).astype(np.float32))
    suffix_valid = rng.randint(1, Sq + 1, size=(N,))
    suffix_mask = (np.arange(Sq)[None, :] < suffix_valid[:, None]).astype(
        np.int32
    )
    lens = jnp.asarray(P + suffix_valid, jnp.int32)

    bias_suf = make_attention_bias(jnp.asarray(suffix_mask), Sq, causal=True)
    bias = jnp.concatenate(
        [jnp.zeros((*bias_suf.shape[:-1], P), jnp.float32), bias_suf], axis=-1
    )
    ref = dot_product_attention(q, k, v, bias=bias)
    got = fused_masked_attention(q, k, v, lens, causal=True, group=4,
                                 interpret=True)
    # only rows attending valid keys matter (padded queries feed nothing)
    for n in range(N):
        np.testing.assert_allclose(
            np.asarray(got)[n, : suffix_valid[n]],
            np.asarray(ref)[n, : suffix_valid[n]],
            rtol=1e-5, atol=1e-5,
        )


def test_fused_attention_with_out_matches_composition():
    """attention + out-projection kernel == separate attention then
    projection (interpret mode)."""
    import jax.numpy as jnp
    import numpy as np

    from conzic_tpu.ops.attention import (
        dot_product_attention,
        make_attention_bias,
    )
    from conzic_tpu.ops.fused_attention import fused_attention_with_out

    rng = np.random.RandomState(0)
    N, Sq, P, H, D = 6, 5, 3, 2, 8
    Sk, E = P + Sq, H * 8
    q = jnp.asarray(rng.randn(N, Sq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(N, Sk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(N, Sk, H, D).astype(np.float32))
    wo = jnp.asarray((rng.randn(E, E) * 0.1).astype(np.float32))
    bo = jnp.asarray(rng.randn(E).astype(np.float32))
    suffix_valid = rng.randint(1, Sq + 1, size=(N,))
    suffix_mask = (np.arange(Sq)[None, :] < suffix_valid[:, None]).astype(
        np.int32
    )
    lens = jnp.asarray(P + suffix_valid, jnp.int32)

    bias_suf = make_attention_bias(jnp.asarray(suffix_mask), Sq, causal=True)
    bias = jnp.concatenate(
        [jnp.zeros((*bias_suf.shape[:-1], P), jnp.float32), bias_suf], axis=-1
    )
    attn = dot_product_attention(q, k, v, bias=bias)
    ref = attn.reshape(N, Sq, E) @ wo + bo
    got = fused_attention_with_out(q, k, v, wo, bo, lens, causal=True,
                                   group=3, interpret=True)
    for n in range(N):
        np.testing.assert_allclose(
            np.asarray(got)[n, : suffix_valid[n]],
            np.asarray(ref)[n, : suffix_valid[n]],
            rtol=1e-4, atol=1e-4,
        )
