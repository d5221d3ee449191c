"""Shared transformer building blocks (Flax linen).

BERT (post-LayerNorm, exact gelu) and both CLIP towers (pre-LayerNorm,
quick-gelu) share one residual block parameterized by normalization placement
and activation — a single TPU-friendly code path instead of the reference's
two HF model stacks (`transformers` BERT / CLIP used at
``/root/reference/demo.py:125`` and ``/root/reference/clip/clip.py:12``).

All matmuls run in the module compute ``dtype`` (bf16 on TPU) with fp32
softmax/LayerNorm; parameters are stored fp32 and cast on use.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from conzic_tpu.ops.attention import dot_product_attention


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: ``x * sigmoid(1.702 x)`` (HF ``quick_gelu``)."""
    return x * jax.nn.sigmoid(1.702 * x)


def exact_gelu(x: jax.Array) -> jax.Array:
    """Erf-based gelu (HF BERT's ``gelu``)."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "gelu": exact_gelu,
    "quick_gelu": quick_gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}


class _LNParams(nn.Module):
    """Scale/bias holder keeping the ``{"ln": {scale, bias}}`` param layout
    of the previous nn.LayerNorm-based implementation (checkpoint compat)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and compute-dtype in/out.

    On TPU with bf16 activations this dispatches to a fused Pallas kernel
    (one bf16 read + write, fp32 stats in VMEM) — the XLA lowering's
    convert+reduce fusions around LN statistics measured ~30% of hot-loop
    device time. The jnp path mirrors flax nn.LayerNorm numerics
    (fp32-promoted stats, fast variance) and is the reference for parity
    tests."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale, bias = _LNParams(x.shape[-1], name="ln")()
        from conzic_tpu.ops.fused_ln import fused_layer_norm, use_fused_ln

        if use_fused_ln(self.dtype) and x.dtype == jnp.bfloat16:
            return fused_layer_norm(x, scale, bias, eps=self.eps)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class _DGParams(nn.Module):
    """Parameter holder matching nn.DenseGeneral's tree ({kernel, bias}) so
    the fused-block kernel can consume raw weights with unchanged
    checkpoint-conversion naming.

    Init matches DenseGeneral EXACTLY: its kernel_init_wrap draws on the
    flattened (prod(in dims), prod(feature dims)) 2-D shape and reshapes —
    drawing directly on the n-D shape would give a different fan AND a
    different stream, so a proper-init random model would silently differ
    between the quant/pallas_block paths and the standard path
    (tests/test_quant.py::test_quant_param_trees_identical_to_fp)."""

    kernel_shape: tuple
    bias_shape: tuple

    @nn.compact
    def __call__(self):
        n_out = len(self.bias_shape)
        flat_shape = (
            int(np.prod(self.kernel_shape[:-n_out], dtype=np.int64)),
            int(np.prod(self.kernel_shape[-n_out:], dtype=np.int64)),
        )

        def kernel_init(rng, shape, dtype=jnp.float32):
            flat = nn.initializers.lecun_normal()(rng, flat_shape, dtype)
            return jnp.reshape(flat, shape)

        kernel = self.param(
            "kernel", kernel_init, self.kernel_shape, jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, self.bias_shape, jnp.float32
        )
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Standard MHA with bias on all projections (as in BERT and CLIP).

    ``residual`` (when given) is added to the output — standard path adds
    it after the out-projection; ``attn_impl="pallas_block"`` on TPU runs
    the whole block (projections + attention + out-proj + residual) as one
    VMEM-resident Pallas kernel."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"  # "int8": projections through the int8 MXU path

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        residual: Optional[jax.Array] = None,
        prefix_kv: Optional[tuple] = None,
        return_kv: bool = False,
        x_kv: Optional[jax.Array] = None,
    ):
        """``x_kv``: when given, queries come from ``x`` (N, Q, E) while
        keys/values come from ``x_kv`` (N, S, E) — the final-layer
        pooled-rows optimization (only Q output rows are ever consumed)."""
        from conzic_tpu.ops.attention import AttnMask

        H, D = self.num_heads, self.head_dim
        E = H * D
        use_block = (
            self.attn_impl == "pallas_block"
            and residual is not None
            and prefix_kv is None
            and not return_kv
            # the block kernel derives K/V from its single input: a
            # separate x_kv source (pooled-rows final layer) would make
            # the pooled query rows attend only to themselves
            and x_kv is None
            and jax.default_backend() == "tpu"
            # the kernel consumes lens/causal, not raw additive biases
            and (bias is None or isinstance(bias, AttnMask))
        )
        if use_block:
            from conzic_tpu.ops.fused_attn_block import fused_attention_block

            wq, bq = _DGParams((E, H, D), (H, D), name="query")()
            wk, bk = _DGParams((E, H, D), (H, D), name="key")()
            wv, bv = _DGParams((E, H, D), (H, D), name="value")()
            wo, bo = _DGParams((H, D, E), (E,), name="out")()
            mask = bias if isinstance(bias, AttnMask) else AttnMask(bias=bias)
            dt = self.dtype
            return fused_attention_block(
                x.astype(dt), residual.astype(dt),
                wq.reshape(E, E).astype(dt), bq.reshape(E),
                wk.reshape(E, E).astype(dt), bk.reshape(E),
                wv.reshape(E, E).astype(dt), bv.reshape(E),
                wo.reshape(E, E).astype(dt), bo,
                mask.lens,
                heads=H,
                causal=mask.causal,
            )

        kv_src = x if x_kv is None else x_kv
        if self.quant == "int8":
            from conzic_tpu.ops.quant import int8_matmul

            def dense_q(name, inp):
                w, b = _DGParams((E, H, D), (H, D), name=name)()
                y = int8_matmul(inp, w.reshape(E, E)) + b.reshape(E)
                return y.reshape(*inp.shape[:-1], H, D).astype(self.dtype)

            q = dense_q("query", x)
            k = dense_q("key", kv_src)
            v = dense_q("value", kv_src)
        else:
            # NOTE: a concatenated qkv projection (one (E, 3E) matmul +
            # slices) was measured 40% SLOWER end-to-end (1.58 vs 2.69
            # caps/s): the separate projections feed XLA's nested
            # logits/attention mega-fusions, which the packed form breaks.
            dense = lambda name: nn.DenseGeneral(
                features=(H, D), dtype=self.dtype, name=name
            )
            q = dense("query")(x)
            k = dense("key")(kv_src)
            v = dense("value")(kv_src)
        if prefix_kv is not None:
            # shared-prefix attention: x is (B*G, S, E); prefix K/V are
            # (B, P, H, D), shared by the G candidate rows of each image.
            # Broadcast + concat onto the key axis and reuse the standard
            # attention path — one layout throughout (the 5-D grouped
            # einsum formulation measured 30% device time in copies).
            # The caller provides ``bias`` already at full key width
            # (prefix keys unmasked).
            pk, pv = prefix_kv
            B, P = pk.shape[0], pk.shape[1]
            N = q.shape[0]
            G = N // B
            if (
                self.attn_impl == "twoblock"
                and x_kv is None
                and not return_kv
                and self.quant == "none"
            ):
                from conzic_tpu.ops.attention import (
                    two_block_prefix_attention,
                )

                raw = bias.bias if isinstance(bias, AttnMask) else bias
                # shared out-projection/residual tail below applies
                out = two_block_prefix_attention(q, k, v, pk, pv, raw)
            else:
                pk_b = jnp.broadcast_to(
                    pk.astype(k.dtype)[:, None], (B, G, P, H, D)
                ).reshape(N, P, H, D)
                pv_b = jnp.broadcast_to(
                    pv.astype(v.dtype)[:, None], (B, G, P, H, D)
                ).reshape(N, P, H, D)
                k = jnp.concatenate([pk_b, k], axis=1)
                v = jnp.concatenate([pv_b, v], axis=1)
                fusable = (
                    isinstance(bias, AttnMask)
                    and bias.lens is not None
                    and x_kv is None  # kernels assume q = trailing positions
                    and jax.default_backend() == "tpu"
                )
                if (self.attn_impl == "pallas_out" and fusable
                        and not return_kv  # early-returns without (k, v)
                        and self.quant == "none"):
                    # attention + out-projection in ONE kernel: contains the
                    # exp/normalize -> out-proj chain whose lost fusion made
                    # the plain pallas kernel slower end-to-end
                    from conzic_tpu.ops.fused_attention import (
                        fused_attention_with_out,
                    )

                    wo, bo = _DGParams((H, D, E), (E,), name="out")()
                    y = fused_attention_with_out(
                        q, k, v, wo.reshape(E, E).astype(q.dtype), bo,
                        bias.lens, causal=True, group=8,
                    ).astype(self.dtype)
                    if residual is not None:
                        y = y + residual
                    return y
                if self.attn_impl == "pallas" and fusable:
                    from conzic_tpu.ops.fused_attention import (
                        fused_masked_attention,
                    )

                    # group=8 and group=32 measure identically end-to-end
                    # (1.52 caps/s): the kernel cost is not grid dispatch
                    # but the lost exp/normalize->out-projection fusion
                    out = fused_masked_attention(
                        q, k, v, bias.lens, causal=True, group=8
                    )
                else:
                    raw_bias = (
                        bias.bias if isinstance(bias, AttnMask) else bias
                    )
                    impl = (
                        "xla_bhsd" if self.attn_impl == "xla_bhsd" else "xla"
                    )
                    out = dot_product_attention(
                        q, k, v, bias=raw_bias, impl=impl
                    )
        else:
            impl = self.attn_impl if self.attn_impl != "pallas_block" else "xla"
            if isinstance(bias, AttnMask):
                out = dot_product_attention(q, k, v, mask=bias, impl=impl)
            else:
                out = dot_product_attention(q, k, v, bias=bias, impl=impl)
        if self.quant == "int8":
            from conzic_tpu.ops.quant import int8_matmul

            wo, bo = _DGParams((H, D, E), (E,), name="out")()
            out = (
                int8_matmul(out.reshape(*out.shape[:-2], E), wo.reshape(E, E))
                + bo
            ).astype(self.dtype)
        else:
            out = nn.DenseGeneral(
                features=E, axis=(-2, -1), dtype=self.dtype, name="out"
            )(out)
        if residual is not None:
            out = out + residual
        if return_kv:
            return out, (k, v)
        return out


class Mlp(nn.Module):
    intermediate_size: int
    hidden_size: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.quant == "int8":
            from conzic_tpu.ops.quant import int8_matmul

            w1, b1 = _DGParams(
                (x.shape[-1], self.intermediate_size),
                (self.intermediate_size,), name="fc1",
            )()
            h = ACTIVATIONS[self.act](
                (int8_matmul(x, w1) + b1).astype(self.dtype)
            )
            w2, b2 = _DGParams(
                (self.intermediate_size, self.hidden_size),
                (self.hidden_size,), name="fc2",
            )()
            return (int8_matmul(h, w2) + b2).astype(self.dtype)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = ACTIVATIONS[self.act](h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)


class TransformerBlock(nn.Module):
    """One residual attention block.

    ``pre_ln=False`` -> BERT ordering:  x = LN(x + Attn(x)); x = LN(x + MLP(x))
    ``pre_ln=True``  -> CLIP ordering:  x = x + Attn(LN(x)); x = x + MLP(LN(x))
    """

    num_heads: int
    head_dim: int
    intermediate_size: int
    act: str
    eps: float
    pre_ln: bool
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"
    as_scan_body: bool = False  # return (x, None) for nn.scan

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        prefix_kv: Optional[tuple] = None,
        return_kv: bool = False,
        query_idx: Optional[jax.Array] = None,
    ):
        """``query_idx`` (N, Q): compute this block's output ONLY at those
        positions (keys/values still span all positions) — valid when every
        downstream consumer reads just those rows, i.e. the final layer
        before pooled/masked-slot readout. Returns (N, Q, E)."""
        hidden = self.num_heads * self.head_dim
        attn = MultiHeadAttention(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="attention",
        )
        mlp = Mlp(
            intermediate_size=self.intermediate_size,
            hidden_size=hidden,
            act=self.act,
            dtype=self.dtype,
            quant=self.quant,
            name="mlp",
        )
        ln1 = LayerNorm(eps=self.eps, dtype=self.dtype, name="ln1")
        ln2 = LayerNorm(eps=self.eps, dtype=self.dtype, name="ln2")

        if query_idx is not None:
            assert not return_kv
            from conzic_tpu.ops.attention import AttnMask

            raw_bias = bias.bias if isinstance(bias, AttnMask) else bias
            if raw_bias is not None:
                # (N or 1, 1, S, Sk) -> rows at query_idx -> (N, 1, Q, Sk)
                if raw_bias.shape[0] == 1 and query_idx.shape[0] != 1:
                    raw_bias = jnp.broadcast_to(
                        raw_bias,
                        (query_idx.shape[0], *raw_bias.shape[1:]),
                    )
                raw_bias = jnp.take_along_axis(
                    raw_bias, query_idx[:, None, :, None], axis=2
                )
            take = lambda a: jnp.take_along_axis(
                a, query_idx[:, :, None], axis=1
            )
            if self.pre_ln:
                xn = ln1(x)
                xq = attn(take(xn), raw_bias, residual=take(x),
                          prefix_kv=prefix_kv, x_kv=xn)
                return xq + mlp(ln2(xq))
            xq = attn(take(x), raw_bias, residual=take(x),
                      prefix_kv=prefix_kv, x_kv=x)
            xq = ln1(xq)
            return ln2(xq + mlp(xq))

        kv = None
        if self.pre_ln:
            a = attn(ln1(x), bias, residual=x,
                     prefix_kv=prefix_kv, return_kv=return_kv)
            x = a[0] if return_kv else a
            kv = a[1] if return_kv else None
            x = x + mlp(ln2(x))
        else:
            a = attn(x, bias, residual=x,
                     prefix_kv=prefix_kv, return_kv=return_kv)
            x = a[0] if return_kv else a
            kv = a[1] if return_kv else None
            x = ln1(x)
            x = ln2(x + mlp(x))
        if self.as_scan_body:
            return x, None
        if return_kv:
            return x, kv
        return x


class TransformerStack(nn.Module):
    """N identical blocks.

    ``scan_layers=False``: layers materialized individually with per-layer
    naming (``layer_i``) — trivial HF checkpoint conversion.
    ``scan_layers=True``: one ``nn.scan`` over a stacked ``layers`` scope —
    the XLA program contains ONE layer body instead of N, cutting cold
    compile time for full-size towers severalfold. Parameters are stacked
    along axis 0 (``convert.stack_layers`` re-packs per-layer trees).
    """

    num_layers: int
    num_heads: int
    head_dim: int
    intermediate_size: int
    act: str
    eps: float
    pre_ln: bool
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: str = "none"
    scan_layers: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: Optional[jax.Array] = None,
        prefix_kvs: Optional[list] = None,
        return_kvs: bool = False,
        pool_idx: Optional[jax.Array] = None,
    ):
        """``pool_idx`` (N, Q): the stack's output is only consumed at these
        positions (pooled/masked-slot readout) — the final layer computes
        just those rows. Output becomes (N, Q, E)."""
        kw = dict(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            intermediate_size=self.intermediate_size,
            act=self.act,
            eps=self.eps,
            pre_ln=self.pre_ln,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
        )
        if self.scan_layers:
            assert prefix_kvs is None and not return_kvs and pool_idx is None, (
                "prefix-KV reuse / pooled readout require scan_layers=False"
            )
            scanned = nn.scan(
                TransformerBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.num_layers,
            )
            x, _ = scanned(as_scan_body=True, name="layers", **kw)(x, bias)
            return x
        kvs = []
        for i in range(self.num_layers):
            block = TransformerBlock(name=f"layer_{i}", **kw)
            pkv = prefix_kvs[i] if prefix_kvs is not None else None
            if return_kvs:
                x, kv = block(x, bias, prefix_kv=pkv, return_kv=True)
                kvs.append(kv)
            elif pool_idx is not None and i == self.num_layers - 1:
                x = block(x, bias, prefix_kv=pkv, query_idx=pool_idx)
            else:
                x = block(x, bias, prefix_kv=pkv)
        if return_kvs:
            return x, kvs
        return x
