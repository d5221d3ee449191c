"""Opt-in int8 candidate-scoring tier (ops/quant.py).

Non-parity speed tier like prune_k: quantization error must stay small
enough that generations remain close to the full-precision run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine.sampler import Captioner
from conzic_tpu.ops.quant import int8_matmul


def test_int8_matmul_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    w = jnp.asarray((rng.randn(128, 256) * 0.05).astype(np.float32))
    ref = x @ w
    got = int8_matmul(x, w)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_generation_close_to_full():
    runs = {}
    for quant in ("none", "int8"):
        cap = Captioner.from_random(
            config=ConzicConfig(dtype="float32", quant=quant),
            init_mode="proper", seed=5,
        )
        rng = np.random.RandomState(1)
        embeds = jnp.asarray(
            rng.randn(2, cap.clip_model.config.projection_dim).astype(
                np.float32
            )
        )
        runs[quant] = cap.run(
            embeds, prompt="Image of a", max_len=4, top_k=8,
            temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
            order="sequential", rng=np.random.RandomState(3),
        )
    delta = np.abs(runs["none"].best_cos - runs["int8"].best_cos)
    assert float(delta.max()) < 0.05, delta
    # committed ids mostly agree on well-separated tiny models
    agree = (runs["none"].iter_ids[-1] == runs["int8"].iter_ids[-1]).mean()
    assert agree > 0.7, agree
