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


def test_int8_generation_runs_and_is_actually_quantized():
    """Mechanism test at tiny-model scale. Tiny random towers have no
    weight-scale structure, so per-tensor int8 noise legitimately flips
    argmax decisions and the trajectories diverge — quantization QUALITY
    is bounded at full scale by tools/validate_quant.py, not here. What
    this pins:
      - the int8 engine runs end-to-end and commits in-vocab tokens;
      - the int8 program genuinely differs from full precision (the
        wiring guard: quant='int8' once silently built the identical
        fp program, making every int8 measurement vacuous);
      - cosines stay in a sane range (not NaN/garbage)."""
    runs = {}
    for quant in ("none", "int8", "int8_all"):
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
        V = cap.wp.vocab_size
        sent = runs[quant].iter_ids[-1][0][cap.seed_len("Image of a"):-1]
        assert all(0 <= t < V for t in sent.tolist()), quant
    for quant in ("int8", "int8_all"):
        assert np.all(np.isfinite(runs[quant].best_cos)), quant
        assert np.all(np.abs(runs[quant].best_cos) <= 1.0 + 1e-5), quant
    # the wiring guards: each tier must CHANGE the computation (tiny-model
    # noise guarantees a visible difference somewhere in the trajectory).
    # quant='int8' once silently built the identical fp program; int8_all
    # must additionally differ from int8 (the BERT encoder quantization
    # changes the PROPOSED candidates, not just their scores)
    for a, b in (("none", "int8"), ("int8", "int8_all")):
        assert not np.array_equal(
            np.asarray(runs[a].clip_score_sequence),
            np.asarray(runs[b].clip_score_sequence),
        ), (a, b)


def test_tower_quants_mapping():
    from conzic_tpu.engine.sampler import tower_quants

    assert tower_quants("none") == ("none", "none")
    assert tower_quants("int8") == ("none", "int8")
    assert tower_quants("int8_all") == ("int8", "int8")
