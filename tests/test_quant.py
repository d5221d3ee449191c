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
    # the trajectory-level wiring guard: quant='int8' once silently built
    # the identical fp program, making every int8 measurement vacuous
    # (tiny-model noise guarantees a visible difference somewhere)
    assert not np.array_equal(
        np.asarray(runs["none"].clip_score_sequence),
        np.asarray(runs["int8"].clip_score_sequence),
    )


def test_quant_tiers_change_the_right_towers():
    """Structural wiring guard per tower (trajectory equality is
    luck-dependent at tiny scale — the committed argmax can survive
    quantization noise): int8 must change the CLIP text embeddings and
    leave BERT untouched; int8_all must change BERT too."""
    caps = {
        quant: Captioner.from_random(
            config=ConzicConfig(dtype="float32", quant=quant),
            init_mode="proper", seed=5,
        )
        for quant in ("none", "int8", "int8_all")
    }
    ids = jnp.asarray(np.arange(8, dtype=np.int32)[None, :] + 3)

    def bert_logits(cap):
        return np.asarray(
            cap.bert_model.apply({"params": cap.params["bert"]}, ids)
        )

    def clip_text(cap):
        from conzic_tpu.models.clip import CLIPModel

        return np.asarray(cap.clip_model.apply(
            {"params": cap.params["clip"]}, ids,
            method=CLIPModel.encode_text,
        ))

    # identical weights (test_quant_param_trees_identical_to_fp), so any
    # output difference is the quantized compute path
    assert not np.array_equal(clip_text(caps["none"]), clip_text(caps["int8"]))
    np.testing.assert_array_equal(
        bert_logits(caps["none"]), bert_logits(caps["int8"])
    )
    assert not np.array_equal(
        bert_logits(caps["none"]), bert_logits(caps["int8_all"])
    )
    assert not np.array_equal(
        clip_text(caps["none"]), clip_text(caps["int8_all"])
    )


def test_tower_quants_mapping():
    from conzic_tpu.engine.sampler import tower_quants

    assert tower_quants("none") == ("none", "none")
    assert tower_quants("int8") == ("none", "int8")
    assert tower_quants("int8_all") == ("int8", "int8")
    # bench.py MUTATES cfg.quant from an env knob, bypassing config
    # validation — a typo'd tier must raise, not silently bench the fp
    # program under a quant label
    with pytest.raises(ValueError, match="unknown quant tier"):
        tower_quants("int8all")


def test_quant_param_trees_identical_to_fp():
    """Quantization happens INSIDE the program (ops/quant.py): the param
    tree must be byte-identical across tiers — that is what makes fp
    checkpoints load unchanged into a quantized captioner and lets the
    quality tools compare same-weights captioners."""
    trees = {}
    for quant in ("none", "int8_all"):
        cap = Captioner.from_random(
            config=ConzicConfig(dtype="float32", quant=quant),
            init_mode="proper", seed=5,
        )
        trees[quant] = jax.tree_util.tree_map(np.asarray, cap.params)
    flat_fp, treedef_fp = jax.tree_util.tree_flatten(trees["none"])
    flat_q, treedef_q = jax.tree_util.tree_flatten(trees["int8_all"])
    assert treedef_fp == treedef_q
    for a, b in zip(flat_fp, flat_q):
        np.testing.assert_array_equal(a, b)
