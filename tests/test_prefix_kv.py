"""Exact prefix-KV reuse and candidate-row chunking equivalence.

Both are pure FLOP/regime optimizations (engine/gibbs.py
``_encode_candidates``): the prefix split encodes the candidates' shared
CLIP prefix once at batch width, row chunking scans oversized candidate
batches — neither may change what the engine generates vs the plain
full-row encode the reference semantics prescribe
(/root/reference/gen_utils.py:76 + clip/clip.py:78-84).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine.sampler import Captioner
from conzic_tpu.models.clip import CLIPModel
from conzic_tpu.models.configs import CLIPConfig


def _make_captioner(**cfg_kw):
    cfg = ConzicConfig(dtype="float32", **cfg_kw)
    return Captioner.from_random(config=cfg, init_mode="proper", seed=3)


def _generate(cap, order="sequential", **kw):
    rng = np.random.RandomState(7)
    image_embeds = jnp.asarray(
        np.random.RandomState(1)
        .randn(2, cap.clip_model.config.projection_dim)
        .astype(np.float32)
    )
    return cap.run(
        image_embeds,
        prompt="Image of a",
        max_len=5,
        top_k=12,
        temperature=0.1,
        max_iter=2,
        alpha=0.02,
        beta=2.0,
        order=order,
        rng=rng,
        **kw,
    )


@pytest.mark.parametrize("order", ["sequential", "shuffle", "span"])
def test_prefix_kv_matches_full_encode(order):
    base = _generate(_make_captioner(kv_chunk_size=0), order=order)
    pref = _generate(_make_captioner(kv_chunk_size=2), order=order)
    assert base.gen_texts_list == pref.gen_texts_list
    np.testing.assert_array_equal(base.iter_ids, pref.iter_ids)
    np.testing.assert_allclose(
        base.best_cos, pref.best_cos, rtol=0, atol=5e-6
    )


def test_prefix_kv_matches_full_encode_under_int8():
    """The prefix-KV equivalence must survive quantization: activation
    scales are per TOKEN VECTOR (ops/quant._quantize_rows, amax over the
    feature axis), so identical prefix tokens quantize identically
    whether encoded once at batch width or per candidate row."""
    base = _generate(_make_captioner(kv_chunk_size=0, quant="int8"))
    pref = _generate(_make_captioner(kv_chunk_size=2, quant="int8"))
    assert base.gen_texts_list == pref.gen_texts_list
    np.testing.assert_array_equal(base.iter_ids, pref.iter_ids)
    np.testing.assert_allclose(
        base.best_cos, pref.best_cos, rtol=0, atol=5e-6
    )


def test_prefix_chunks_static_shape():
    """Sequential chunks cover all steps with nondecreasing prefix bounds
    starting at 1 + prompt pieces."""
    cap = _make_captioner(kv_chunk_size=2)
    init_row = cap.init_ids("Image of a", 5, 1)
    seed_len = init_row.shape[1] - 5 - 1
    chunks = cap._prefix_chunks("sequential", "single", init_row, seed_len, 5)
    assert sum(n for _, n in chunks) == 5
    bounds = [p for p, _ in chunks]
    assert bounds == sorted(bounds)
    lens = np.asarray(cap.bridge.lens)
    assert bounds[0] == 1 + int(lens[init_row[0][1:seed_len]].sum())
    # non-sequential orders: one chunk at the prompt-only bound
    chunks_sh = cap._prefix_chunks("shuffle", "single", init_row, seed_len, 5)
    assert chunks_sh == ((bounds[0], 5),)


def test_row_chunking_matches_unchunked():
    base = _generate(_make_captioner(kv_chunk_size=0, clip_row_chunk=0))
    # k=12, B=2 -> 24 rows; chunk to 8 rows (kc=4, 3 chunks)
    chunk = _generate(_make_captioner(kv_chunk_size=0, clip_row_chunk=8))
    assert base.gen_texts_list == chunk.gen_texts_list
    np.testing.assert_array_equal(base.iter_ids, chunk.iter_ids)


def test_shared_prefix_encode_matches_full():
    """Model-level equivalence on rows with a shared prefix and ragged EOS
    positions."""
    cfg = CLIPConfig.tiny()
    model = CLIPModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    B, G, L, P = 2, 3, 12, 5
    eos = cfg.text.eos_token_id
    rng = np.random.RandomState(0)
    ids = rng.randint(1, min(cfg.text.vocab_size, 50), size=(B, G, L)).astype(
        np.int32
    )
    ids[:, :, :P] = ids[:, :1, :P]
    mask = np.zeros((B, G, L), np.int32)
    for b in range(B):
        for g in range(G):
            e = P + 2 + (b + g) % (L - P - 2)
            ids[b, g, e] = eos
            ids[b, g, e + 1 :] = 0
            mask[b, g, : e + 1] = 1
    full = model.apply(
        {"params": params},
        jnp.asarray(ids.reshape(B * G, L)),
        jnp.asarray(mask.reshape(B * G, L)),
        method=CLIPModel.encode_text,
    )
    pref = model.apply(
        {"params": params},
        jnp.asarray(ids[:, 0, :P]),
        jnp.asarray(ids[:, :, P:]),
        jnp.asarray(mask[:, :, P:]),
        method=CLIPModel.encode_text_shared_prefix,
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(pref), rtol=0, atol=1e-5
    )


def test_twoblock_prefix_attention_matches_concat_path():
    """attn_impl="twoblock" computes shared-prefix attention without the
    broadcast+concat K/V materialization (ops/attention.py
    two_block_prefix_attention). Same dots, same softmax — generations
    must match the standard path."""
    base = _generate(_make_captioner(kv_chunk_size=16))
    two = _generate(_make_captioner(kv_chunk_size=16, attn_impl="twoblock"))
    assert base.gen_texts_list == two.gen_texts_list
    np.testing.assert_array_equal(base.iter_ids, two.iter_ids)
    np.testing.assert_allclose(base.best_cos, two.best_cos, rtol=0, atol=5e-6)


def test_long_context_token_budget_rule():
    """clip_len > 48 caps the scoring row chunk to ~clip_token_budget
    tokens per pass (sampler._spec); the cap is off at short contexts,
    configurable, and disabled by budget=0."""
    cap = _make_captioner(clip_row_chunk=800, clip_token_budget=16000)
    init_row = cap.init_ids("Image of a", 5, 1)
    seed_len = init_row.shape[1] - 5 - 1

    def chunk_at(clip_len, budget):
        cap.cfg.clip_len = clip_len
        cap.cfg.clip_token_budget = budget
        return cap._spec(seed_len, 5, 12, "single", None, False).clip_row_chunk

    assert chunk_at(32, 16000) == 800          # short context: no cap
    assert chunk_at(77, 16000) == 16000 // 77  # long context: capped
    assert chunk_at(77, 4000) == 4000 // 77
    assert chunk_at(77, 0) == 800              # budget disabled
