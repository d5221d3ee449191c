"""In-loop exact control energies (``--ctl_mode exact``).

The reference tags every candidate SENTENCE inside the loop
(sentiments_classifer.py:14-32, POS_classifier.py:6-31 — context-sensitive,
operating on the decoded words). ``ctl_mode="exact"`` reproduces that as a
host callback; these tests pin it against naive host loops implementing the
reference semantics directly, pin the host-stepped fallback (axon) against
the callback engine, and pin the table-mode divergence mechanism
(per-token scores vs decoded-sentence scores).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine.sampler import Captioner
from conzic_tpu.eval.pos_eval import batch_texts_pos_analysis
from conzic_tpu.eval.sentiment_eval import batch_texts_sentiment_scores
from conzic_tpu.models.clip import CLIPModel


@pytest.fixture(scope="module")
def cap_exact(tmp_path_factory):
    d = tmp_path_factory.mktemp("ctl_exact")
    cap = Captioner.from_random(
        config=ConzicConfig(dtype="float32", ctl_mode="exact"),
        tmpdir=str(d), init_mode="proper",
    )
    cap.cfg.verbose = False
    return cap


def _naive_exact_ctl_sequential(cap, image_embeds, prompt, max_len, top_k,
                                temperature, max_iters, alpha, beta, gamma,
                                ctl, negative=False, template=None):
    """Reference loop with SENTENCE-LEVEL control scoring on the decoded
    candidates (control_gen_utils.py:50-59 / :170-173 semantics)."""
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = cap.params
    tables = jax.tree.map(np.asarray, cap.tables)
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, image_embeds.shape[0])
    B = ids.shape[0]
    texts_per_iter, ctls_per_iter = [], []
    for _ in range(max_iters):
        ctl_sel = np.zeros((B,), np.float32)
        for pos in range(max_len):
            mask = tables["mask_last"] if pos == max_len - 1 else tables["mask_mid"]
            ids[:, seed_len + pos] = wp.mask_token_id
            logits = np.asarray(
                bert.apply({"params": params["bert"]}, jnp.asarray(ids))
            )[:, seed_len + pos]
            probs = np.asarray(
                jax.nn.softmax(jnp.asarray(logits / temperature), -1)
            ) * mask
            idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
            top_probs = np.take_along_axis(probs, idxs, axis=1)
            idxs = (idxs * mask[idxs]).astype(np.int64)
            cand_rows = np.repeat(ids[:, None, :], top_k, axis=1)
            for b in range(B):
                cand_rows[b, :, seed_len + pos] = idxs[b]
            texts = wp.batch_decode(cand_rows.reshape(-1, ids.shape[1]),
                                    skip_special_tokens=True)
            # sentence-level control term (the exact-mode semantics)
            if ctl == "sentiment":
                s = np.asarray(
                    batch_texts_sentiment_scores(texts, negative=negative),
                    np.float32,
                ).reshape(B, top_k)
                e = np.exp(s - s.max(axis=1, keepdims=True))
                ctl_probs = e / e.sum(axis=1, keepdims=True)
                repeats = (cand_rows == idxs[:, :, None]).sum(2) - 1
                extra = 0.1 * (1 - np.exp(repeats))
            else:
                _, s = batch_texts_pos_analysis(texts, template)
                s = np.asarray(s, np.float32).reshape(B, top_k)
                sc = s / 0.1
                e = np.exp(sc - sc.max(axis=1, keepdims=True))
                ctl_probs = e / e.sum(axis=1, keepdims=True)
                extra = 0.0
            clip_ids, clip_mask = bpe.batch_encode(
                texts, max_length=cap.cfg.clip_len, pad_to_max=True)
            te = clip.apply({"params": params["clip"]}, jnp.asarray(clip_ids),
                            jnp.asarray(clip_mask),
                            method=CLIPModel.encode_text)
            cp, cos = clip.apply({"params": params["clip"]},
                                 jnp.asarray(image_embeds), te,
                                 method=CLIPModel.similarity)
            final = (alpha * top_probs + beta * np.asarray(cp)
                     + gamma * ctl_probs + extra)
            sel = np.argmax(final, axis=1)
            for b in range(B):
                ids[b, seed_len + pos] = idxs[b, sel[b]]
                ctl_sel[b] = s[b, sel[b]]
        texts_per_iter.append(wp.batch_decode(ids, skip_special_tokens=True))
        ctls_per_iter.append(ctl_sel.copy())
    return texts_per_iter, ctls_per_iter


@pytest.mark.parametrize("negative", [False, True])
def test_ctl_exact_sentiment_matches_naive_sentence_loop(cap_exact, negative):
    """Engine with ctl_mode='exact' == naive reference loop with
    sentence-level sentiment scoring, byte for byte. The table bridge is
    kept (default), isolating the control-mode change."""
    cap = cap_exact
    rng = np.random.RandomState(21)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=4, top_k=8, temperature=0.1,
                  max_iters=2, alpha=0.02, beta=2.0, gamma=5.0)
    ref_texts, ref_ctls = _naive_exact_ctl_sequential(
        cap, np.asarray(image_embeds), ctl="sentiment", negative=negative,
        **kwargs)
    result = cap.run(
        image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
        top_k=kwargs["top_k"], temperature=kwargs["temperature"],
        max_iter=kwargs["max_iters"], alpha=kwargs["alpha"],
        beta=kwargs["beta"], gamma=kwargs["gamma"],
        order="sequential", ctl="sentiment", negative=negative,
    )
    assert result.gen_texts_list[:-1] == ref_texts
    np.testing.assert_allclose(
        result.iter_ctl, np.asarray(ref_ctls), rtol=0, atol=1e-6
    )


def test_ctl_exact_pos_matches_naive_sentence_loop(cap_exact):
    """Engine with ctl_mode='exact' == naive loop with sentence-level POS
    template accuracy (universal tags of the decoded words)."""
    cap = cap_exact
    template = [["DET"], ["NOUN"], ["NOUN", "VERB"], [""], ["NOUN"],
                ["NOUN"], ["."]]
    rng = np.random.RandomState(23)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=4, top_k=8, temperature=0.1,
                  max_iters=2, alpha=0.02, beta=2.0, gamma=5.0)
    ref_texts, ref_ctls = _naive_exact_ctl_sequential(
        cap, np.asarray(image_embeds), ctl="pos", template=template, **kwargs)
    result = cap.run(
        image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
        top_k=kwargs["top_k"], temperature=kwargs["temperature"],
        max_iter=kwargs["max_iters"], alpha=kwargs["alpha"],
        beta=kwargs["beta"], gamma=kwargs["gamma"],
        order="sequential", ctl="pos", pos_template=template,
    )
    assert result.gen_texts_list[:-1] == ref_texts
    np.testing.assert_allclose(
        result.iter_ctl, np.asarray(ref_ctls), rtol=0, atol=1e-6
    )


@pytest.mark.parametrize("draw,ctl", [(0, "sentiment"), (1, "pos")])
def test_ctl_exact_fuzzed_hypers_match_naive_loop(cap_exact, draw, ctl):
    """Seeded hyper fuzz of the controlled byte-parity oracle (random
    len/k/T/alpha/beta/gamma draws). Runs with bridge_mode='exact' too, so
    '##'-continuation commits — which random hypers routinely produce —
    stay byte-comparable to the naive decode -> re-tokenize loop."""
    cap = cap_exact
    hr = np.random.RandomState(300 + draw)
    kwargs = dict(
        prompt="Image of a",
        max_len=int(hr.randint(3, 6)),
        top_k=int(hr.randint(4, 10)),
        temperature=float(hr.choice([0.1, 0.5, 1.5])),
        max_iters=int(hr.randint(1, 3)),
        alpha=float(hr.uniform(0.0, 1.0)),
        beta=float(hr.uniform(0.0, 4.0)),
        gamma=float(hr.uniform(0.5, 8.0)),
    )
    template = None
    if ctl == "pos":
        template = [["DET"], ["NOUN"], ["NOUN", "VERB"], [""], ["NOUN"],
                    ["ADJ", "NOUN"], ["."]]
    image_embeds = jnp.asarray(
        hr.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    ref_texts, ref_ctls = _naive_exact_ctl_sequential(
        cap, np.asarray(image_embeds), ctl=ctl, template=template, **kwargs)
    cap.cfg.bridge_mode = "exact"
    try:
        result = cap.run(
            image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
            top_k=kwargs["top_k"], temperature=kwargs["temperature"],
            max_iter=kwargs["max_iters"], alpha=kwargs["alpha"],
            beta=kwargs["beta"], gamma=kwargs["gamma"],
            order="sequential", ctl=ctl, pos_template=template,
        )
    finally:
        cap.cfg.bridge_mode = "table"
    assert result.gen_texts_list[:-1] == ref_texts, kwargs
    np.testing.assert_allclose(
        result.iter_ctl, np.asarray(ref_ctls), rtol=0, atol=1e-6
    )


def test_ctl_exact_host_stepped_matches_callback(cap_exact, monkeypatch):
    """On backends without host callbacks (axon), ctl_mode='exact' runs
    host-stepped (engine/host_exact.py) — must equal the callback engine."""
    from conzic_tpu.engine import host_exact

    cap = cap_exact
    rng = np.random.RandomState(5)
    embeds = jnp.asarray(
        rng.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    results = {}
    for supported in (True, False):
        monkeypatch.setattr(
            host_exact, "supports_host_callbacks", lambda s=supported: s
        )
        results[supported] = cap.run(
            embeds, prompt="Image of a", max_len=4, top_k=8,
            temperature=0.1, max_iter=2, alpha=0.02, beta=2.0, gamma=5.0,
            order="shuffle", ctl="sentiment", negative=False,
            rng=np.random.RandomState(3),
        )
    assert results[True].gen_texts_list == results[False].gen_texts_list
    np.testing.assert_array_equal(
        results[True].iter_ids, results[False].iter_ids
    )
    np.testing.assert_allclose(
        results[True].iter_ctl, results[False].iter_ctl, rtol=0, atol=1e-5
    )


def test_table_vs_exact_divergence_mechanism():
    """The documented approximation gap: the per-token table scores raw
    BERT tokens, exact mode scores the DECODED sentence — a polar word
    followed by a '##' continuation merges into a non-word and loses its
    valence in exact mode, while the table still counts it."""
    from conzic_tpu.text.lexicons import build_sentiment_table
    from conzic_tpu.text.vocab import make_test_wordpiece_vocab

    vocab = make_test_wordpiece_vocab()
    table = build_sentiment_table(vocab, use_nltk=False)
    toks = ["a", "sad", "##er", "image"]
    ids = [vocab[t] for t in toks]
    table_score = float(sum(table[i] for i in ids))
    assert table_score == pytest.approx(-0.75)  # 'sad' counts
    # decoded text merges 'sad'+'##er' -> 'sader': no valence
    exact_score = batch_texts_sentiment_scores(["a sader image"])[0]
    assert exact_score == 0.0
    # and an unmerged sentence agrees between the two scoring levels
    assert batch_texts_sentiment_scores(["a sad image"])[0] == pytest.approx(
        table_score
    )
