"""End-to-end engine tests on tiny random models.

The key test reimplements the reference's sequential Gibbs loop naively on
the host (explicit per-position loop, host decode -> CLIP re-tokenize — the
exact semantics of /root/reference/gen_utils.py:51-96) and checks the
jit-compiled engine commits byte-identical captions. This validates the
device-side candidate expansion, bridge assembly, masking rules, score
combination and argmax selection in one shot.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conzic_tpu import energies
from conzic_tpu.engine import Captioner, build_schedule
from conzic_tpu.models.clip import CLIPModel
from conzic_tpu.models.bert import BertForMaskedLM


@pytest.fixture(scope="module")
def captioner(tmp_path_factory):
    d = tmp_path_factory.mktemp("cap")
    cap = Captioner.from_random(tmpdir=str(d), dtype=jnp.float32, init_mode="proper")
    cap.cfg.verbose = False
    return cap


def _naive_sequential(cap, image_embeds, prompt, max_len, top_k, temperature,
                      max_iters, alpha, beta):
    """Host reference loop: fresh BERT forward per position, host decode +
    CLIP re-tokenize, softmax-then-mask-then-topk, argmax commit."""
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = jax.tree.map(np.asarray, cap.params)
    tables = jax.tree.map(np.asarray, cap.tables)
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, image_embeds.shape[0])
    B = ids.shape[0]
    texts_per_iter, cos_per_iter = [], []
    best_cos = np.zeros((B,))
    best_caps = ["None"] * B
    for _ in range(max_iters):
        for pos in range(max_len):
            mask = tables["mask_last"] if pos == max_len - 1 else tables["mask_mid"]
            ids[:, seed_len + pos] = wp.mask_token_id
            logits = np.asarray(
                bert.apply({"params": params["bert"]}, jnp.asarray(ids))
            )[:, seed_len + pos]
            probs = jax.nn.softmax(jnp.asarray(logits / temperature), axis=-1)
            probs = np.asarray(probs) * mask
            idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
            top_probs = np.take_along_axis(probs, idxs, axis=1)
            idxs = (idxs * mask[idxs]).astype(np.int64)
            # candidate sentences via the HOST path
            cand_rows = np.repeat(ids[:, None, :], top_k, axis=1)
            for b in range(B):
                cand_rows[b, :, seed_len + pos] = idxs[b]
            texts = wp.batch_decode(
                cand_rows.reshape(-1, ids.shape[1]), skip_special_tokens=True
            )
            clip_ids, clip_mask = bpe.batch_encode(
                texts, max_length=cap.cfg.clip_len, pad_to_max=True
            )
            text_embeds = clip.apply(
                {"params": params["clip"]},
                jnp.asarray(clip_ids),
                jnp.asarray(clip_mask),
                method=CLIPModel.encode_text,
            )
            clip_probs, cosine = clip.apply(
                {"params": params["clip"]},
                jnp.asarray(image_embeds),
                text_embeds,
                method=CLIPModel.similarity,
            )
            final = alpha * top_probs + beta * np.asarray(clip_probs)
            sel = np.argmax(final, axis=1)
            for b in range(B):
                ids[b, seed_len + pos] = idxs[b, sel[b]]
            cur_cos = np.asarray(cosine)[np.arange(B), sel]
        caps = wp.batch_decode(ids, skip_special_tokens=True)
        for b in range(B):
            if best_cos[b] < cur_cos[b]:
                best_cos[b] = cur_cos[b]
                best_caps[b] = caps[b]
        texts_per_iter.append(caps)
        cos_per_iter.append(cur_cos.copy())
    return texts_per_iter, cos_per_iter, best_caps, best_cos


def test_sequential_engine_matches_naive_host_loop(captioner):
    cap = captioner
    rng = np.random.RandomState(0)
    image_embeds = jnp.asarray(
        rng.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=4, top_k=8,
                  temperature=0.1, max_iters=2, alpha=0.02, beta=2.0)
    ref_texts, ref_cos, ref_best, ref_best_cos = _naive_sequential(
        cap, np.asarray(image_embeds), **kwargs
    )
    result = cap.run(
        image_embeds,
        prompt=kwargs["prompt"],
        max_len=kwargs["max_len"],
        top_k=kwargs["top_k"],
        temperature=kwargs["temperature"],
        max_iter=kwargs["max_iters"],
        alpha=kwargs["alpha"],
        beta=kwargs["beta"],
        order="sequential",
    )
    assert result.gen_texts_list[:-1] == ref_texts
    np.testing.assert_allclose(
        np.asarray(result.clip_score_sequence[:-1]), np.asarray(ref_cos),
        rtol=1e-4, atol=1e-5,
    )
    assert result.gen_texts_list[-1] == ref_best


@pytest.mark.parametrize("draw", range(3))
def test_sequential_engine_matches_naive_host_loop_fuzzed_hypers(captioner, draw):
    """Seeded hyper fuzz of the byte-parity oracle: random sentence_len /
    top_k / temperature / alpha / beta / iteration-count draws, each
    compared text-for-text against the naive host loop (the fixed-hyper
    test above pins one point; generation behavior must hold across the
    reference's whole flag space, demo.py:15-76). Runs under
    bridge_mode="exact" — the mode whose CONTRACT is byte parity with the
    reference's decode -> re-tokenize: random hypers routinely commit
    '##'-continuation pieces, where the default table bridge approximates
    by design (PARITY.md)."""
    cap = captioner
    hr = np.random.RandomState(100 + draw)
    kwargs = dict(
        prompt="Image of a",
        max_len=int(hr.randint(3, 7)),
        top_k=int(hr.randint(4, 14)),
        temperature=float(hr.choice([0.05, 0.1, 0.3, 1.0, 2.0])),
        max_iters=int(hr.randint(1, 4)),
        alpha=float(hr.uniform(0.0, 1.0)),
        beta=float(hr.uniform(0.0, 4.0)),
    )
    image_embeds = jnp.asarray(
        hr.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    ref_texts, ref_cos, ref_best, _ = _naive_sequential(
        cap, np.asarray(image_embeds), **kwargs
    )
    cap.cfg.bridge_mode = "exact"
    try:
        result = cap.run(
            image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
            top_k=kwargs["top_k"], temperature=kwargs["temperature"],
            max_iter=kwargs["max_iters"], alpha=kwargs["alpha"],
            beta=kwargs["beta"], order="sequential",
        )
    finally:
        cap.cfg.bridge_mode = "table"
    assert result.gen_texts_list[:-1] == ref_texts, kwargs
    np.testing.assert_allclose(
        np.asarray(result.clip_score_sequence[:-1]), np.asarray(ref_cos),
        rtol=1e-4, atol=1e-5,
    )
    assert result.gen_texts_list[-1] == ref_best, kwargs


@pytest.mark.parametrize("order", ["sequential", "shuffle", "span", "random", "parallel"])
def test_all_orders_run_and_are_deterministic(captioner, order):
    cap = captioner
    rng = np.random.RandomState(1)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    out = []
    for _ in range(2):
        r = cap.run(
            image_embeds, prompt="Image of a", max_len=5, top_k=6,
            temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
            order=order, rng=np.random.RandomState(42),
        )
        out.append(r)
    assert out[0].gen_texts_list == out[1].gen_texts_list
    assert len(out[0].gen_texts_list) == 3  # 2 iterations + best
    if order != "random":
        # every position visited -> no [MASK] survives ("random" draws
        # positions with replacement and may skip slots, as the reference)
        final_ids = out[0].iter_ids[-1][0]
        sent = final_ids[cap.seed_len("Image of a"): -1]
        assert cap.wp.mask_token_id not in sent.tolist()


@pytest.mark.parametrize("ctl,negative", [("sentiment", False), ("sentiment", True), ("pos", False)])
def test_control_modes_run(captioner, ctl, negative):
    cap = captioner
    rng = np.random.RandomState(2)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    r = cap.run(
        image_embeds, prompt="Image of a", max_len=5, top_k=6,
        temperature=0.1, max_iter=2, alpha=0.02, beta=2.0, gamma=5.0,
        order="sequential", ctl=ctl, negative=negative,
    )
    assert len(r.gen_texts_list) == 3
    assert r.iter_ctl.shape == (2, 1)


def test_sentiment_control_steers_polarity(captioner):
    """positive vs negative control should commit different captions and the
    positive run's sentiment sum should be >= the negative run's."""
    cap = captioner
    rng = np.random.RandomState(3)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    runs = {}
    for style in ("positive", "negative"):
        r = cap.run(
            image_embeds, prompt="Image of a", max_len=5, top_k=12,
            temperature=0.1, max_iter=3, alpha=0.0, beta=0.0, gamma=5.0,
            order="sequential", ctl="sentiment", negative=style == "negative",
        )
        senti = np.asarray(cap.tables["senti"])
        runs[style] = senti[r.iter_ids[-1][0]].sum()
    assert runs["positive"] >= runs["negative"]


def test_argmax_invariance_under_candidate_permutation():
    """Property: the committed token doesn't depend on candidate order."""
    rng = np.random.RandomState(0)
    scores = rng.randn(1, 16).astype(np.float32)
    ids = rng.randint(5, 100, size=(1, 16))
    sel = np.argmax(scores, axis=1)
    perm = rng.permutation(16)
    sel_p = np.argmax(scores[:, perm], axis=1)
    assert ids[0, sel[0]] == ids[:, perm][0, sel_p[0]]


def test_fused_samples_match_looped_runs(captioner):
    """n_samples fused lanes == separate sequential calls with the same rng
    draw order (schedules are drawn per sample from one RandomState)."""
    cap = captioner
    rng_img = np.random.RandomState(7)
    image_embeds = jnp.asarray(
        rng_img.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=5, top_k=6, temperature=0.1,
                  max_iter=2, alpha=0.02, beta=2.0, order="shuffle")
    fused = cap.run(image_embeds, rng=np.random.RandomState(13),
                    n_samples=3, **kwargs)
    samples = cap.split_samples(fused, 3)
    loop_rng = np.random.RandomState(13)
    for s in range(3):
        single = cap.run(image_embeds, rng=loop_rng, n_samples=1, **kwargs)
        assert samples[s].gen_texts_list == single.gen_texts_list, s


def _naive_span(cap, image_embeds, prompt, max_len, top_k, temperature,
                max_iters, alpha, beta, span_len=2):
    """Host reference span loop: mask whole span, ONE stale forward,
    per-position candidate scoring (gen_utils.py:148-195 semantics)."""
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = jax.tree.map(np.asarray, cap.params)
    tables = jax.tree.map(np.asarray, cap.tables)
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, image_embeds.shape[0])
    B = ids.shape[0]
    texts_per_iter = []
    for _ in range(max_iters):
        for span_start in range(0, max_len, span_len):
            span_end = min(span_start + span_len, max_len)
            ids[:, seed_len + span_start: seed_len + span_end] = wp.mask_token_id
            logits_all = np.asarray(
                bert.apply({"params": params["bert"]}, jnp.asarray(ids))
            )
            for pos in range(span_start, span_end):
                mask = tables["mask_last"] if pos == max_len - 1 else tables["mask_mid"]
                logits = logits_all[:, seed_len + pos]
                probs = np.asarray(jax.nn.softmax(jnp.asarray(logits / temperature), axis=-1)) * mask
                idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
                top_probs = np.take_along_axis(probs, idxs, axis=1)
                idxs = (idxs * mask[idxs]).astype(np.int64)
                cand_rows = np.repeat(ids[:, None, :], top_k, axis=1)
                for b in range(B):
                    cand_rows[b, :, seed_len + pos] = idxs[b]
                texts = wp.batch_decode(cand_rows.reshape(-1, ids.shape[1]),
                                        skip_special_tokens=True)
                clip_ids, clip_mask = bpe.batch_encode(
                    texts, max_length=cap.cfg.clip_len, pad_to_max=True)
                te = clip.apply({"params": params["clip"]}, jnp.asarray(clip_ids),
                                jnp.asarray(clip_mask), method=CLIPModel.encode_text)
                cp, cos = clip.apply({"params": params["clip"]},
                                     jnp.asarray(image_embeds), te,
                                     method=CLIPModel.similarity)
                final = alpha * top_probs + beta * np.asarray(cp)
                sel = np.argmax(final, axis=1)
                for b in range(B):
                    ids[b, seed_len + pos] = idxs[b, sel[b]]
        texts_per_iter.append(wp.batch_decode(ids, skip_special_tokens=True))
    return texts_per_iter


def test_span_engine_matches_naive_host_loop(captioner):
    """Covers the stale-logits quirk and the odd-length tail span."""
    cap = captioner
    rng = np.random.RandomState(5)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=5, top_k=6,  # odd: tail span of 1
                  temperature=0.1, max_iters=2, alpha=0.02, beta=2.0)
    ref_texts = _naive_span(cap, np.asarray(image_embeds), **kwargs)
    result = cap.run(
        image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
        top_k=kwargs["top_k"], temperature=kwargs["temperature"],
        max_iter=kwargs["max_iters"], alpha=kwargs["alpha"],
        beta=kwargs["beta"], order="span",
    )
    assert result.gen_texts_list[:-1] == ref_texts


def test_candidate_pruning_runs_and_commits_valid_tokens(captioner):
    """Opt-in two-stage scoring: prune_k < k runs, commits in-vocab tokens,
    and tracks cosine; prune proxy table builds lazily."""
    cap = captioner
    rng = np.random.RandomState(11)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    r = cap.run(
        image_embeds, prompt="Image of a", max_len=5, top_k=12,
        temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
        order="sequential", prune_k=4,
    )
    assert "word_embeds" in cap.tables
    assert len(r.gen_texts_list) == 3
    sent = r.iter_ids[-1][0][cap.seed_len("Image of a"):-1]
    assert all(0 <= t < cap.wp.vocab_size for t in sent.tolist())
    # proxy should still strongly prefer image-matching words vs full set:
    # committed cosine within the range achievable by full scoring
    full = cap.run(
        image_embeds, prompt="Image of a", max_len=5, top_k=12,
        temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
        order="sequential",
    )
    assert r.best_cos[0] <= full.best_cos[0] + 0.2


def test_prune_proxy_excludes_edited_slot(captioner):
    """The stage-1 proxy bag must EXCLUDE the edited slot's current word:
    in parallel order base_ids is the unmasked iteration-start row, and a
    bag that keeps the old word scores "old sentence + new word" while
    stage 2 scores rows with the old word replaced. Pinned property: the
    proxy over an unmasked base row equals the proxy over the same row
    with [MASK] at the slot (whose table embedding is exact 0)."""
    from conzic_tpu import energies

    cap = captioner
    cap._ensure_word_embeds()
    we = cap.tables["word_embeds"]
    rng = np.random.RandomState(7)
    V = cap.wp.vocab_size
    S, B, K = 9, 2, 5
    base = rng.randint(0, V, size=(B, S)).astype(np.int32)
    col = np.array([3, 5], np.int32)
    masked = base.copy()
    masked[np.arange(B), col] = cap.wp.mask_token_id
    cands = rng.randint(0, V, size=(B, K)).astype(np.int32)
    img = rng.randn(B, cap.clip_model.config.projection_dim).astype(
        np.float32
    )
    p_unmasked = energies.prune_proxy_scores(
        we, jnp.asarray(base), jnp.asarray(col), jnp.asarray(cands),
        jnp.asarray(img), S)
    p_masked = energies.prune_proxy_scores(
        we, jnp.asarray(masked), jnp.asarray(col), jnp.asarray(cands),
        jnp.asarray(img), S)
    # (bag + w) - w vs bag + 0 - 0: equal up to fp32 summation rounding
    np.testing.assert_allclose(np.asarray(p_unmasked),
                               np.asarray(p_masked), atol=1e-5)
    # the proxy is insensitive to WHICH word sits at the edited slot
    base2 = base.copy()
    base2[np.arange(B), col] = rng.randint(0, V, size=B)
    p_other = energies.prune_proxy_scores(
        we, jnp.asarray(base2), jnp.asarray(col), jnp.asarray(cands),
        jnp.asarray(img), S)
    np.testing.assert_allclose(np.asarray(p_unmasked),
                               np.asarray(p_other), atol=1e-5)
    # for a MASKED base row, skipping the subtraction (the masked-order
    # compile-time optimization the engine uses) is a byte-level no-op:
    # [MASK] embeds to exact 0
    p_skip = energies.prune_proxy_scores(
        we, jnp.asarray(masked), jnp.asarray(col), jnp.asarray(cands),
        jnp.asarray(img), S, exclude_slot=False)
    np.testing.assert_array_equal(np.asarray(p_masked), np.asarray(p_skip))


def test_parallel_order_with_pruning_runs(captioner):
    """parallel order + prune_k compiles and commits in-vocab tokens (the
    only order whose proxy base row is unmasked — regression companion to
    test_prune_proxy_excludes_edited_slot)."""
    cap = captioner
    rng = np.random.RandomState(17)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    r = cap.run(
        image_embeds, prompt="Image of a", max_len=5, top_k=12,
        temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
        order="parallel", prune_k=4,
    )
    sent = r.iter_ids[-1][0][cap.seed_len("Image of a"):-1]
    assert all(0 <= t < cap.wp.vocab_size for t in sent.tolist())


def test_topk_mode_approx_pruned_only(captioner):
    """``topk_mode="approx"`` (jax.lax.approx_max_k stage-1) is refused
    without prune_k (it would silently de-parity the exact tier), and with
    prune_k it runs; on CPU backends approx_max_k lowers to an exact sort,
    so the run must match the exact-mode pruned run byte-for-byte here."""
    cap = captioner
    rng = np.random.RandomState(13)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=5, top_k=12, temperature=0.1,
                  max_iter=2, alpha=0.02, beta=2.0, order="sequential")
    exact = cap.run(image_embeds, prune_k=4, **kwargs)
    old = cap.cfg.topk_mode
    cap.cfg.topk_mode = "approx"
    try:
        with pytest.raises(ValueError, match="pruned-tier-only"):
            cap.run(image_embeds, **kwargs)
        approx = cap.run(image_embeds, prune_k=4, **kwargs)
    finally:
        cap.cfg.topk_mode = old
    assert approx.gen_texts_list == exact.gen_texts_list


def _naive_sentiment_sequential(cap, image_embeds, prompt, max_len, top_k,
                                temperature, max_iters, alpha, beta, gamma,
                                negative):
    """Host loop with the same table energies: lm + clip + gamma*softmax(
    senti sentence sums) + 0.1*(1-exp(repeats)) (control_gen_utils.py:30-80
    semantics with device tables)."""
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = jax.tree.map(np.asarray, cap.params)
    tables = jax.tree.map(np.asarray, cap.tables)
    senti = tables["senti"]
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, image_embeds.shape[0])
    B = ids.shape[0]
    texts_per_iter = []
    for _ in range(max_iters):
        for pos in range(max_len):
            mask = tables["mask_last"] if pos == max_len - 1 else tables["mask_mid"]
            ids[:, seed_len + pos] = wp.mask_token_id
            logits = np.asarray(
                bert.apply({"params": params["bert"]}, jnp.asarray(ids))
            )[:, seed_len + pos]
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits / temperature), -1)) * mask
            idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
            top_probs = np.take_along_axis(probs, idxs, axis=1)
            idxs = (idxs * mask[idxs]).astype(np.int64)
            cand_rows = np.repeat(ids[:, None, :], top_k, axis=1)
            for b in range(B):
                cand_rows[b, :, seed_len + pos] = idxs[b]
            # repeat penalty over the full rows
            repeats = (cand_rows == idxs[:, :, None]).sum(2) - 1
            penalty = 0.1 * (1 - np.exp(repeats))
            # sentence sentiment sums
            s = senti[cand_rows].sum(axis=2)
            if negative:
                s = -s
            e = np.exp(s - s.max(axis=1, keepdims=True))
            senti_probs = e / e.sum(axis=1, keepdims=True)
            texts = wp.batch_decode(cand_rows.reshape(-1, ids.shape[1]),
                                    skip_special_tokens=True)
            clip_ids, clip_mask = bpe.batch_encode(
                texts, max_length=cap.cfg.clip_len, pad_to_max=True)
            te = clip.apply({"params": params["clip"]}, jnp.asarray(clip_ids),
                            jnp.asarray(clip_mask), method=CLIPModel.encode_text)
            cp, cos = clip.apply({"params": params["clip"]},
                                 jnp.asarray(image_embeds), te,
                                 method=CLIPModel.similarity)
            final = (alpha * top_probs + beta * np.asarray(cp)
                     + gamma * senti_probs + penalty)
            sel = np.argmax(final, axis=1)
            for b in range(B):
                ids[b, seed_len + pos] = idxs[b, sel[b]]
        texts_per_iter.append(wp.batch_decode(ids, skip_special_tokens=True))
    return texts_per_iter


@pytest.mark.parametrize("negative", [False, True])
def test_sentiment_engine_matches_naive_host_loop(captioner, negative):
    cap = captioner
    rng = np.random.RandomState(21)
    image_embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=4, top_k=8, temperature=0.1,
                  max_iters=2, alpha=0.02, beta=2.0, gamma=5.0)
    ref_texts = _naive_sentiment_sequential(
        cap, np.asarray(image_embeds), negative=negative, **kwargs)
    result = cap.run(
        image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
        top_k=kwargs["top_k"], temperature=kwargs["temperature"],
        max_iter=kwargs["max_iters"], alpha=kwargs["alpha"],
        beta=kwargs["beta"], gamma=kwargs["gamma"],
        order="sequential", ctl="sentiment", negative=negative,
    )
    assert result.gen_texts_list[:-1] == ref_texts


def test_pos_engine_matches_naive_host_loop(captioner):
    """POS control: alpha*lm + beta*clip + gamma*softmax(acc/0.1) with
    template accuracy from the tag table (control_gen_utils.py:136-195
    semantics with device tables)."""
    cap = captioner
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = jax.tree.map(np.asarray, cap.params)
    tables = jax.tree.map(np.asarray, cap.tables)
    pos_table, template = tables["pos"], tables["template"]
    n_tags = template.shape[1] - 1
    bridge_lens = tables["bridge_lens"]

    prompt, max_len, top_k, temperature = "Image of a", 4, 8, 0.1
    alpha, beta, gamma, max_iters = 0.02, 2.0, 5.0, 2
    rng = np.random.RandomState(23)
    image_embeds = rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, 1)
    B = 1
    ref_texts = []
    for _ in range(max_iters):
        for pos in range(max_len):
            mask = tables["mask_last"] if pos == max_len - 1 else tables["mask_mid"]
            ids[:, seed_len + pos] = wp.mask_token_id
            logits = np.asarray(
                bert.apply({"params": params["bert"]}, jnp.asarray(ids))
            )[:, seed_len + pos]
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits / temperature), -1)) * mask
            idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
            top_probs = np.take_along_axis(probs, idxs, axis=1)
            idxs = (idxs * mask[idxs]).astype(np.int64)
            cand_rows = np.repeat(ids[:, None, :], top_k, axis=1)
            cand_rows[0, :, seed_len + pos] = idxs[0]
            inner = cand_rows[:, :, 1:-1]
            valid = bridge_lens[inner] > 0
            tags = np.where(valid, pos_table[inner], n_tags)
            T = template.shape[0]
            W = tags.shape[-1]
            if W < T:
                tags = np.concatenate(
                    [tags, np.full(tags.shape[:-1] + (T - W,), n_tags)], -1)
            else:
                tags = tags[..., :T]
            acc = template[np.arange(T), tags].mean(-1)
            e = np.exp((acc - acc.max(-1, keepdims=True)) / 0.1)
            pos_probs = e / e.sum(-1, keepdims=True)
            texts = wp.batch_decode(cand_rows.reshape(-1, ids.shape[1]),
                                    skip_special_tokens=True)
            clip_ids, clip_mask = bpe.batch_encode(
                texts, max_length=cap.cfg.clip_len, pad_to_max=True)
            te = clip.apply({"params": params["clip"]}, jnp.asarray(clip_ids),
                            jnp.asarray(clip_mask), method=CLIPModel.encode_text)
            cp, cos = clip.apply({"params": params["clip"]},
                                 jnp.asarray(image_embeds), te,
                                 method=CLIPModel.similarity)
            final = alpha * top_probs + beta * np.asarray(cp) + gamma * pos_probs
            sel = np.argmax(final, axis=1)
            ids[0, seed_len + pos] = idxs[0, sel[0]]
        ref_texts.append(wp.batch_decode(ids, skip_special_tokens=True))

    result = cap.run(
        jnp.asarray(image_embeds), prompt=prompt, max_len=max_len,
        top_k=top_k, temperature=temperature, max_iter=max_iters,
        alpha=alpha, beta=beta, gamma=gamma,
        order="sequential", ctl="pos",
    )
    assert result.gen_texts_list[:-1] == ref_texts


def test_parallel_engine_matches_naive_host_loop(captioner):
    """Parallel order: ONE unmasked forward per iteration, candidates built
    from iteration-start rows, commits progressive, '.'-allowed mask
    everywhere (gen_utils.py:256-273 semantics with the intended kk
    position index)."""
    cap = captioner
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = jax.tree.map(np.asarray, cap.params)
    tables = jax.tree.map(np.asarray, cap.tables)
    prompt, max_len, top_k, temperature = "Image of a", 4, 6, 0.1
    alpha, beta, max_iters = 0.02, 2.0, 2
    rng = np.random.RandomState(31)
    image_embeds = rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, 1)
    mask = tables["mask_last"]  # parallel never updates the '.' rule
    ref_texts = []
    for _ in range(max_iters):
        base = ids.copy()
        logits_all = np.asarray(
            bert.apply({"params": params["bert"]}, jnp.asarray(ids))
        )
        for kk in range(max_len):
            logits = logits_all[:, seed_len + kk]
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits / temperature), -1)) * mask
            idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
            top_probs = np.take_along_axis(probs, idxs, axis=1)
            idxs = (idxs * mask[idxs]).astype(np.int64)
            cand_rows = np.repeat(base[:, None, :], top_k, axis=1)
            cand_rows[0, :, seed_len + kk] = idxs[0]
            texts = wp.batch_decode(cand_rows.reshape(-1, ids.shape[1]),
                                    skip_special_tokens=True)
            clip_ids, clip_mask = bpe.batch_encode(
                texts, max_length=cap.cfg.clip_len, pad_to_max=True)
            te = clip.apply({"params": params["clip"]}, jnp.asarray(clip_ids),
                            jnp.asarray(clip_mask), method=CLIPModel.encode_text)
            cp, cos = clip.apply({"params": params["clip"]},
                                 jnp.asarray(image_embeds), te,
                                 method=CLIPModel.similarity)
            final = alpha * top_probs + beta * np.asarray(cp)
            sel = np.argmax(final, axis=1)
            ids[0, seed_len + kk] = idxs[0, sel[0]]
        ref_texts.append(wp.batch_decode(ids, skip_special_tokens=True))
    result = cap.run(
        jnp.asarray(image_embeds), prompt=prompt, max_len=max_len,
        top_k=top_k, temperature=temperature, max_iter=max_iters,
        alpha=alpha, beta=beta, order="parallel",
    )
    assert result.gen_texts_list[:-1] == ref_texts


def test_build_schedule_shapes_and_validation():
    from conzic_tpu.engine.orders import build_schedule

    rng = np.random.RandomState(0)
    s = build_schedule("sequential", 7, 3, rng)
    assert s.kind == "single" and s.positions.shape == (3, 7)
    s = build_schedule("shuffle", 7, 3, rng)
    assert sorted(s.positions[0].tolist()) == list(range(7))
    assert (s.positions[0] == s.positions[1]).all()  # one perm reused
    s = build_schedule("random", 7, 3, rng)
    assert s.positions.shape == (3, 7) and s.positions.max() < 7
    s = build_schedule("span", 7, 2, rng)
    assert s.kind == "span" and s.span_sizes[0].tolist() == [2, 2, 2, 1]
    s = build_schedule("parallel", 7, 2, rng)
    assert s.kind == "parallel"
    with pytest.raises(ValueError):
        build_schedule("bogus", 7, 2, rng)


def _naive_single_order(cap, image_embeds, positions, prompt, max_len,
                        top_k, temperature, alpha, beta):
    """Host reference loop over an explicit (iters, steps) position array —
    the shuffle/random semantics of gen_utils.py:98-146/197-243 (fresh BERT
    forward per step, host decode + re-tokenize, argmax commit)."""
    wp, bpe = cap.wp, cap.bpe
    bert, clip = cap.bert_model, cap.clip_model
    params = jax.tree.map(np.asarray, cap.params)
    tables = jax.tree.map(np.asarray, cap.tables)
    seed_len = cap.seed_len(prompt)
    ids = cap.init_ids(prompt, max_len, image_embeds.shape[0])
    B = ids.shape[0]
    texts_per_iter, cos_per_iter = [], []
    best_cos = np.zeros((B,))
    best_caps = ["None"] * B
    for it in range(positions.shape[0]):
        for pos in positions[it]:
            pos = int(pos)
            mask = tables["mask_last"] if pos == max_len - 1 else tables["mask_mid"]
            ids[:, seed_len + pos] = wp.mask_token_id
            logits = np.asarray(
                bert.apply({"params": params["bert"]}, jnp.asarray(ids))
            )[:, seed_len + pos]
            probs = np.asarray(
                jax.nn.softmax(jnp.asarray(logits / temperature), axis=-1)
            ) * mask
            idxs = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
            top_probs = np.take_along_axis(probs, idxs, axis=1)
            idxs = (idxs * mask[idxs]).astype(np.int64)
            cand_rows = np.repeat(ids[:, None, :], top_k, axis=1)
            for b in range(B):
                cand_rows[b, :, seed_len + pos] = idxs[b]
            texts = wp.batch_decode(
                cand_rows.reshape(-1, ids.shape[1]), skip_special_tokens=True
            )
            clip_ids, clip_mask = bpe.batch_encode(
                texts, max_length=cap.cfg.clip_len, pad_to_max=True
            )
            text_embeds = clip.apply(
                {"params": params["clip"]}, jnp.asarray(clip_ids),
                jnp.asarray(clip_mask), method=CLIPModel.encode_text,
            )
            clip_probs, cosine = clip.apply(
                {"params": params["clip"]}, jnp.asarray(image_embeds),
                text_embeds, method=CLIPModel.similarity,
            )
            final = alpha * top_probs + beta * np.asarray(clip_probs)
            sel = np.argmax(final, axis=1)
            for b in range(B):
                ids[b, seed_len + pos] = idxs[b, sel[b]]
            cur_cos = np.asarray(cosine)[np.arange(B), sel]
        caps = wp.batch_decode(ids, skip_special_tokens=True)
        for b in range(B):
            if best_cos[b] < cur_cos[b]:
                best_cos[b] = cur_cos[b]
                best_caps[b] = caps[b]
        texts_per_iter.append(caps)
        cos_per_iter.append(cur_cos.copy())
    return texts_per_iter, cos_per_iter, best_caps, best_cos


@pytest.mark.parametrize("order", ["shuffle", "random"])
def test_permuted_orders_match_naive_host_loop(captioner, order):
    """Shuffle (one reused permutation) and random (fresh uniform draws per
    iteration) byte-parity vs the naive host loop, using the exact schedule
    the engine draws (same RandomState stream)."""
    cap = captioner
    rng = np.random.RandomState(0)
    image_embeds = jnp.asarray(
        rng.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    kwargs = dict(prompt="Image of a", max_len=4, top_k=8,
                  temperature=0.1, alpha=0.02, beta=2.0)
    sched = build_schedule(order, kwargs["max_len"], 2, np.random.RandomState(7))
    ref_texts, ref_cos, ref_best, _ = _naive_single_order(
        cap, np.asarray(image_embeds), sched.positions, **kwargs
    )
    result = cap.run(
        image_embeds, prompt=kwargs["prompt"], max_len=kwargs["max_len"],
        top_k=kwargs["top_k"], temperature=kwargs["temperature"],
        max_iter=2, alpha=kwargs["alpha"], beta=kwargs["beta"],
        order=order, rng=np.random.RandomState(7),
    )
    assert result.gen_texts_list[:-1] == ref_texts
    np.testing.assert_allclose(
        np.asarray(result.clip_score_sequence[:-1]), np.asarray(ref_cos),
        rtol=1e-4, atol=1e-5,
    )
    assert result.gen_texts_list[-1] == ref_best


def test_exact_topk_2stage_identical_to_full_topk():
    """The chunked top-k (energies.exact_topk_2stage) must equal the
    single-call lax.top_k bit for bit — values, indices, AND tie order —
    on the full 30,522 vocab with heavy ties (quantized probs + a large
    zero band, the structure masked probs actually have)."""
    rng = np.random.RandomState(0)
    V, B, k = 30522, 4, 200
    p = rng.rand(B, V).astype(np.float32)
    p = np.round(p * 8) / 8
    p[:, 5000:20000] = 0.0
    a_v, a_i = jax.lax.top_k(jnp.asarray(p), k)
    b_v, b_i = energies.exact_topk_2stage(jnp.asarray(p), k)
    np.testing.assert_array_equal(np.asarray(a_v), np.asarray(b_v))
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
    # small-vocab fallback path stays the plain call
    sp = rng.rand(2, 64).astype(np.float32)
    c_v, c_i = energies.exact_topk_2stage(jnp.asarray(sp), 8)
    d_v, d_i = jax.lax.top_k(jnp.asarray(sp), 8)
    np.testing.assert_array_equal(np.asarray(c_v), np.asarray(d_v))
    np.testing.assert_array_equal(np.asarray(c_i), np.asarray(d_i))


def test_topk_candidates_approx_mode_contract():
    """``mode="approx"`` (the pruned-tier stage-1 lever): on CPU backends
    approx_max_k lowers to an exact sort (recall 1.0), so with distinct
    values it must return the exact top-k and apply the same reference
    masked-id collapse (``idxs * mask[idxs]``, gen_utils.py:72) as the
    exact path. This pins the CONTRACT (shape, dtype, mask semantics);
    the TPU recall behavior is quality-gated via PRUNING_MATRIX.json."""
    rng = np.random.RandomState(1)
    V, B, k = 4096, 3, 50
    p = rng.rand(B, V).astype(np.float32)  # distinct with prob 1
    p[0, 10:] = 0.0  # row 0: fewer positives than k -> zero-tie regime
    mask = np.ones(V, dtype=np.float32)
    mask[::7] = 0.0
    masked = p * mask
    e_v, e_i = energies.topk_candidates(jnp.asarray(masked),
                                        jnp.asarray(mask), k)
    a_v, a_i = energies.topk_candidates(jnp.asarray(masked),
                                        jnp.asarray(mask), k,
                                        mode="approx", recall=0.95)
    # distinct-value rows: bitwise identical to the exact path (tie order
    # in the zero band of row 0 is implementation-defined across sorts)
    np.testing.assert_array_equal(np.asarray(e_v)[1:], np.asarray(a_v)[1:])
    np.testing.assert_array_equal(np.asarray(e_i)[1:], np.asarray(a_i)[1:])
    assert a_i.dtype == jnp.int32
    # the reference's masked-id collapse holds in BOTH modes, including
    # the zero-tie row: banned picks collapse to 0 ([PAD]), allowed stay
    for ids in (np.asarray(e_i), np.asarray(a_i)):
        assert np.all((mask[ids] == 1.0) | (ids == 0))


def test_generate_step_modes():
    """generate_step (engine/primitives.py) reproduces the reference's
    three modes (gen_utils.py:10-31): greedy argmax, top-k categorical
    restricted to the top-k set, and full categorical."""
    from conzic_tpu.engine.primitives import generate_step

    rng = np.random.RandomState(3)
    out = jnp.asarray(rng.randn(5, 7, 50).astype(np.float32))
    # greedy (no rng needed): argmax of the selected position
    greedy = np.asarray(generate_step(out, 2))
    np.testing.assert_array_equal(greedy, np.argmax(np.asarray(out)[:, 2], -1))
    # temperature does not change the argmax
    np.testing.assert_array_equal(
        np.asarray(generate_step(out, 2, temperature=0.3)), greedy
    )
    # top-k sampling only ever picks ids inside the per-row top-k set
    key = jax.random.PRNGKey(0)
    topk_sets = np.asarray(jax.lax.top_k(out[:, 4], 5)[1])
    for s in range(8):
        ids = np.asarray(generate_step(out, 4, jax.random.fold_in(key, s),
                                       top_k=5))
        assert all(ids[b] in topk_sets[b] for b in range(ids.shape[0]))
    # full-categorical sampling returns valid ids and, at tiny temperature,
    # collapses to the argmax (distribution sanity)
    ids = np.asarray(
        generate_step(out, 0, key, temperature=1e-4, sample=True)
    )
    np.testing.assert_array_equal(ids, np.argmax(np.asarray(out)[:, 0], -1))
    # rng is required for the stochastic modes
    import pytest as _pytest

    with _pytest.raises(ValueError):
        generate_step(out, 1, top_k=3)
    with _pytest.raises(ValueError):
        generate_step(out, 1, sample=True)


def test_prune_final_exact_is_full_sweep_over_pruned_state(captioner):
    """Hybrid pruned+exact schedule (spec.final_exact): iterations 1..I-1
    match the pure pruned engine byte for byte, and the LAST iteration is
    byte-identical to running the full-parity engine for one iteration
    from the pruned state — the committed caption is a full-parity polish
    sweep by construction (VERDICT r2 item 1)."""
    cap = captioner
    rng = np.random.RandomState(11)
    B, L, K, PK, I = 2, 5, 12, 4, 3
    image_embeds = jnp.asarray(
        rng.randn(B, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    common = dict(
        prompt="Image of a", max_len=L, top_k=K, temperature=0.1,
        alpha=0.02, beta=2.0, order="sequential",
    )
    hybrid = cap.run(image_embeds, max_iter=I, prune_k=PK,
                     prune_final_exact=True,
                     rng=np.random.RandomState(7), **common)
    pruned = cap.run(image_embeds, max_iter=I, prune_k=PK,
                     rng=np.random.RandomState(7), **common)
    # prefix iterations are the pruned trajectory, unchanged
    np.testing.assert_array_equal(hybrid.iter_ids[: I - 1],
                                  pruned.iter_ids[: I - 1])
    # final iteration == one full-parity sweep from the pruned state
    seed_len = cap.seed_len(common["prompt"])
    init_row = cap.init_ids(common["prompt"], L, 1)
    spec_full = cap._spec(
        seed_len, L, K, "single", None, False, prune_k=None,
        prefix_chunks=cap._prefix_chunks(
            "sequential", "single", init_row, seed_len, L
        ),
    )
    sched = build_schedule("sequential", L, 1, np.random.RandomState(0))
    positions = jnp.asarray(
        np.repeat(sched.positions[:, :, None], B, axis=2)
    )
    hyper = {k: jnp.float32(v) for k, v in
             dict(alpha=0.02, beta=2.0, gamma=0.0, temperature=0.1).items()}
    ids1, cos1, _, _, _ = cap._compiled(spec_full)(
        cap.params, cap.tables, hyper, image_embeds,
        jnp.asarray(hybrid.iter_ids[I - 2]), positions, None,
    )
    np.testing.assert_array_equal(hybrid.iter_ids[-1], np.asarray(ids1)[0])
    np.testing.assert_allclose(
        np.asarray(hybrid.clip_score_sequence[I - 1]),
        np.asarray(cos1)[0], rtol=1e-5, atol=1e-6,
    )
    # best tracking spans ALL iterations (strictly-greater from 0)
    np.testing.assert_allclose(
        hybrid.best_cos,
        np.maximum(
            np.asarray(hybrid.clip_score_sequence[:-1]).max(axis=0), 0.0
        ),
        rtol=1e-6,
    )


def test_clip_pad_to_is_exact(captioner, tmp_path):
    """clip_pad_to pads candidate rows with masked PAD columns (and the
    position table with zero rows past 77) — the S>64 alignment probe must
    be EXACT: byte-identical generations to the unpadded engine."""
    from conzic_tpu.config import ConzicConfig

    results = {}
    for pad_to in (0, 40, 80):
        cfg = ConzicConfig(dtype="float32", clip_pad_to=pad_to)
        cap = Captioner.from_random(
            config=cfg, tmpdir=str(tmp_path / f"p{pad_to}"),
            init_mode="proper",
        )
        cap.cfg.verbose = False
        rng = np.random.RandomState(4)
        embeds = jnp.asarray(
            rng.randn(2, cap.clip_model.config.projection_dim).astype(
                np.float32
            )
        )
        results[pad_to] = cap.run(
            embeds, prompt="Image of a", max_len=4, top_k=8,
            temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
            order="sequential",
        )
    for pad_to in (40, 80):  # 80 > max_position: zero-padded pos rows
        assert results[0].gen_texts_list == results[pad_to].gen_texts_list
        np.testing.assert_array_equal(
            results[0].iter_ids, results[pad_to].iter_ids
        )
        np.testing.assert_allclose(
            results[0].best_cos, results[pad_to].best_cos, rtol=0, atol=1e-5
        )


def test_clip_pad_to_auto_rule(captioner):
    """-1 auto-aligns only the misaligned S>64 band (77->80); aligned or
    short contexts stay unpadded; explicit values pass through."""
    cap = captioner
    old_pad, old_len = cap.cfg.clip_pad_to, cap.cfg.clip_len
    try:
        for pad, length, want in [
            (-1, 77, 80), (-1, 72, 0), (-1, 65, 72), (-1, 64, 0),
            (-1, 32, 0), (0, 77, 0), (80, 77, 80), (40, 77, 0),
        ]:
            cap.cfg.clip_pad_to, cap.cfg.clip_len = pad, length
            assert cap._clip_pad_to() == want, (pad, length)
    finally:
        cap.cfg.clip_pad_to, cap.cfg.clip_len = old_pad, old_len


def test_take_along_onehot_exact():
    """The pruned tier's one-hot take-along == jnp.take_along_axis for
    int32 ids and f32 probabilities (exactness precondition: payloads
    < 2^24)."""
    from conzic_tpu.engine.gibbs import _take_along_onehot

    rng = np.random.RandomState(0)
    vals_i = rng.randint(0, 30522, size=(4, 200)).astype(np.int32)
    vals_f = rng.rand(4, 200).astype(np.float32)
    sel = rng.randint(0, 200, size=(4, 5)).astype(np.int32)
    for vals in (vals_i, vals_f):
        got = np.asarray(_take_along_onehot(jnp.asarray(vals),
                                            jnp.asarray(sel)))
        ref = np.take_along_axis(vals, sel, axis=1)
        np.testing.assert_array_equal(got, ref)
        assert got.dtype == vals.dtype


def test_masked_and_banned_ids_never_committed(captioner):
    """Property (SURVEY §4): committed sentence tokens are never [MASK]
    and never a mask-banned id — across orders and iterations. Banned
    candidates collapse to [PAD] (gen_utils.py:72) and [PAD] carries prob
    0, so a committed [PAD] would also indicate a scoring bug."""
    cap = captioner
    rng = np.random.RandomState(17)
    embeds = jnp.asarray(
        rng.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    mask_mid = np.asarray(cap.tables["mask_mid"])
    mask_last = np.asarray(cap.tables["mask_last"])
    seed_len = cap.seed_len("Image of a")
    L = 5
    for order in ("sequential", "shuffle", "span"):
        r = cap.run(
            embeds, prompt="Image of a", max_len=L, top_k=8,
            temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
            order=order, rng=np.random.RandomState(3),
        )
        sent = r.iter_ids[:, :, seed_len : seed_len + L]
        assert (sent != cap.wp.mask_token_id).all(), order
        # every committed non-final token is mask_mid-allowed; the final
        # slot may additionally use '.' (mask_last)
        mid, last = sent[:, :, :-1].ravel(), sent[:, :, -1].ravel()
        assert mask_mid[mid].all(), order
        assert mask_last[last].all(), order


def test_scan_layers_generation_runs():
    """scan_layers=True (nn.scan-rolled stacks) cannot expose per-layer
    K/V, so the sampler must disable prefix-KV reuse instead of crashing
    on the stack's internal assertion (regression: default kv_chunk_size
    enabled prefix chunks regardless)."""
    from conzic_tpu.config import ConzicConfig

    cap = Captioner.from_random(
        config=ConzicConfig(dtype="float32", scan_layers=True),
        init_mode="proper", seed=3,
    )
    rng = np.random.RandomState(1)
    emb = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    r = cap.run(emb, prompt="Image of a", max_len=4, top_k=6,
                temperature=0.1, max_iter=1, alpha=0.02, beta=2.0,
                order="sequential", rng=np.random.RandomState(2))
    assert len(r.gen_texts_list) == 2
