"""Control-aware stage-1 ranking (``--prune_stage1_ctl``, r5).

Cosine-only stage-1 pruning structurally drops the control effect: the
gamma term never sees the valence/POS words the control exists to
promote (measured on trained_mid — EVAL.md r5: sentiment shift +2.40 at
full parity collapsed to +0.03 at the cosine-ranked fact50pc96 tier,
while its Δcos gate cell stayed "under"). ``stage1_ctl`` ranks every
stage-1 cut by the full combine instead (engine/gibbs._stage1_rank,
energies.stage1_ctl_rank).

Pins here:
  - the rank formula against a hand numpy recomposition (both controls);
  - the factorized engine's committed token against a recomposed oracle
    applying the rank at the stage-1 cut;
  - the off-switch (cosine-only oracle) byte-identically;
  - the steering effect itself (auto beats off on committed sentiment);
  - spec plumbing for ctl_mode="exact" (stage-1 still uses the tables).

Host-stepped vs callback byte-parity for controlled pruned runs lives in
tests/test_factorized.py (`_host_vs_callback_pruned` ctl variants).
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from conzic_tpu import energies  # noqa: E402
from conzic_tpu.config import ConzicConfig  # noqa: E402
from conzic_tpu.engine.sampler import Captioner  # noqa: E402
from conzic_tpu.models.clip import (  # noqa: E402
    CLIPModel,
    CLIPTextTower,
    truncated_text_params,
)
from conzic_tpu.text.bridge import assemble_clip_ids_substitute  # noqa: E402


def _softmax(x, axis=-1):
    x = np.asarray(x, np.float32)
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


@pytest.mark.parametrize("ctl,negative", [
    ("sentiment", False), ("sentiment", True), ("pos", False),
])
def test_stage1_ctl_rank_matches_numpy(ctl, negative):
    """energies.stage1_ctl_rank == the hand-computed full combine with
    the surrogate cosine standing in for the exact one."""
    rng = np.random.RandomState(0)
    B, K, S, V = 2, 5, 7, 40
    seq_len = S
    surr = rng.randn(B, K).astype(np.float32) * 0.1
    lm = rng.rand(B, K).astype(np.float32)
    rows = rng.randint(0, V, size=(B, K, S)).astype(np.int32)
    cand = rows[:, :, 3].astype(np.int32)  # the "edited slot" ids
    senti = np.zeros(V, np.float32)
    senti[rng.choice(V, 8, replace=False)] = rng.randn(8).astype(np.float32)
    n_tags = 4
    pos_table = rng.randint(0, n_tags, size=V).astype(np.int32)
    T = 6
    template = (rng.rand(T, n_tags + 1) > 0.5).astype(np.float32)
    bridge_lens = rng.randint(0, 3, size=V).astype(np.int32)
    ls = np.float32(1.2)
    alpha, beta, gamma = np.float32(0.02), np.float32(2.0), np.float32(5.0)

    got = np.asarray(energies.stage1_ctl_rank(
        jnp.asarray(surr), jnp.asarray(lm), jnp.asarray(cand),
        jnp.asarray(rows), ctl=ctl, negative=negative, seq_len=seq_len,
        logit_scale=jnp.float32(ls), alpha=jnp.float32(alpha),
        beta=jnp.float32(beta), gamma=jnp.float32(gamma),
        senti=jnp.asarray(senti), pos_table=jnp.asarray(pos_table),
        template=jnp.asarray(template),
        bridge_lens=jnp.asarray(bridge_lens),
    ))

    clip_probs = _softmax(surr * np.exp(ls))
    if ctl == "sentiment":
        score = senti[rows].sum(-1)
        if negative:
            score = -score
        ctl_probs = _softmax(score)
        repeats = (cand[:, :, None] == rows).sum(-1).astype(np.float32) - 1.0
        penalty = 0.1 * (1.0 - np.exp(repeats))
        want = alpha * lm + beta * clip_probs + gamma * ctl_probs + penalty
    else:
        inner = rows[:, :, 1 : seq_len - 1]
        valid = bridge_lens[inner] > 0
        tags = np.where(valid, pos_table[inner], n_tags)
        W = tags.shape[-1]
        if W < T:
            tags = np.concatenate(
                [tags, np.full(tags.shape[:-1] + (T - W,), n_tags)], -1)
        else:
            tags = tags[..., :T]
        match = template[np.arange(T), tags]
        acc = match.mean(-1)
        ctl_probs = _softmax(acc / 0.1)
        want = alpha * lm + beta * clip_probs + gamma * ctl_probs
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def cap():
    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.dtype = "float32"
    cfg.param_dtype = "float32"
    cfg.prune_k = 4
    cfg.prune_stage1 = "factorized"
    cfg.prune_stage1_layers = 1
    return Captioner.from_random(cfg, init_mode="proper")


def _recomposed_step(cap, embeds, *, gamma, ctl_rank, negative=False):
    """One sentiment-controlled factorized-pruned engine step recomposed
    OUTSIDE the engine: BERT probs -> top-K -> assembly -> truncated
    tower + wcal -> stage-1 cut (cosine-only or the ctl-aware rank) ->
    full tower -> combined score argmax. Returns the committed token per
    row (max_len=1 sequential run semantics)."""
    B = int(embeds.shape[0])
    K, PK = 16, 4
    prompt = "Image of a"
    col = cap.seed_len(prompt)
    init = jnp.asarray(cap.init_ids(prompt, 1, B))
    bert_logits = cap.bert_model.apply(
        {"params": cap.params["bert"]}, init)[:, col, :]
    probs = energies.masked_lm_probs(
        bert_logits, cap.tables["mask_last"], jnp.float32(0.1))
    top_probs, idxs = energies.topk_candidates(
        probs, cap.tables["mask_last"][None, :], K,
        chunk=cap.cfg.topk_chunk)
    inner = init[:, 1 : init.shape[1] - 1]
    ids_all, mask_all = assemble_clip_ids_substitute(
        inner, idxs, jnp.full((B,), col - 1),
        cap.tables["bridge_ids"], cap.tables["bridge_lens"],
        bos_id=cap.bridge.bos_id, eos_id=cap.bridge.eos_id,
        pad_id=cap.bridge.pad_id, clip_len=cap.cfg.clip_len)

    cap._ensure_stage1_calibration()
    cap._ensure_ctl_tables()
    wcal = cap.tables["stage1_wcal"]
    tcfg = dataclasses.replace(cap.clip_model.config.text, num_layers=1)
    tower = CLIPTextTower(tcfg, dtype=cap.clip_model.dtype)
    tparams = truncated_text_params(cap.params["clip"], 1)
    L = ids_all.shape[-1]
    pooled = tower.apply({"params": tparams},
                         ids_all.reshape(B * K, L),
                         mask_all.reshape(B * K, L))
    s1 = (pooled.astype(jnp.float32) @ wcal).reshape(B, K, -1)
    s1 = s1 / (jnp.linalg.norm(s1, axis=-1, keepdims=True) + 1e-6)
    img_n = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
    s1_scores = jnp.einsum("bkd,bd->bk", s1, img_n)

    # candidate full BERT rows (substitution at col)
    S = init.shape[1]
    rows = jnp.broadcast_to(init[:, None, :], (B, K, S))
    oh = (jnp.arange(S)[None, :] == jnp.full((B, 1), col))
    rows = jnp.where(oh[:, None, :], idxs[:, :, None], rows)

    rank = s1_scores
    if ctl_rank:
        rank = energies.stage1_ctl_rank(
            s1_scores, top_probs, idxs, rows,
            ctl="sentiment", negative=negative, seq_len=S,
            logit_scale=cap.params["clip"]["logit_scale"],
            alpha=jnp.float32(0.02), beta=jnp.float32(2.0),
            gamma=jnp.float32(gamma),
            senti=cap.tables["senti"],
            bridge_lens=cap.tables["bridge_lens"])
    _, keep = jax.lax.top_k(rank, PK)
    idxs_kept = jnp.take_along_axis(idxs, keep, axis=1)
    probs_kept = jnp.take_along_axis(top_probs, keep, axis=1)
    rows_kept = jnp.take_along_axis(rows, keep[:, :, None], axis=1)
    ids_kept = jnp.take_along_axis(ids_all, keep[:, :, None], axis=1)
    mask_kept = jnp.take_along_axis(mask_all, keep[:, :, None], axis=1)

    emb_full = cap.clip_model.apply(
        {"params": cap.params["clip"]},
        ids_kept.reshape(B * PK, L), mask_kept.reshape(B * PK, L),
        method=CLIPModel.encode_text)
    clip_probs, _ = cap.clip_model.apply(
        {"params": cap.params["clip"]}, embeds, emb_full,
        method=CLIPModel.similarity)
    ctl_score = energies.sentiment_scores(
        rows_kept, cap.tables["senti"], negative=negative)
    ctl_probs = energies.sentiment_probs(ctl_score)
    penalty = energies.repeat_penalty(idxs_kept, rows_kept)
    final = energies.combine_scores(
        probs_kept, clip_probs, jnp.float32(0.02), jnp.float32(2.0),
        ctl_probs=ctl_probs, gamma=jnp.float32(gamma), penalty=penalty)
    sel = jnp.argmax(final, axis=1)
    return np.asarray(
        jnp.take_along_axis(idxs_kept, sel[:, None], axis=1))[:, 0]


@pytest.mark.parametrize("mode", ["auto", "off"])
def test_factorized_ctl_engine_matches_recomposed_oracle(cap, mode):
    """The engine's sentiment-controlled factorized-pruned commit equals
    the recomposition — with the ctl-aware rank under "auto" (the r5
    default) and the cosine-only cut under "off" (the r4 program)."""
    B = 3
    rng = np.random.RandomState(0)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(B, D).astype(np.float32))
    cap.cfg.prune_stage1_ctl = mode
    try:
        res = cap.run(embeds, prompt="Image of a", max_len=1, top_k=16,
                      temperature=0.1, max_iter=1, alpha=0.02, beta=2.0,
                      gamma=5.0, order="sequential", ctl="sentiment",
                      rng=np.random.RandomState(7), prune_k=4)
    finally:
        cap.cfg.prune_stage1_ctl = "auto"
    got = np.asarray(res.iter_ids[-1])[:, cap.seed_len("Image of a")]
    expected = _recomposed_step(
        cap, embeds, gamma=5.0, ctl_rank=(mode != "off"))
    np.testing.assert_array_equal(got, expected)


def test_ctl_rank_changes_the_cut_here(cap):
    """Sanity that THIS fixture's oracle actually distinguishes the two
    rank modes at gamma=5 (otherwise the parametrized oracle test above
    would vacuously pass both ways)."""
    B = 3
    rng = np.random.RandomState(0)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(B, D).astype(np.float32))
    on = _recomposed_step(cap, embeds, gamma=5.0, ctl_rank=True)
    off = _recomposed_step(cap, embeds, gamma=5.0, ctl_rank=False)
    assert not np.array_equal(on, off)


def test_proxy_stage1_ctl_steers_committed_sentiment():
    """End-to-end steering: on the proxy pruned tier, the ctl-aware rank
    commits captions with strictly more requested-polarity valence than
    the cosine-only cut (the capability the r5 fix exists to restore).
    Deterministic at this seed; every candidate is proposable
    (top_k=vocab) so the cut is the only thing distinguishing runs."""
    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.dtype = "float32"
    cfg.param_dtype = "float32"
    cap = Captioner.from_random(cfg, init_mode="proper", seed=3)
    cap._ensure_ctl_tables()
    senti = np.asarray(cap.tables["senti"])
    rng = np.random.RandomState(11)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(4, D).astype(np.float32))
    kw = dict(prompt="Image of a", max_len=5, top_k=10_000,
              temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
              gamma=30.0, order="sequential", ctl="sentiment",
              prune_k=5)
    out = {}
    for mode in ("auto", "off"):
        cap.cfg.prune_stage1_ctl = mode
        res = cap.run(embeds, rng=np.random.RandomState(5), **kw)
        out[mode] = float(senti[np.asarray(res.iter_ids[-1])].sum())
    assert out["auto"] > out["off"], out


def test_exact_ctl_mode_uses_table_rank_at_stage1(monkeypatch):
    """ctl_mode="exact" + pruning: stage 1 still ranks with the TABLE
    ctl term (the exact host pipeline scores only the survivors), so the
    sampler must build the ctl tables even in exact mode — and flipping
    the rank off must change the trajectory (wiring proof)."""
    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.dtype = "float32"
    cfg.param_dtype = "float32"
    cfg.ctl_mode = "exact"
    cap = Captioner.from_random(cfg, init_mode="proper", seed=3)
    rng = np.random.RandomState(1)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(2, D).astype(np.float32))
    kw = dict(prompt="Image of a", max_len=4, top_k=10_000,
              temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
              gamma=30.0, order="sequential", ctl="sentiment",
              prune_k=4)
    cap.cfg.prune_stage1_ctl = "auto"
    res_on = cap.run(embeds, rng=np.random.RandomState(5), **kw)
    assert "senti" in cap.tables  # built despite ctl_mode="exact"
    cap.cfg.prune_stage1_ctl = "off"
    res_off = cap.run(embeds, rng=np.random.RandomState(5), **kw)
    assert not np.array_equal(np.asarray(res_on.iter_ids),
                              np.asarray(res_off.iter_ids))


def test_config_validates_stage1_ctl():
    cfg = ConzicConfig()
    cfg.prune_stage1_ctl = "sometimes"
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg.prune_stage1_ctl = "on"
    cfg.validate()


def test_free_runs_never_carry_the_flag():
    """ctl=None runs keep stage1_ctl=False in the spec even with
    prune_stage1_ctl="on" — the free tiers' measured programs must stay
    untouched."""
    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.prune_stage1_ctl = "on"
    cap = Captioner.from_random(cfg, init_mode="proper")
    spec = cap._spec(3, 4, 8, "single", None, False, prune_k=4)
    assert spec.stage1_ctl is False
    spec = cap._spec(3, 4, 8, "single", "sentiment", False, prune_k=4)
    assert spec.stage1_ctl is True
    spec = cap._spec(3, 4, 8, "single", "sentiment", False, prune_k=None)
    assert spec.stage1_ctl is False
