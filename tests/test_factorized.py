"""Factorized stage-1 (`--prune_stage1 factorized`): truncated-tower
candidate scoring + calibrated projection, exact-rescore of the top
prune_k (VERDICT r3 item 2; fidelity basis in FACTORIZED_FIDELITY.json).

The oracle test recomposes one engine step from the same primitives
OUTSIDE the engine (BERT probs -> top-k -> substitution assembly ->
truncated tower + W_cal -> stage-1 top-m -> full tower -> combined
score argmax) and pins the engine's committed token against it — the
wiring (selection flow, gathers, assembled-row reuse) is what it checks.
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


def test_factorized_tables_and_calibration(cap):
    cap._ensure_stage1_calibration(n_sentences=64)
    w = np.asarray(cap.tables["stage1_wcal"])
    H = cap.clip_model.config.text.hidden_size
    D = cap.clip_model.config.projection_dim
    assert w.shape == (H, D)
    # deterministic refit
    w2_meta = cap._stage1_meta
    cap._ensure_stage1_calibration(n_sentences=64)
    assert cap._stage1_meta == w2_meta
    np.testing.assert_array_equal(w, np.asarray(cap.tables["stage1_wcal"]))
    # layer-count change forces a refit
    cap.cfg.prune_stage1_layers = 1  # unchanged -> cached
    cap._ensure_stage1_calibration(n_sentences=64)
    np.testing.assert_array_equal(w, np.asarray(cap.tables["stage1_wcal"]))


def test_factorized_rejects_bad_configs(cap):
    full = cap.clip_model.config.text.num_layers
    cap.cfg.prune_stage1_layers = full
    with pytest.raises(ValueError):
        cap._ensure_stage1_calibration(n_sentences=16)
    cap.cfg.prune_stage1_layers = 1
    cfg = ConzicConfig()
    cfg.prune_stage1 = "factorized"
    cfg.prune_k = 4
    cfg.scan_layers = True
    with pytest.raises(AssertionError):
        cfg.validate()


def test_factorized_engine_matches_recomposed_oracle(cap):
    B, K = 3, 16
    prompt = "Image of a"
    rng = np.random.RandomState(0)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(B, D).astype(np.float32))

    res = cap.run(embeds, prompt=prompt, max_len=1, top_k=K,
                  temperature=0.1, max_iter=1, alpha=0.02, beta=2.0,
                  order="sequential", rng=np.random.RandomState(7),
                  prune_k=4)
    committed = np.asarray(res.iter_ids[-1])  # (B, S)
    seed_len = cap.seed_len(prompt)
    col = seed_len  # the single sentence slot
    got = committed[:, col]

    # ---- recompose the same step outside the engine ----
    init = jnp.asarray(cap.init_ids(prompt, 1, B))  # [MASK] at col already
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
    _, keep = jax.lax.top_k(s1_scores, 4)
    idxs_kept = jnp.take_along_axis(idxs, keep, axis=1)
    probs_kept = jnp.take_along_axis(top_probs, keep, axis=1)
    ids_kept = jnp.take_along_axis(ids_all, keep[:, :, None], axis=1)
    mask_kept = jnp.take_along_axis(mask_all, keep[:, :, None], axis=1)

    emb_full = cap.clip_model.apply(
        {"params": cap.params["clip"]},
        ids_kept.reshape(B * 4, L), mask_kept.reshape(B * 4, L),
        method=CLIPModel.encode_text)
    clip_probs, _cos = cap.clip_model.apply(
        {"params": cap.params["clip"]}, embeds, emb_full,
        method=CLIPModel.similarity)
    final = energies.combine_scores(
        probs_kept, clip_probs, jnp.float32(0.02), jnp.float32(2.0))
    sel = jnp.argmax(final, axis=1)
    expected = np.asarray(
        jnp.take_along_axis(idxs_kept, sel[:, None], axis=1))[:, 0]

    np.testing.assert_array_equal(got, expected)


def test_factorized_differs_from_proxy_and_uses_wcal_table(cap):
    B, K = 2, 24
    rng = np.random.RandomState(3)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(B, D).astype(np.float32))
    kw = dict(prompt="Image of a", max_len=5, top_k=K, temperature=0.1,
              max_iter=2, alpha=0.02, beta=2.0, order="sequential",
              prune_k=3)
    res_f = cap.run(embeds, rng=np.random.RandomState(5), **kw)
    # spec-filtered tables: the factorized program consumes the wcal
    # table and NOT the proxy's word_embeds
    cap.cfg.prune_stage1 = "proxy"
    try:
        res_p = cap.run(embeds, rng=np.random.RandomState(5), **kw)
    finally:
        cap.cfg.prune_stage1 = "factorized"
    assert not np.array_equal(np.asarray(res_f.iter_ids[-1]),
                              np.asarray(res_p.iter_ids[-1])), (
        "factorized and proxy stage-1 selected identical trajectories — "
        "wiring suspicious")


def test_tower_precut_engine_matches_recomposed_oracle():
    """--prune_stage1_precut_mode tower (the r5 two-stage cascade):
    shallow tower (1L + wcal_pc) cuts k -> m over the assembled rows,
    deeper tower (2L + wcal) cuts m -> prune_k, exact rescore —
    recomposed outside the engine and pinned. Needs a >=3-layer text
    tower (pc 1 < s1 2 < full), so it builds its own captioner."""
    import dataclasses as _dc

    from conzic_tpu.models.configs import CLIPConfig

    B, K, M, PK = 3, 16, 8, 4
    prompt = "Image of a"
    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.dtype = "float32"
    cfg.param_dtype = "float32"
    cfg.prune_k = PK
    cfg.prune_stage1 = "factorized"
    cfg.prune_stage1_layers = 2
    cfg.prune_stage1_precut = M
    cfg.prune_stage1_precut_mode = "tower"
    cfg.prune_stage1_precut_layers = 1
    clip_cfg = CLIPConfig.tiny()
    clip_cfg = _dc.replace(
        clip_cfg, text=_dc.replace(clip_cfg.text, num_layers=4))
    cap = Captioner.from_random(cfg, clip_config=clip_cfg,
                                init_mode="proper")
    rng = np.random.RandomState(4)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(B, D).astype(np.float32))

    res = cap.run(embeds, prompt=prompt, max_len=1, top_k=K,
                  temperature=0.1, max_iter=1, alpha=0.02, beta=2.0,
                  order="sequential", rng=np.random.RandomState(7),
                  prune_k=PK)
    wcal = cap.tables["stage1_wcal"]
    wcal_pc = cap.tables["stage1_wcal_pc"]
    committed = np.asarray(res.iter_ids[-1])
    col = cap.seed_len(prompt)
    got = committed[:, col]

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
    L = ids_all.shape[-1]
    img_n = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)

    def tower_scores(ids_a, mask_a, layers, w):
        tcfg = dataclasses.replace(
            cap.clip_model.config.text, num_layers=layers)
        tower = CLIPTextTower(tcfg, dtype=cap.clip_model.dtype)
        tparams = truncated_text_params(cap.params["clip"], layers)
        kk = ids_a.shape[1]
        pooled = tower.apply({"params": tparams},
                             ids_a.reshape(B * kk, L),
                             mask_a.reshape(B * kk, L))
        emb = (pooled.astype(jnp.float32) @ w).reshape(B, kk, -1)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)
        return jnp.einsum("bkd,bd->bk", emb, img_n)

    # stage 0: shallow tower over ALL K assembled rows
    _, keep0 = jax.lax.top_k(tower_scores(ids_all, mask_all, 1, wcal_pc), M)
    idxs_m = jnp.take_along_axis(idxs, keep0, axis=1)
    probs_m = jnp.take_along_axis(top_probs, keep0, axis=1)
    ids_m = jnp.take_along_axis(ids_all, keep0[:, :, None], axis=1)
    mask_m = jnp.take_along_axis(mask_all, keep0[:, :, None], axis=1)
    # stage 1: deeper tower over the m survivors' REUSED rows
    _, keep = jax.lax.top_k(tower_scores(ids_m, mask_m, 2, wcal), PK)
    idxs_kept = jnp.take_along_axis(idxs_m, keep, axis=1)
    probs_kept = jnp.take_along_axis(probs_m, keep, axis=1)
    ids_kept = jnp.take_along_axis(ids_m, keep[:, :, None], axis=1)
    mask_kept = jnp.take_along_axis(mask_m, keep[:, :, None], axis=1)
    emb_full = cap.clip_model.apply(
        {"params": cap.params["clip"]},
        ids_kept.reshape(B * PK, L), mask_kept.reshape(B * PK, L),
        method=CLIPModel.encode_text)
    clip_probs, _ = cap.clip_model.apply(
        {"params": cap.params["clip"]}, embeds, emb_full,
        method=CLIPModel.similarity)
    final = energies.combine_scores(
        probs_kept, clip_probs, jnp.float32(0.02), jnp.float32(2.0))
    sel = jnp.argmax(final, axis=1)
    expected = np.asarray(
        jnp.take_along_axis(idxs_kept, sel[:, None], axis=1))[:, 0]
    np.testing.assert_array_equal(got, expected)


def test_tower_precut_rejects_non_shallower_layers():
    cfg = ConzicConfig()
    cfg.prune_stage1 = "factorized"
    cfg.prune_k = 4
    cfg.prune_stage1_precut = 8
    cfg.prune_stage1_precut_mode = "tower"
    cfg.prune_stage1_layers = 2
    cfg.prune_stage1_precut_layers = 2
    with pytest.raises(AssertionError, match="SHALLOWER"):
        cfg.validate()
    cfg.prune_stage1_precut_layers = 1
    cfg.validate()


def _host_vs_callback_pruned(monkeypatch, *, stage1, final_exact=False,
                             ctl=None, precut=0, precut_mode="proxy",
                             stage1_layers=1, precut_layers=1,
                             clip_layers=0):
    """Pruned run, host-stepped vs pure_callback engine — byte-identical
    (host_exact prune_k support, VERDICT r3 weak #6)."""
    import dataclasses as _dc

    from conzic_tpu.engine import host_exact
    from conzic_tpu.models.configs import CLIPConfig

    clip_cfg = None
    if clip_layers:
        clip_cfg = CLIPConfig.tiny()
        clip_cfg = _dc.replace(
            clip_cfg, text=_dc.replace(clip_cfg.text,
                                       num_layers=clip_layers))
    results = {}
    for host in (False, True):
        cfg = ConzicConfig()
        cfg.verbose = False
        cfg.dtype = "float32"
        cfg.param_dtype = "float32"
        cfg.bridge_mode = "exact"
        cfg.prune_k = 3
        cfg.prune_stage1 = stage1
        cfg.prune_stage1_layers = stage1_layers
        cfg.prune_stage1_precut = precut
        cfg.prune_stage1_precut_mode = precut_mode
        cfg.prune_stage1_precut_layers = precut_layers
        cfg.prune_final_exact = final_exact
        c = Captioner.from_random(cfg, init_mode="proper", seed=11,
                                  clip_config=clip_cfg)
        monkeypatch.setattr(
            host_exact, "supports_host_callbacks", lambda h=host: not h
        )
        rng = np.random.RandomState(0)
        embeds = jnp.asarray(
            rng.randn(2, c.clip_model.config.projection_dim).astype(
                np.float32))
        results[host] = c.run(
            embeds, prompt="Image of a", max_len=4, top_k=8,
            temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
            gamma=5.0 if ctl else 0.0, order="sequential", ctl=ctl,
            prune_k=3)
    np.testing.assert_array_equal(
        results[False].iter_ids, results[True].iter_ids)
    np.testing.assert_allclose(
        results[False].best_cos, results[True].best_cos, rtol=0, atol=1e-5)
    assert results[False].gen_texts_list == results[True].gen_texts_list


def test_host_stepped_pruned_proxy_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="proxy")


def test_host_stepped_pruned_factorized_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="factorized")


def test_host_stepped_pruned_hybrid_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="proxy", final_exact=True)


def test_host_stepped_ctl_proxy_matches_callback(monkeypatch):
    """Controlled pruned runs engage the ctl-aware stage-1 rank
    (stage1_ctl auto, r5) — host-stepped and callback engines must agree
    byte-for-byte through the new rank path (proxy cut)."""
    _host_vs_callback_pruned(monkeypatch, stage1="proxy", ctl="sentiment")


def test_host_stepped_ctl_factorized_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="factorized", ctl="pos")


def test_host_stepped_ctl_tower_cascade_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="factorized", precut=5,
                             precut_mode="tower", stage1_layers=2,
                             precut_layers=1, clip_layers=4,
                             ctl="sentiment")


def test_cascade_precut_engine_matches_recomposed_oracle(cap):
    """--prune_stage1_precut m: proxy k->m, truncated tower m->prune_k,
    exact rescore — recomposed outside the engine and pinned."""
    B, K, M, PK = 3, 16, 8, 4
    prompt = "Image of a"
    rng = np.random.RandomState(1)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(B, D).astype(np.float32))

    cap.cfg.prune_stage1_precut = M
    try:
        res = cap.run(embeds, prompt=prompt, max_len=1, top_k=K,
                      temperature=0.1, max_iter=1, alpha=0.02, beta=2.0,
                      order="sequential", rng=np.random.RandomState(7),
                      prune_k=PK)
    finally:
        cap.cfg.prune_stage1_precut = 0
    committed = np.asarray(res.iter_ids[-1])
    col = cap.seed_len(prompt)
    got = committed[:, col]

    init = jnp.asarray(cap.init_ids(prompt, 1, B))
    bert_logits = cap.bert_model.apply(
        {"params": cap.params["bert"]}, init)[:, col, :]
    probs = energies.masked_lm_probs(
        bert_logits, cap.tables["mask_last"], jnp.float32(0.1))
    top_probs, idxs = energies.topk_candidates(
        probs, cap.tables["mask_last"][None, :], K,
        chunk=cap.cfg.topk_chunk)
    # proxy pre-cut (masked base row -> exclude_slot=False, as the
    # engine's sequential order)
    cap._ensure_word_embeds()
    proxy = energies.prune_proxy_scores(
        cap.tables["word_embeds"], init, jnp.full((B,), col, jnp.int32),
        idxs, embeds, init.shape[1], exclude_slot=False)
    _, keep0 = jax.lax.top_k(proxy, M)
    idxs_m = jnp.take_along_axis(idxs, keep0, axis=1)
    probs_m = jnp.take_along_axis(top_probs, keep0, axis=1)
    inner = init[:, 1 : init.shape[1] - 1]
    ids_all, mask_all = assemble_clip_ids_substitute(
        inner, idxs_m, jnp.full((B,), col - 1),
        cap.tables["bridge_ids"], cap.tables["bridge_lens"],
        bos_id=cap.bridge.bos_id, eos_id=cap.bridge.eos_id,
        pad_id=cap.bridge.pad_id, clip_len=cap.cfg.clip_len)
    cap._ensure_stage1_calibration()
    wcal = cap.tables["stage1_wcal"]
    tcfg = dataclasses.replace(cap.clip_model.config.text, num_layers=1)
    tower = CLIPTextTower(tcfg, dtype=cap.clip_model.dtype)
    tparams = truncated_text_params(cap.params["clip"], 1)
    L = ids_all.shape[-1]
    pooled = tower.apply({"params": tparams},
                         ids_all.reshape(B * M, L),
                         mask_all.reshape(B * M, L))
    s1 = (pooled.astype(jnp.float32) @ wcal).reshape(B, M, -1)
    s1 = s1 / (jnp.linalg.norm(s1, axis=-1, keepdims=True) + 1e-6)
    img_n = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
    _, keep = jax.lax.top_k(jnp.einsum("bkd,bd->bk", s1, img_n), PK)
    idxs_kept = jnp.take_along_axis(idxs_m, keep, axis=1)
    probs_kept = jnp.take_along_axis(probs_m, keep, axis=1)
    ids_kept = jnp.take_along_axis(ids_all, keep[:, :, None], axis=1)
    mask_kept = jnp.take_along_axis(mask_all, keep[:, :, None], axis=1)
    emb_full = cap.clip_model.apply(
        {"params": cap.params["clip"]},
        ids_kept.reshape(B * PK, L), mask_kept.reshape(B * PK, L),
        method=CLIPModel.encode_text)
    clip_probs, _ = cap.clip_model.apply(
        {"params": cap.params["clip"]}, embeds, emb_full,
        method=CLIPModel.similarity)
    final = energies.combine_scores(
        probs_kept, clip_probs, jnp.float32(0.02), jnp.float32(2.0))
    sel = jnp.argmax(final, axis=1)
    expected = np.asarray(
        jnp.take_along_axis(idxs_kept, sel[:, None], axis=1))[:, 0]
    np.testing.assert_array_equal(got, expected)


def test_cascade_rejects_precut_not_exceeding_prune_k():
    cfg = ConzicConfig()
    cfg.prune_stage1 = "factorized"
    cfg.prune_k = 4
    cfg.prune_stage1_precut = 4
    with pytest.raises(AssertionError):
        cfg.validate()
    cfg.prune_stage1 = "proxy"
    cfg.prune_stage1_precut = 8
    with pytest.raises(AssertionError):
        cfg.validate()


def test_host_stepped_cascade_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="factorized", precut=5)


def test_host_stepped_tower_cascade_matches_callback(monkeypatch):
    _host_vs_callback_pruned(monkeypatch, stage1="factorized", precut=5,
                             precut_mode="tower", stage1_layers=2,
                             precut_layers=1, clip_layers=4)


def test_auto_layer_selection_resolves_and_caches(cap):
    """--prune_stage1_layers 0: auto-select the smallest depth clearing
    the calibration pass band (floor 2), sticky-resolved into cfg."""
    cap.cfg.prune_stage1_layers = 0
    cap._stage1_meta = None
    try:
        cap._ensure_stage1_calibration(n_sentences=96)
        chosen = cap.cfg.prune_stage1_layers
        full = cap.clip_model.config.text.num_layers
        assert min(2, full - 1) <= chosen < full
        assert 0.0 < cap.stage1_calib_cos <= 1.0
        w = np.asarray(cap.tables["stage1_wcal"])
        # resolved value re-enters as a cache hit (no refit)
        cap._ensure_stage1_calibration(n_sentences=96)
        np.testing.assert_array_equal(
            w, np.asarray(cap.tables["stage1_wcal"]))
        assert cap.cfg.prune_stage1_layers == chosen
    finally:
        cap.cfg.prune_stage1_layers = 1
        cap._stage1_meta = None


def test_stage1_map_depth_mirrors_encode_chunking():
    """stage1_map_depth mirrors gibbs._encode_candidates' lax.map chunk
    arithmetic (rows = B * stage-1 width, chunked at clip_row_chunk)."""
    from types import SimpleNamespace

    from conzic_tpu.engine.sampler import stage1_map_depth

    def spec(k, precut, rc, pc_mode="proxy"):
        return SimpleNamespace(candidate_k=k, stage1_precut=precut,
                               clip_row_chunk=rc,
                               stage1_precut_mode=pc_mode)

    # no chunking / everything fits in one chunk -> depth 1
    assert stage1_map_depth(spec(200, 0, 0), 512) == 1
    assert stage1_map_depth(spec(200, 0, 200 * 512), 512) == 1
    # the measured-faulting program: B=512, k=200, rc=800 -> kc=1, 200 deep
    assert stage1_map_depth(spec(200, 0, 800), 512) == 200
    # the measured-good program: B=256, k=200, rc=1600 -> kc=6->5, 40 deep
    assert stage1_map_depth(spec(200, 0, 1600), 256) == 40
    # pre-cut shrinks the mapped width (the cascade's stage-1 encode
    # only sees m rows per position)
    assert stage1_map_depth(spec(200, 24, 800), 512) == 24
    # ...but a TOWER pre-cut itself encodes all k rows: the guard keys
    # on the full width
    assert stage1_map_depth(spec(200, 24, 800, "tower"), 512) == 200
    # kc adjusts down to a divisor of k, exactly like gibbs.py
    assert stage1_map_depth(spec(16, 0, 8), 3) == 8  # kc: 2 divides 16


def test_deep_stage1_guard_raises_and_allow_flag_overrides(cap, monkeypatch):
    """The device-fault guard (VERDICT r4 item 6): factorized runs whose
    candidate-encode lax.map exceeds the measured-safe depth raise a
    pointed ValueError naming the knobs; --allow_deep_stage1 runs them."""
    from conzic_tpu.engine import sampler

    rng = np.random.RandomState(2)
    D = cap.clip_model.config.projection_dim
    embeds = jnp.asarray(rng.randn(3, D).astype(np.float32))
    kw = dict(prompt="Image of a", max_len=1, top_k=16, temperature=0.1,
              max_iter=1, alpha=0.02, beta=2.0, order="sequential",
              prune_k=4)
    monkeypatch.setattr(sampler, "MAX_STAGE1_MAP_DEPTH", 4)
    old_rc = cap.cfg.clip_row_chunk
    cap.cfg.clip_row_chunk = 8  # B=3, k=16 -> kc=2 -> depth 8 > 4
    try:
        with pytest.raises(ValueError, match="measured-safe envelope"):
            cap.run(embeds, rng=np.random.RandomState(7), **kw)
        cap.cfg.allow_deep_stage1 = True
        res = cap.run(embeds, rng=np.random.RandomState(7), **kw)
        assert np.asarray(res.iter_ids[-1]).shape[0] == 3
    finally:
        cap.cfg.allow_deep_stage1 = False
        cap.cfg.clip_row_chunk = old_rc


def test_auto_select_band_is_the_warn_floor_and_admits_the_flagship():
    """The auto-select pass band and the runtime warning must share ONE
    floor (STAGE1_CALIB_FLOOR): a 0.92 auto band once silently rejected
    the flagship 2-of-12 depth, whose measured held-out cosine is 0.9166
    with end-to-end cells UNDER the 0.01 gate (PRUNING_MATRIX trained,
    fact17pc24). The floor must admit every measured under-gate depth
    and exclude the measured failing one (1-of-4 at 0.854)."""
    from conzic_tpu.engine import sampler

    assert sampler.STAGE1_CALIB_FLOOR <= 0.9166
    assert sampler.STAGE1_CALIB_FLOOR > 0.854
