"""Host-stepped exact-mode generation.

``bridge_mode="exact"`` / ``ctl_mode="exact"`` normally run the
reference's host-side steps (decode -> re-tokenize per candidate,
sentence-level NLTK tagging per candidate) as ``jax.pure_callback``s inside
the one compiled program (engine/gibbs). Some TPU runtimes (the axon PJRT
plugin here) do not support host callbacks; this module provides the same
semantics as an explicit host loop around jitted model steps:

  - fresh BERT forward per position (gen_utils.py:69) for the single-kind
    orders; the span order's ONE stale forward per span (gen_utils.py:165)
    and the parallel order's unmasked iteration-start forward
    (gen_utils.py:258) — the same quirks the compiled engine preserves;
  - candidate CLIP rows from the host bridge (gen_utils.py:75 +
    clip/clip.py:71-73) when ``exact_bridge``, else the on-device table
    assembly (so a ctl-exact run keeps the default bridge semantics);
  - control energies from the per-candidate sentence-level host pipeline
    (sentiments_classifer.py:14-32 / POS_classifier.py:6-31) when
    ``ctl_mode == "exact"``, else the device tables;
  - fused scoring and argmax commit.

Slower than the compiled engine (one device round-trip per position) but
byte-exact to the reference path — this is the parity/validation mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from conzic_tpu import energies
from conzic_tpu.engine.orders import SPAN_LEN
from conzic_tpu.models.bert import BertForMaskedLM
from conzic_tpu.models.clip import CLIPModel
from conzic_tpu.text.bridge import assemble_clip_ids


def supports_host_callbacks() -> bool:
    """The axon PJRT plugin rejects jax host callbacks (UNIMPLEMENTED:
    "axon_pjrt does not support host send/recv callbacks"). The plugin
    reports device.platform == "tpu"; it identifies itself in the PJRT
    platform version string."""
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in version.lower()


class _HostEngine:
    """Jitted device steps + host exact steps for one generation run."""

    def __init__(self, cap, spec, hyper, tables, B):
        self.cap = cap
        self.spec = spec
        self.hyper = hyper
        self.tables = tables
        self.B = B
        bert, clip = cap.bert_model, cap.clip_model
        params = cap.params
        k = spec.candidate_k
        zeros = jnp.zeros((), jnp.float32)
        senti = tables.get("senti", zeros)
        pos_tab = tables.get("pos", zeros)
        template = tables.get("template", zeros)
        bridge_lens = tables["bridge_lens"]
        bridge_ids = tables["bridge_ids"]
        self.host_bridge = (
            cap._get_host_bridge(spec.clip_len) if spec.exact_bridge else None
        )
        self.host_ctl = (
            cap._get_host_ctl(spec)
            if spec.ctl is not None and spec.ctl_mode == "exact"
            else None
        )

        @jax.jit
        def propose(ids, col, token_mask):
            """Fresh masked forward at per-row col -> (masked, probs, idxs)
            (gen_utils.py:69-72)."""
            rows = jnp.arange(B)
            masked = ids.at[rows, col].set(spec.mask_token_id)
            hidden = bert.apply(
                {"params": params["bert"]}, masked,
                pool_idx=col[:, None], method=BertForMaskedLM.hidden,
            )
            logits = bert.apply(
                {"params": params["bert"]}, hidden[:, 0],
                method=BertForMaskedLM.lm_head,
            )
            top_probs, idxs = _topk(logits, token_mask)
            return masked, top_probs, idxs

        @jax.jit
        def span_logits(ids, cols):
            """ONE stale forward for a whole (masked) span
            (gen_utils.py:165). cols: (n,) static-size span columns."""
            hidden = bert.apply(
                {"params": params["bert"]}, ids,
                pool_idx=jnp.broadcast_to(cols[None, :], (B, cols.shape[0])),
                method=BertForMaskedLM.hidden,
            )
            return bert.apply(
                {"params": params["bert"]}, hidden,
                method=BertForMaskedLM.lm_head,
            )  # (B, n, V)

        def _topk(logits, token_mask):
            probs = energies.masked_lm_probs(
                logits, token_mask, hyper["temperature"]
            )
            return energies.topk_candidates(probs, token_mask, k)

        @jax.jit
        def topk_from_logits(logits, token_mask):
            return _topk(logits, token_mask)

        @jax.jit
        def score(clip_ids, clip_mask, top_probs, cand, idxs, image_embeds,
                  host_ctl_scores):
            # candidate width from the input shape: the pruned tiers score
            # spec.prune_k survivors, the full tiers (and the hybrid's
            # final sweep) the full k — one jit, retraced per width
            kw = clip_ids.shape[1]
            text_embeds = clip.apply(
                {"params": params["clip"]},
                clip_ids.reshape(B * kw, -1),
                clip_mask.reshape(B * kw, -1),
                method=CLIPModel.encode_text,
            )
            clip_probs, cosine = clip.apply(
                {"params": params["clip"]}, image_embeds, text_embeds,
                method=CLIPModel.similarity,
            )
            ctl_probs = None
            penalty = None
            ctl_score = jnp.zeros((B, kw), jnp.float32)
            if spec.ctl is not None and spec.ctl_mode == "exact":
                ctl_score = host_ctl_scores
                if spec.ctl == "sentiment":
                    ctl_probs = energies.sentiment_probs(ctl_score)
                    penalty = energies.repeat_penalty(idxs, cand)
                else:
                    ctl_probs = energies.pos_probs(ctl_score)
            elif spec.ctl == "sentiment":
                ctl_score = energies.sentiment_scores(
                    cand, senti, negative=spec.negative
                )
                ctl_probs = energies.sentiment_probs(ctl_score)
                penalty = energies.repeat_penalty(idxs, cand)
            elif spec.ctl == "pos":
                inner = cand[:, :, 1 : spec.seq_len - 1]
                word_valid = (bridge_lens[inner] > 0).astype(jnp.int32)
                ctl_score = energies.pos_accuracy(
                    inner, pos_tab, template, word_valid
                )
                ctl_probs = energies.pos_probs(ctl_score)
            final = energies.combine_scores(
                top_probs, clip_probs, hyper["alpha"], hyper["beta"],
                ctl_probs=ctl_probs, gamma=hyper["gamma"], penalty=penalty,
            )
            sel = jnp.argmax(final, axis=1)
            chosen = jnp.take_along_axis(idxs, sel[:, None], axis=1)[:, 0]
            cos_sel = jnp.take_along_axis(cosine, sel[:, None], axis=1)[:, 0]
            ctl_sel = jnp.take_along_axis(ctl_score, sel[:, None], axis=1)[:, 0]
            return chosen, cos_sel, ctl_sel

        @jax.jit
        def table_bridge(inner):
            """Default on-device bridge assembly for ctl-exact runs that
            keep bridge_mode='table'."""
            return assemble_clip_ids(
                inner, bridge_ids, bridge_lens,
                bos_id=spec.clip_bos_id, eos_id=spec.clip_eos_id,
                pad_id=spec.clip_pad_id, clip_len=spec.clip_len,
            )

        # stage-1 pruning (gibbs._position_update semantics), host-stepped:
        # exact-bridge/exact-ctl audits of the pruned tiers need this on
        # callback-free backends (VERDICT r3 weak #6)
        self.prune_keep = None
        self.s1_score = None
        self.s1_pc_score = None
        self.stage1_rank = None
        if spec.stage1_ctl and spec.ctl is not None:
            # control-aware stage-1 ranking (gibbs._stage1_rank): the
            # full combine over the current candidate set, table ctl term
            # even under ctl_mode="exact" (stage 1 is a surrogate)
            @jax.jit
            def stage1_rank(surr, top_probs_k, idxs_k, cand_rows):
                return energies.stage1_ctl_rank(
                    surr, top_probs_k, idxs_k, cand_rows,
                    ctl=spec.ctl, negative=spec.negative,
                    seq_len=spec.seq_len,
                    logit_scale=params["clip"]["logit_scale"],
                    alpha=hyper["alpha"], beta=hyper["beta"],
                    gamma=hyper["gamma"],
                    senti=senti, pos_table=pos_tab, template=template,
                    bridge_lens=bridge_lens,
                )

            self.stage1_rank = stage1_rank
        if spec.prune_k is not None and spec.prune_k < k:
            # the proxy cut: to prune_k directly (proxy stage-1) or to the
            # cascade's intermediate width m (factorized PROXY precut);
            # the TOWER precut replaces the proxy with a shallow
            # truncated-tower rank over the assembled rows (below)
            if spec.prune_stage1 == "factorized":
                proxy_width = (
                    0 if spec.stage1_precut_mode == "tower"
                    else spec.stage1_precut
                )
            else:
                proxy_width = spec.prune_k
            if proxy_width and proxy_width < k:
                word_embeds = tables["word_embeds"]
                rank = self.stage1_rank

                @jax.jit
                def prune_keep(base_ids, col, idxs, top_probs,
                               image_embeds):
                    proxy = energies.prune_proxy_scores(
                        word_embeds, base_ids, col, idxs, image_embeds,
                        spec.seq_len,
                        exclude_slot=spec.order_kind == "parallel",
                    )
                    if rank is not None:
                        kk = idxs.shape[1]
                        Bk = base_ids.shape[0]
                        rows = jnp.broadcast_to(
                            base_ids[:, None, :],
                            (Bk, kk, base_ids.shape[1]))
                        oh = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (base_ids.shape[1],), 0)[None, :]
                            == col[:, None]
                        )
                        rows = jnp.where(
                            oh[:, None, :], idxs[:, :, None], rows)
                        proxy = rank(proxy, top_probs, idxs, rows)
                    _, keep = jax.lax.top_k(proxy, proxy_width)
                    return keep

                self.prune_keep = prune_keep
            if spec.prune_stage1 == "factorized":
                import dataclasses as _dc

                from conzic_tpu.models.clip import (
                    CLIPTextTower,
                    truncated_text_params,
                )

                def make_s1(layers, wcal):
                    tcfg = _dc.replace(
                        clip.config.text, num_layers=layers)
                    tower = CLIPTextTower(tcfg, dtype=clip.dtype,
                                          attn_impl=clip.attn_impl,
                                          quant=clip.quant)
                    tparams = truncated_text_params(
                        params["clip"], layers)

                    @jax.jit
                    def s1_score(clip_ids, clip_mask, image_embeds):
                        """(B, k, L) assembled rows -> (B, k) stage-1
                        cosines (truncated tower + calibrated
                        projection)."""
                        kk, L = clip_ids.shape[1], clip_ids.shape[2]
                        pooled = tower.apply(
                            {"params": tparams},
                            clip_ids.reshape(B * kk, L),
                            clip_mask.reshape(B * kk, L),
                        )
                        emb = (pooled.astype(jnp.float32) @ wcal).reshape(
                            B, kk, -1)
                        emb = emb / (
                            jnp.linalg.norm(emb, axis=-1, keepdims=True)
                            + 1e-6)
                        img = image_embeds.astype(jnp.float32)
                        img = img / jnp.linalg.norm(
                            img, axis=-1, keepdims=True)
                        return jnp.einsum("bkd,bd->bk", emb, img)

                    return s1_score

                self.s1_score = make_s1(
                    spec.stage1_layers, tables["stage1_wcal"])
                if (spec.stage1_precut
                        and spec.stage1_precut_mode == "tower"):
                    self.s1_pc_score = make_s1(
                        spec.stage1_precut_layers,
                        tables["stage1_wcal_pc"])

        self.propose = propose
        self.span_logits = span_logits
        self.topk_from_logits = topk_from_logits
        self.score = score
        self.table_bridge = table_bridge
        self.k = k

    def token_mask_np(self, pos):
        """(B,) positions -> (B, V) numpy mask ('.' only at the last slot;
        the parallel order never updates it — handled by the caller)."""
        return np.where(
            (pos == self.spec.sentence_len - 1)[:, None],
            np.asarray(self.tables["mask_last"])[None, :],
            np.asarray(self.tables["mask_mid"])[None, :],
        )

    def _assemble(self, cand):
        """(B, k', S) candidate rows -> assembled CLIP (ids, mask) via the
        host bridge (exact mode) or the on-device table form."""
        inner = cand[:, :, 1 : self.spec.seq_len - 1]
        if self.host_bridge is not None:
            clip_ids, clip_mask = self.host_bridge(inner)
            return jnp.asarray(clip_ids), jnp.asarray(clip_mask)
        return self.table_bridge(jnp.asarray(inner))

    def update(self, base_ids, commit_ids, pos, top_probs, idxs,
               image_embeds, prune=True):
        """Score candidates at per-row ``pos`` built from ``base_ids``
        and commit the argmax into ``commit_ids`` (host copy of
        gibbs._position_update). ``prune=False`` disables the stage-1
        cut for this step (the hybrid final_exact sweep)."""
        spec, B, k = self.spec, self.B, self.k
        col = spec.seed_len + pos
        idxs_np = np.asarray(idxs)
        top_probs_np = np.asarray(top_probs)
        prune_on = (
            prune and spec.prune_k is not None and spec.prune_k < k
        )

        if prune_on and self.prune_keep is not None:
            # proxy cut BEFORE assembly (gibbs assembles only the
            # survivors): to prune_k (proxy stage-1) or to the cascade's
            # intermediate width (factorized precut)
            keep = np.asarray(self.prune_keep(
                jnp.asarray(base_ids), jnp.asarray(col),
                jnp.asarray(idxs_np), jnp.asarray(top_probs_np),
                image_embeds,
            ))
            idxs_np = np.take_along_axis(idxs_np, keep, axis=1)
            top_probs_np = np.take_along_axis(top_probs_np, keep, axis=1)
            k = idxs_np.shape[1]

        def build_cand(ids_k):
            kk = ids_k.shape[1]
            c = np.repeat(np.asarray(base_ids)[:, None, :], kk, axis=1)
            c[
                np.arange(B)[:, None], np.arange(kk)[None, :], col[:, None]
            ] = ids_k
            return c

        cand = build_cand(idxs_np)
        clip_ids, clip_mask = self._assemble(cand)

        if prune_on and self.s1_pc_score is not None:
            # tower pre-cut: the SHALLOW truncated tower ranks all
            # assembled rows and the survivors' rows are reused (gibbs
            # gathers identically)
            pc = np.asarray(
                self.s1_pc_score(clip_ids, clip_mask, image_embeds))
            if self.stage1_rank is not None:
                pc = np.asarray(self.stage1_rank(
                    jnp.asarray(pc), jnp.asarray(top_probs_np),
                    jnp.asarray(idxs_np), jnp.asarray(cand)))
            keep = np.argsort(-pc, axis=1, kind="stable")[
                :, : spec.stage1_precut]
            idxs_np = np.take_along_axis(idxs_np, keep, axis=1)
            top_probs_np = np.take_along_axis(top_probs_np, keep, axis=1)
            cand = np.take_along_axis(cand, keep[:, :, None], axis=1)
            keep_j = jnp.asarray(keep)[:, :, None]
            clip_ids = jnp.take_along_axis(clip_ids, keep_j, axis=1)
            clip_mask = jnp.take_along_axis(clip_mask, keep_j, axis=1)
            k = spec.stage1_precut

        if prune_on and self.s1_score is not None:
            # factorized stage-1 scores ALL assembled rows, then the
            # survivors' rows are gathered (gibbs reuses them identically)
            s1 = np.asarray(self.s1_score(clip_ids, clip_mask, image_embeds))
            if self.stage1_rank is not None:
                s1 = np.asarray(self.stage1_rank(
                    jnp.asarray(s1), jnp.asarray(top_probs_np),
                    jnp.asarray(idxs_np), jnp.asarray(cand)))
            # mirror lax.top_k: descending, ties to the lower index
            keep = np.argsort(-s1, axis=1, kind="stable")[:, : spec.prune_k]
            idxs_np = np.take_along_axis(idxs_np, keep, axis=1)
            top_probs_np = np.take_along_axis(top_probs_np, keep, axis=1)
            cand = np.take_along_axis(cand, keep[:, :, None], axis=1)
            keep_j = jnp.asarray(keep)[:, :, None]
            clip_ids = jnp.take_along_axis(clip_ids, keep_j, axis=1)
            clip_mask = jnp.take_along_axis(clip_mask, keep_j, axis=1)
            k = spec.prune_k

        inner = cand[:, :, 1 : spec.seq_len - 1]
        ctl_scores = (
            jnp.asarray(self.host_ctl(inner))
            if self.host_ctl is not None
            else jnp.zeros((B, k), jnp.float32)
        )
        chosen, cos_sel, ctl_sel = self.score(
            clip_ids, clip_mask, jnp.asarray(top_probs_np),
            jnp.asarray(cand), jnp.asarray(idxs_np), image_embeds,
            ctl_scores,
        )
        out = np.asarray(commit_ids).copy()
        out[np.arange(B), col] = np.asarray(chosen)
        return out, np.asarray(cos_sel), np.asarray(ctl_sel)


def run_generation_host(cap, spec, image_embeds, init_ids, positions,
                        hyper, tables, span_sizes=None):
    """Reference-semantics generation with host exact steps.

    Args mirror the compiled engine's inputs; ``positions`` is the
    (iters, steps, B) single-kind schedule, the (iters, n_spans) span-start
    schedule (with ``span_sizes``), or the (iters, 1) parallel dummy.
    Returns the same tuple as ``gibbs.run_generation``.
    """
    B = init_ids.shape[0]
    # memoize the engine per captioner: its jitted steps bake spec, the
    # hyper scalars, and the table arrays in as closure constants, so a
    # fresh _HostEngine per call would re-trace (and cache-round-trip)
    # five full-model programs on every Captioner.run — ruinous for the
    # api/run.py batch loop on the axon backend, where this host-stepped
    # path is the only exact mode. Key on everything the closures bake.
    key = (
        spec, B,
        tuple(sorted((n, float(v)) for n, v in hyper.items())),
        tuple(sorted((n, id(v)) for n, v in tables.items())),
    )
    cache = getattr(cap, "_host_engine_cache", None)
    if cache is None:
        cache = cap._host_engine_cache = {}
    eng = cache.get(key)
    if eng is None:
        eng = cache[key] = _HostEngine(cap, spec, hyper, tables, B)
    ids = np.asarray(init_ids).copy()
    iters = positions.shape[0]
    iter_ids = np.zeros((iters, B, ids.shape[1]), np.int32)
    iter_cos = np.zeros((iters, B), np.float32)
    iter_ctl = np.zeros((iters, B), np.float32)
    best_cos = np.zeros((B,), np.float32)
    best_ids = ids.copy()

    for it in range(iters):
        cos = np.zeros((B,), np.float32)
        ctl = np.zeros((B,), np.float32)
        # hybrid (final_exact): the LAST iteration re-sweeps with full
        # k-candidate scoring — same schedule as gibbs.run_generation's
        # final_iteration
        prune_it = not (spec.final_exact and it == iters - 1)
        if spec.order_kind == "single":
            for s in range(positions.shape[1]):
                pos = np.asarray(positions[it, s])
                token_mask = eng.token_mask_np(pos)
                masked, top_probs, idxs = eng.propose(
                    jnp.asarray(ids), jnp.asarray(spec.seed_len + pos),
                    jnp.asarray(token_mask),
                )
                ids, cos, ctl = eng.update(
                    np.asarray(masked), np.asarray(masked), pos,
                    top_probs, idxs, image_embeds, prune=prune_it,
                )
        elif spec.order_kind == "span":
            for s in range(positions.shape[1]):
                start = int(positions[it, s])
                size = int(span_sizes[it, s])
                offs = np.arange(SPAN_LEN, dtype=np.int32)
                cols = spec.seed_len + start + offs
                # mask the whole (valid part of the) span, then ONE stale
                # forward reused for every in-span position
                # (gen_utils.py:164-169)
                ids[:, cols[:size]] = spec.mask_token_id
                logits_span = eng.span_logits(
                    jnp.asarray(ids), jnp.asarray(cols)
                )
                for j in range(size):
                    pos = np.full((B,), start + j, np.int32)
                    token_mask = eng.token_mask_np(pos)
                    top_probs, idxs = eng.topk_from_logits(
                        logits_span[:, j], jnp.asarray(token_mask)
                    )
                    ids, cos, ctl = eng.update(
                        ids, ids, pos, top_probs, idxs, image_embeds,
                        prune=prune_it,
                    )
        elif spec.order_kind == "parallel":
            base = ids.copy()  # candidates built from iteration-start rows
            sent_cols = spec.seed_len + np.arange(
                spec.sentence_len, dtype=np.int32
            )
            # one UNMASKED forward (gen_utils.py:258 — quirk preserved);
            # the token mask is never position-updated ('.' allowed
            # everywhere, PARITY.md)
            logits_all = eng.span_logits(
                jnp.asarray(ids), jnp.asarray(sent_cols)
            )
            mask_last = np.broadcast_to(
                np.asarray(tables["mask_last"])[None, :],
                (B, np.asarray(tables["mask_last"]).shape[0]),
            )
            for kk in range(spec.sentence_len):
                pos = np.full((B,), kk, np.int32)
                top_probs, idxs = eng.topk_from_logits(
                    logits_all[:, kk], jnp.asarray(mask_last)
                )
                ids, cos, ctl = eng.update(
                    base, ids, pos, top_probs, idxs, image_embeds,
                    prune=prune_it,
                )
        else:
            raise ValueError(spec.order_kind)
        iter_ids[it] = ids
        iter_cos[it] = cos
        iter_ctl[it] = ctl
        improved = best_cos < cos
        best_cos = np.where(improved, cos, best_cos)
        best_ids = np.where(improved[:, None], ids, best_ids)
    return iter_ids, iter_cos, iter_ctl, best_ids, best_cos
