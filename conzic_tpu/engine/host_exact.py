"""Host-stepped exact-bridge generation.

``bridge_mode="exact"`` normally runs the reference's decode->re-tokenize
as a ``jax.pure_callback`` inside the one compiled program (engine/gibbs).
Some TPU runtimes (the axon PJRT plugin here) do not support host
callbacks; this module provides the same semantics as an explicit host
loop around jitted model steps: fresh BERT forward per position
(gen_utils.py:69), host ``batch_decode`` + CLIP re-tokenize per candidate
(gen_utils.py:75 + clip/clip.py:71-73), fused scoring and argmax commit.

Slower than the compiled engine (one device round-trip per position) but
byte-exact to the reference path — this is the parity/validation mode.
Supports the ``single``-kind orders (sequential/shuffle/random) and both
control energies; span/parallel exact runs require a callback-capable
backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from conzic_tpu import energies
from conzic_tpu.models.bert import BertForMaskedLM
from conzic_tpu.models.clip import CLIPModel


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


def run_generation_host(cap, spec, image_embeds, init_ids, positions,
                        hyper, tables):
    """Reference-semantics generation with host candidate assembly.

    Args mirror the compiled engine's inputs; ``positions`` is the
    (iters, steps, B) single-kind schedule. Returns the same tuple as
    ``gibbs.run_generation``.
    """
    if spec.order_kind != "single":
        raise NotImplementedError(
            "exact bridge mode on a backend without host callbacks "
            "supports sequential/shuffle/random orders only"
        )
    bert, clip = cap.bert_model, cap.clip_model
    params = cap.params
    B = init_ids.shape[0]
    k = spec.candidate_k

    @functools.partial(jax.jit, static_argnames=())
    def propose(ids, col, token_mask):
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
        probs = energies.masked_lm_probs(logits, token_mask,
                                         hyper["temperature"])
        top_probs, idxs = energies.topk_candidates(probs, token_mask, k)
        return masked, top_probs, idxs

    @jax.jit
    def score(clip_ids, clip_mask, top_probs, cand, idxs, image_embeds,
              senti, pos_tab, template, bridge_lens):
        text_embeds = clip.apply(
            {"params": params["clip"]},
            clip_ids.reshape(B * k, -1),
            clip_mask.reshape(B * k, -1),
            method=CLIPModel.encode_text,
        )
        clip_probs, cosine = clip.apply(
            {"params": params["clip"]}, image_embeds, text_embeds,
            method=CLIPModel.similarity,
        )
        ctl_probs = None
        penalty = None
        ctl_score = jnp.zeros((B, k), jnp.float32)
        if spec.ctl == "sentiment":
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

    host_bridge = cap._get_host_bridge(spec.clip_len)
    zeros = jnp.zeros((), jnp.float32)
    senti = tables.get("senti", zeros)
    pos_tab = tables.get("pos", zeros)
    template = tables.get("template", zeros)
    bridge_lens = tables["bridge_lens"]

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
        for s in range(positions.shape[1]):
            pos = np.asarray(positions[it, s])
            col = spec.seed_len + pos
            token_mask = np.where(
                (pos == spec.sentence_len - 1)[:, None],
                np.asarray(tables["mask_last"])[None, :],
                np.asarray(tables["mask_mid"])[None, :],
            )
            masked, top_probs, idxs = propose(
                jnp.asarray(ids), jnp.asarray(col), jnp.asarray(token_mask)
            )
            masked = np.array(masked)  # writable host copy
            idxs_np = np.asarray(idxs)
            cand = np.repeat(masked[:, None, :], k, axis=1)
            cand[
                np.arange(B)[:, None], np.arange(k)[None, :], col[:, None]
            ] = idxs_np
            inner = cand[:, :, 1 : spec.seq_len - 1]
            clip_ids, clip_mask = host_bridge(inner)
            chosen, cos_sel, ctl_sel = score(
                jnp.asarray(clip_ids), jnp.asarray(clip_mask), top_probs,
                jnp.asarray(cand), idxs, image_embeds,
                senti, pos_tab, template, bridge_lens,
            )
            ids = masked
            ids[np.arange(B), col] = np.asarray(chosen)
            cos, ctl = np.asarray(cos_sel), np.asarray(ctl_sel)
        iter_ids[it] = ids
        iter_cos[it] = cos
        iter_ctl[it] = ctl
        improved = best_cos < cos
        best_cos = np.where(improved, cos, best_cos)
        best_ids = np.where(improved[:, None], ids, best_ids)
    return iter_ids, iter_cos, iter_ctl, best_ids, best_cos
