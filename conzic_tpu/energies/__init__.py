"""Scoring energies as pure, fusable functions.

The reference combines its energies inline in five near-identical Python
loops (``/root/reference/gen_utils.py:77``,
``control_gen_utils.py:59,114,169``):

    final = alpha * lm_probs + beta * clip_probs
            [+ gamma * ctl_probs + 0.1 * (1 - exp(repeats))]

Here each term is a ``(B, K)`` pure function; XLA fuses the whole
combination + argmax into the surrounding program. Control terms are
device-side table gathers (see ``text/lexicons.py``) instead of per-sentence
NLTK calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_lm_probs(
    logits: jax.Array, token_mask: jax.Array, temperature: Optional[float]
) -> jax.Array:
    """softmax over the full vocab, then stop-word mask — the reference's
    exact order of operations (gen_utils.py:42-47: mask multiplies already-
    softmaxed probs, so the kept entries are NOT renormalized)."""
    logits = logits.astype(jnp.float32)
    if temperature is not None:
        logits = logits / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    return probs * token_mask


def _pure_dp_rows(mesh, batch: int) -> bool:
    """True when ``mesh`` is a pure data-parallel layout whose data axis
    divides ``batch`` — the regime where row-local ops must be computed
    under shard_map to keep the program collective-free (TP meshes
    legitimately collect over their model axis; mesh=None keeps the
    measured single-chip HLO untouched)."""
    if mesh is None or "data" not in mesh.axis_names:
        return False
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    return (
        axes.get("data", 1) > 1
        and all(n == "data" or s == 1 for n, s in axes.items())
        and batch % axes["data"] == 0
    )


def _shard_map_rows(fn, mesh):
    """shard_map ``fn`` over the data axis of a (B, ...) operand —
    byte-identical for row-local ``fn`` (no cross-row interaction)."""
    from jax.sharding import PartitionSpec

    spec_2d = PartitionSpec("data", None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=spec_2d,
        out_specs=(spec_2d, spec_2d), check_vma=False,
    )


def dp_local_top_k(scores: jax.Array, k: int, mesh=None):
    """``lax.top_k`` over (B, n) scores with the pure-DP mesh treatment:
    XLA lowers top_k to a TopK custom call the SPMD partitioner
    all-gathers batch-sharded operands around — observed even at (B, 8)
    proxy scores on the 8-device dryrun (the leak is the custom call,
    not the operand width; __graft_entry__._assert_dp_axis_collective_free
    caught the pruned tiers' cuts leaking after the wide-vocab fix).
    Row-local, so the shard_map form is byte-identical; mesh=None / TP
    meshes keep the plain call (single-chip HLO untouched)."""
    def _topk(s):
        v, i = jax.lax.top_k(s, k)
        return v, i

    if _pure_dp_rows(mesh, scores.shape[0]):
        return _shard_map_rows(_topk, mesh)(scores)
    return _topk(scores)


def exact_topk_2stage(probs: jax.Array, k: int, chunk: int = 4096):
    """Exact top-k over a large minor axis via per-chunk top-k + merge.

    Splitting into ~``chunk``-wide blocks is EXACT: every global top-k
    element is in its own block's top-k, and tie order is preserved —
    ``lax.top_k`` returns the lower index first among equal values,
    blocks are concatenated in index order, and the merge pass keeps
    first-occurrence among equals — so the result is identical to the
    single-call form, selection order included
    (tests/test_engine.py::test_exact_topk_2stage_identical_to_full_topk).

    MEASURED SLOWER end-to-end than the single TopK custom call on this
    toolchain (full tier 3.06 vs 3.09 caps/s, pruned 10.29 vs 10.66)
    despite the call showing ~420 us/position in traces — kept as a
    tested utility, NOT used by the engine.
    """
    B, V = probs.shape
    if chunk <= 0:  # 0 disables chunking, like the sibling knobs
        return jax.lax.top_k(probs, k)
    n_chunks = V // chunk
    if n_chunks < 2 or k > chunk // 2:
        return jax.lax.top_k(probs, k)
    pad = (-V) % n_chunks
    if pad:
        probs = jnp.pad(
            probs, ((0, 0), (0, pad)),
            constant_values=jnp.finfo(probs.dtype).min,
        )
    Vc = (V + pad) // n_chunks
    # NOTE: on 3-D input this lowers to a batched sort (~1.9 ms/position
    # at B=128) rather than the TopK custom call — and that is FASTER
    # than reshaping to 2-D to engage the call (52.5 vs 51.8 caps/s at
    # prune5/B=128); keep the 3-D form
    v1, i1 = jax.lax.top_k(probs.reshape(B, n_chunks, Vc), k)  # (B, C, k)
    gi = i1 + (jnp.arange(n_chunks, dtype=i1.dtype) * Vc)[None, :, None]
    v2, sel = jax.lax.top_k(v1.reshape(B, n_chunks * k), k)
    idxs = jnp.take_along_axis(gi.reshape(B, n_chunks * k), sel, axis=-1)
    return v2, idxs


def topk_candidates(probs: jax.Array, token_mask: jax.Array, k: int,
                    chunk: int = 4096, mode: str = "exact",
                    recall: float = 0.95,
                    banned_ids: Optional[jax.Array] = None,
                    mesh=None):
    """Top-k of masked probs; candidate ids with zero mask collapse to 0
    ([PAD]) exactly like the reference's ``(idxs * mask[idxs]).long()``
    (gen_utils.py:72). ``token_mask`` may be (V,) or per-row (B, V).

    The top-k itself: XLA's single TopK custom call wins up to B=64
    (measured, prune5 caps/s single-call vs chunked: B=32 full tier
    3.09/3.06; B=64 47.3/42.9; B=128 51.0/52.5 — the call costs
    2.77 ms/position there, 18% of the runtime; B=256 51.8/50.3).
    The chunked form wins only in a WINDOW around B=128 — the single
    call is faster again at B=256 — so the gate is the measured window,
    not open-ended (ADVICE r2). Both forms are exact (identical results
    incl. tie order, tests/test_engine.py).

    ``mode="approx"`` (NON-parity, pruned-tier-only lever) swaps in the
    TPU-native ``jax.lax.approx_max_k`` PartialReduce with the given
    per-call ``recall_target`` — the candidate set may drop tail members
    of the exact top-k (on CPU backends the op lowers to exact sort, so
    recall is 1.0 there). The engine only permits this together with
    ``prune_k``, whose proxy re-ranking already makes the tier
    approximate and quality-gated (PRUNING_MATRIX.json)."""
    def _topk(p):
        if mode == "approx":
            v, i = jax.lax.approx_max_k(
                p, k, recall_target=recall, aggregate_to_topk=True
            )
        elif 128 <= p.shape[0] < 256:
            v, i = exact_topk_2stage(p, k, chunk=chunk)
        else:
            v, i = jax.lax.top_k(p, k)
        return v, i  # normalized pytree (lax.top_k yields a list)

    # On a pure-DP mesh, XLA lowers top_k to a TopK custom call the
    # SPMD partitioner cannot partition: it all-gathers the batch-sharded
    # probs onto every device (observed at V=30522 AND at (B, 8) proxy
    # scores on the 8-device dryrun — the leak is the custom call itself,
    # not the operand width), breaking the zero-collective linear-scaling
    # property. top_k has no cross-row interaction, so computing each
    # device's rows locally under shard_map is byte-identical and keeps
    # the program collective-free. TP meshes (model axis > 1) keep the
    # default path: their vocab-dim sharding legitimately collects over
    # the model axis.
    if _pure_dp_rows(mesh, probs.shape[0]):
        top_probs, idxs = _shard_map_rows(_topk, mesh)(probs)
    else:
        top_probs, idxs = _topk(probs)
    if banned_ids is not None:
        # mask_impl="compare": the same {0,1} lookup computed WITHOUT the
        # f32[V] kCustom scalar-core gather (the pruned tier's largest
        # single op, 691 us x 150 calls at approx/B=256 — ROADMAP r4 #4):
        # membership of each selected id in the static banned-id list via
        # a broadcast compare + any-reduce, which XLA fuses on the vector
        # units. Exact: mask[idx] == 0 iff idx is in banned_ids; the -1
        # padding of the shorter list never matches a top-k id (ids >= 0),
        # so the {mid,last} lists can share one static shape. The 0.0-tie
        # regime (softmax underflow at T=0.1) is handled identically to
        # the gather: selection happened upstream, only the collapse-to-
        # [PAD] of banned winners (gen_utils.py:72) is computed here.
        # MEASURED END-TO-END LOSER at both target points (r3 s11, paired
        # same-VM fp controls): prune3/approx0.90/B=512 76.51 vs 82.26
        # (-7.0%), prune5/approx0.95/B=256 53.78 vs 55.21 (-2.6%) — the
        # (B, k, |banned|) broadcast compare costs more than the 691 us
        # gather it replaces, and the cost grows with batch. Kept as a
        # tested opt-in (--mask_impl compare); gather stays the default.
        # Do not re-measure blind (8th fusion-preservation instance).
        if banned_ids.ndim == 1:
            banned_ids = banned_ids[None, :]
        hit = jnp.any(idxs[:, :, None] == banned_ids[:, None, :], axis=-1)
        return top_probs, jnp.where(hit, 0, idxs).astype(jnp.int32)
    if token_mask.ndim == 1:
        gathered = token_mask[idxs]
    else:
        gathered = jnp.take_along_axis(token_mask, idxs, axis=-1)
    idxs = (idxs * gathered.astype(idxs.dtype)).astype(jnp.int32)
    return top_probs, idxs


def prune_proxy_scores(
    word_embeds: jax.Array,
    base_ids: jax.Array,
    col: jax.Array,
    cand_ids: jax.Array,
    image_embeds: jax.Array,
    seq_len: int,
    exclude_slot: bool = True,
) -> jax.Array:
    """Stage-1 pruning proxy: cos(image, normalize(bag(base words minus the
    edited slot) + w[cand])).

    The bag sums the per-word CLIP embeddings of the base row's inner
    tokens, then removes the edited slot's current word: in parallel order
    ``base_ids`` is the UNMASKED iteration-start row, so without the
    subtraction the proxy would score "old sentence + new word" while
    stage 2 scores rows with the old word replaced. For the masked orders
    the slot holds [MASK] whose table embedding is exact 0 (specials are
    zeroed in the table), so the subtraction is a byte-level no-op there.

    word_embeds: (V, D) per-vocab-word CLIP embeddings, specials exact 0.
    base_ids: (B, S); col: (B,) edited column; cand_ids: (B, K);
    image_embeds: (B, D). Returns (B, K) proxy cosines.
    """
    base_bag = jnp.sum(word_embeds[base_ids[:, 1 : seq_len - 1]], axis=1)
    if exclude_slot:
        # callers whose base row is MASKED at the slot may pass
        # exclude_slot=False as a compile-time optimization: the [MASK]
        # embedding is exact 0, so the subtraction is a byte-level no-op
        # there and skipping it keeps the hot pruned path's HLO free of
        # the extra gather+subtract (fusion-preservation lesson)
        old_at_slot = jnp.take_along_axis(base_ids, col[:, None], axis=1)
        base_bag = base_bag - word_embeds[old_at_slot[:, 0]]
    cand_vec = base_bag[:, None, :] + word_embeds[cand_ids]  # (B, K, D)
    cand_vec = cand_vec / (
        jnp.linalg.norm(cand_vec, axis=-1, keepdims=True) + 1e-6
    )
    img = image_embeds / jnp.linalg.norm(
        image_embeds, axis=-1, keepdims=True
    )
    return jnp.einsum("bkd,bd->bk", cand_vec, img.astype(cand_vec.dtype))


def stage1_ctl_rank(
    surr_cos: jax.Array,
    lm_probs: jax.Array,
    cand_ids: jax.Array,
    cand_rows: jax.Array,
    *,
    ctl: str,
    negative: bool,
    seq_len: int,
    logit_scale: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    gamma: jax.Array,
    senti: Optional[jax.Array] = None,
    pos_table: Optional[jax.Array] = None,
    template: Optional[jax.Array] = None,
    bridge_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Control-aware stage-1 pruning rank: the FULL combine over the
    current candidate set, with the stage-1 surrogate cosine standing in
    for the exact stage-2 cosine.

    Cosine-only stage-1 ranking structurally drops the control effect:
    the gamma term never sees the valence/POS words the control exists
    to promote, so the ctl speed tiers keep their Δcos bound while
    losing most of the measured steering (EVAL.md r5 — sentiment shift
    +2.40 at full parity collapses to +0.03 at fact50pc96). This rank
    mirrors the final energy (gen_utils.py:77 / control_gen_utils.py:59,
    114,169 semantics): ``alpha*lm + beta*softmax(scale*cos) +
    gamma*ctl_probs [+ repeat penalty]`` — softmaxes taken over the
    CURRENT candidate axis, the same monotone surrogate stage 2 applies
    to the survivors. The ctl term is always the device-table form, even
    under ctl_mode="exact" (stage 1 is already a surrogate; the exact
    host pipeline scores the survivors).

    surr_cos/lm_probs/cand_ids: (B, K); cand_rows: (B, K, S) full BERT
    rows with the candidate substituted. Returns the (B, K) rank score.
    """
    clip_probs = jax.nn.softmax(
        surr_cos.astype(jnp.float32) * jnp.exp(logit_scale), axis=-1
    )
    penalty = None
    if ctl == "sentiment":
        score = sentiment_scores(cand_rows, senti, negative=negative)
        ctl_probs = sentiment_probs(score)
        penalty = repeat_penalty(cand_ids, cand_rows)
    elif ctl == "pos":
        inner = cand_rows[:, :, 1 : seq_len - 1]
        word_valid = (bridge_lens[inner] > 0).astype(jnp.int32)
        score = pos_accuracy(inner, pos_table, template, word_valid)
        ctl_probs = pos_probs(score)
    else:
        raise ValueError(f"stage1_ctl_rank: unknown ctl {ctl!r}")
    return combine_scores(
        lm_probs, clip_probs, alpha, beta,
        ctl_probs=ctl_probs, gamma=gamma, penalty=penalty,
    )


def repeat_penalty(cand_ids: jax.Array, cand_rows: jax.Array) -> jax.Array:
    """``0.1 * (1 - exp(repeats))`` where repeats counts how often the
    candidate id already occurs in its (candidate-substituted) full row,
    minus one for itself (control_gen_utils.py:53,59).

    cand_ids: (B, K); cand_rows: (B, K, S) full BERT rows.
    """
    eq = (cand_ids[:, :, None] == cand_rows).astype(jnp.float32)
    repeats = jnp.sum(eq, axis=2) - 1.0
    return 0.1 * (1.0 - jnp.exp(repeats))


def sentiment_scores(
    cand_rows: jax.Array, senti_table: jax.Array, negative: bool
) -> jax.Array:
    """Sentence-level valence: sum of per-token valences over the row,
    sign-flipped for negative control (sentiments_classifer.py:30-32).

    cand_rows: (..., S) BERT ids (specials/pieces carry valence 0).
    """
    s = jnp.sum(senti_table[cand_rows], axis=-1)
    return -s if negative else s


def sentiment_probs(scores: jax.Array, temperature: float = 1.0) -> jax.Array:
    """softmax over candidates (sentiments_classifer.py:46-47; callers pass
    temperature=1)."""
    return jax.nn.softmax(scores / temperature, axis=-1)


def pos_accuracy(
    word_ids: jax.Array,
    pos_table: jax.Array,
    template: jax.Array,
    word_valid: jax.Array,
) -> jax.Array:
    """Template-match accuracy (POS_classifier.py:18-27).

    Args:
      word_ids: (..., W) BERT ids of the caption words in order
        (prompt words + sentence slots).
      pos_table: (V,) universal tag id per vocab token; id ``num_tags``
        reserved implicitly for "no word".
      template: (T, num_tags+1) binary accept matrix
        (lexicons.template_matrix).
      word_valid: (..., W) 1 where the slot holds a real word (specials /
        PAD slots tag as "no word", matching the reference's '' padding).

    Returns:
      (...,) accuracy = matched-slots / T over the first T words.
    """
    T, C = template.shape
    num_tags = C - 1
    tags = jnp.where(word_valid.astype(bool), pos_table[word_ids], num_tags)
    W = tags.shape[-1]
    if W < T:
        pad = jnp.full(tags.shape[:-1] + (T - W,), num_tags, tags.dtype)
        tags = jnp.concatenate([tags, pad], axis=-1)
    else:
        tags = tags[..., :T]
    slot = jnp.arange(T)
    match = template[slot, tags]  # (..., T) via broadcast gather
    return jnp.mean(match, axis=-1)


def pos_probs(acc: jax.Array, temperature: float = 0.1) -> jax.Array:
    """softmax(acc / 0.1) over candidates (control_gen_utils.py:167)."""
    return jax.nn.softmax(acc / temperature, axis=-1)


def combine_scores(
    lm_probs: jax.Array,
    clip_probs: jax.Array,
    alpha: jax.Array,
    beta: jax.Array,
    ctl_probs: Optional[jax.Array] = None,
    gamma: Optional[jax.Array] = None,
    penalty: Optional[jax.Array] = None,
) -> jax.Array:
    score = alpha * lm_probs + beta * clip_probs
    if ctl_probs is not None:
        score = score + gamma * ctl_probs
    if penalty is not None:
        score = score + penalty
    return score
