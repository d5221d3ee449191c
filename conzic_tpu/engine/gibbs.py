"""The Gibbs polishing engine — one XLA program per generation.

Reference behavior (``/root/reference/gen_utils.py:51-96`` and the
controlled variants in ``control_gen_utils.py``): for each iteration and
each position in a schedule, mask the position, take BERT's top-k proposals,
materialize k candidate sentences, score them with
``alpha * lm + beta * clip (+ gamma * ctl + repeat penalty)`` and commit the
argmax; track the best-by-cosine caption across iterations.

The rebuild runs the ENTIRE multi-iteration generation as one jit-compiled
program: ``lax.scan`` over iterations of ``lax.scan`` over positions, with

  - the masked-position BERT forward computing the vocab projection only at
    the masked slot(s) (the reference pays the full (B, S, 30522) logits
    every step, gen_utils.py:69);
  - the k-candidate expansion as a broadcast + scatter ((B, k, S) ids);
  - candidate CLIP sequences assembled on device via the BERT->CLIP bridge
    (no host decode/re-tokenize round-trip, cf. gen_utils.py:75-76);
  - one batched CLIP text forward of (B*k, clip_len) per position;
  - energy combination + argmax + commit fused by XLA.

Host code touches data only before (image encode, init ids, schedule) and
after (decode snapshots) the program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from conzic_tpu import energies
from conzic_tpu.engine.orders import SPAN_LEN
from conzic_tpu.models.bert import BertForMaskedLM
from conzic_tpu.models.clip import (
    CLIPModel,
    CLIPTextTower,
    truncated_text_params,
)
from conzic_tpu.text.bridge import (
    assemble_clip_ids,
    assemble_clip_ids_substitute,
)


@dataclasses.dataclass(frozen=True)
class EngineSpec:
    """Static (compile-time) engine parameters."""

    seed_len: int  # 1 + number of prompt tokens ([CLS] + prompt)
    sentence_len: int
    seq_len: int  # full BERT row length = seed_len + sentence_len + 1
    candidate_k: int
    clip_len: int
    mask_token_id: int
    clip_bos_id: int
    clip_eos_id: int
    clip_pad_id: int
    ctl: Optional[str] = None  # None | "sentiment" | "pos"
    negative: bool = False  # sentiment polarity
    # control-energy mode: "table" = per-token device tables (fast,
    # context-free approximation; text/lexicons.py); "exact" = the
    # reference's sentence-level NLTK pipeline per candidate, as a host
    # callback (sentiments_classifer.py:14-32, POS_classifier.py:6-31) —
    # the control analog of bridge_mode="exact"
    ctl_mode: str = "table"
    # jit-cache discriminator for exact POS control: JSON of the template
    # baked into the host callback (table mode passes the template as a
    # runtime array instead)
    ctl_key: str = ""
    order_kind: str = "single"  # single | span | parallel
    # opt-in two-stage scoring (NON-parity): pre-select prune_k of the k
    # candidates by a bag-of-CLIP-word-embeddings proxy before the full
    # text-tower pass — cuts hot-loop FLOPs ~k/prune_k at some quality cost
    prune_k: Optional[int] = None
    # hybrid pruned+exact schedule: with prune_k set, run the LAST
    # iteration (and its best-tracking) with FULL k-candidate scoring, so
    # the committed final caption is the product of a full-parity polish
    # sweep over the pruned state (quality-bounded speed tier; VERDICT r2)
    final_exact: bool = False
    # stage-1 scorer for prune_k: "proxy" (bag-of-embeddings) or
    # "factorized" — all k candidates are assembled and scored through the
    # first stage1_layers text-tower layers + the per-checkpoint
    # calibrated projection (tables["stage1_wcal"]); the top prune_k are
    # exact-rescored through the full tower. ~10x lower per-step
    # selection regret than the proxy on semantic weights
    # (FACTORIZED_FIDELITY.json) at ~k*stage1_layers/num_layers extra
    # candidate-encode cost.
    prune_stage1: str = "proxy"
    stage1_layers: int = 2
    # factorized cascade pre-cut: m > 0 = stage 0 cuts k -> m before the
    # truncated-tower encode (which then scores only m rows); the
    # truncated encode dominates the factorized tier's cost, so this is
    # its main throughput lever
    stage1_precut: int = 0
    # what stage 0 is: "proxy" (bag-of-embeddings — near-free but its
    # recall collapses at long contexts, BASELINE.md r4 len77 rows) or
    # "tower" (a SHALLOWER truncated tower + its own calibrated
    # projection tables["stage1_wcal_pc"] scores all k at
    # ~k*precut_layers/num_layers encode cost — the len77-capable
    # two-stage factorized cascade, VERDICT r4 item 2)
    stage1_precut_mode: str = "proxy"
    stage1_precut_layers: int = 1
    # control-aware stage-1 ranking (r5): rank every stage-1 cut (proxy,
    # truncated tower, and the cascade pre-cut) by the FULL combine —
    # alpha*lm + beta*softmax(scale*surrogate_cos) + gamma*ctl(+penalty)
    # — instead of the surrogate cosine alone. Cosine-only ranking
    # structurally drops the control effect (the gamma term never sees
    # the words the control promotes; measured: sentiment shift +2.40 at
    # full parity collapses to +0.03 at the cosine-ranked fact50pc96
    # tier, EVAL.md r5). Only meaningful with ctl set; the ctl term is
    # the device-table form even under ctl_mode="exact" (stage 1 is a
    # surrogate; the exact host pipeline scores the survivors).
    stage1_ctl: bool = False
    # exact prefix-KV reuse (see CLIPModel.encode_text_shared_prefix):
    # ((prefix_len, n_steps), ...) chunking of the per-iteration position
    # scan — each chunk's steps share a static lower bound on the candidates'
    # common CLIP prefix, whose K/V are computed once at batch width.
    # None disables. For span/parallel orders only chunk 0's prefix_len is
    # used (single compiled body per iteration).
    prefix_chunks: Optional[Tuple[Tuple[int, int], ...]] = None
    # candidate rows per CLIP text pass: B*k batches beyond ~2-3k rows hit
    # an XLA layout-copy regime (ROADMAP #1); larger batches are scanned in
    # chunks of <= this many rows. 0 disables.
    clip_row_chunk: int = 0
    # pad candidate rows from clip_len to this static length (extra PAD
    # columns, masked off — exact) before the text tower: probes whether a
    # lane/sublane-aligned S escapes the S>64 XLA copy regime that makes
    # clip_len=77 disproportionately slow (VERDICT r2 item 4). 0 disables.
    clip_pad_to: int = 0
    # windowed candidate encode (r5): run BOTH the factorized stage-1
    # and the exact stage-2 text-tower passes over only the first
    # clip_window columns whenever every candidate row's pieces fit the
    # window — a per-call lax.cond falls back to the full static width
    # otherwise, so results are EXACT at any window value (CLIP's text
    # tower is causal and pools at the first EOS, models/clip.py:109-125:
    # columns past the last real piece cannot influence the embedding).
    # The lever for the clip_len=77 reference-shape regime
    # (clip/clip.py:71-73), where the 80-padded static bound is ~4x the
    # actual ~17-piece caption stream of the default workload. 0
    # disables; single-chip only (the fit check is a cross-shard any()
    # under a batch-sharded mesh — refused at spec build).
    clip_window: int = 0
    # per-block width of the exact two-stage top-k (engages at B>=128;
    # energies.exact_topk_2stage) — the stage-1 batched sort is the pruned
    # tier's largest single op, so its block shape is tunable (config.py
    # carries the measured curve; 2048 is the plateau optimum)
    topk_chunk: int = 2048
    # stage-1 vocab top-k mode: "exact" (parity) or "approx" —
    # jax.lax.approx_max_k with topk_recall as the per-call recall target
    # (NON-parity; the engine requires prune_k alongside it, so it only
    # ever relaxes the already-approximate pruned tier). The hybrid
    # final_exact sweep always resets to "exact".
    topk_mode: str = "exact"
    topk_recall: float = 0.95
    # stop-mask lookup for the selected top-k ids (energies.topk_candidates):
    # "gather" = the f32[V] take-along (reference-shaped; default) or
    # "compare" = membership test against the static banned-id lists
    # (tables["banned_mid"/"banned_last"]) — EXACT (same {0,1} values, the
    # gather's 0.0-tie semantics preserved), swaps the pruned tier's
    # largest single scalar-core op for a fused vector compare-reduce
    mask_impl: str = "gather"
    # host-exact candidate assembly: CLIP ids come from a pure host
    # callback reproducing the reference's decode -> re-tokenize
    # (gen_utils.py:75 + clip/clip.py:71-73) byte-exactly, including
    # '##'-continuation merging the table bridge approximates
    exact_bridge: bool = False


def _set_at_col(ids: jax.Array, col: jax.Array, values, mesh=None) -> jax.Array:
    """``ids.at[arange(B), col].set(values)`` — the per-row column write.

    Two exact forms: the scatter (single-chip default — the measured
    fusion-preserving formulation) and a one-hot select for mesh
    programs: XLA's SPMD partitioner all-gathers batch-sharded scatter
    operands (s32[B,2] index all-gathers observed in the full-size
    dryrun — __graft_entry__.dryrun_fullsize_collectives), while the
    iota-compare + where form is elementwise and stays lane-local.
    ``values``: scalar or (B,) — broadcast across the selected column.
    """
    if mesh is None:
        B = ids.shape[0]
        return ids.at[jnp.arange(B), col].set(values)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (ids.shape[1],), 0)[None, :]
        == col[:, None]
    )
    vals = jnp.asarray(values, dtype=ids.dtype)
    if vals.ndim == 1:
        vals = vals[:, None]
    return jnp.where(oh, vals, ids)


def _take_along_onehot(values: jax.Array, sel: jax.Array) -> jax.Array:
    """``take_along_axis(values, sel, axis=1)`` as a one-hot contraction.

    The (B, k)-shaped take-alongs in the pruned tier lower to kCustom
    scalar-core gathers (~0.47 ms/position at prune5/B=128 in the trace
    budget); a one-hot fp32 matmul keeps the op on the vector units. All
    gathered payloads here (token ids < 2^24, probabilities) are exactly
    representable in fp32, so the contraction is exact.

    MEASURED NEUTRAL end-to-end (prune5/B=128: 51.43 vs 51.38 caps/s, r3)
    — the gathers overlap other work. Kept as a tested utility; the
    engine uses the plain take_along (fusion-preservation discipline:
    only keep reformulations that WIN).
    """
    k = values.shape[1]
    onehot = (
        sel[..., None] == jax.lax.broadcasted_iota(sel.dtype, (k,), 0)
    ).astype(jnp.float32)
    out = jnp.einsum("bsk,bk->bs", onehot, values.astype(jnp.float32))
    return out.astype(values.dtype)


class IterOut(NamedTuple):
    ids: jax.Array  # (B, S) snapshot after the iteration
    cosine: jax.Array  # (B,) clip cosine of the last committed candidate
    ctl_score: jax.Array  # (B,) control score of the last committed candidate


def _encode_candidates(
    spec: EngineSpec,
    clip: CLIPModel,
    params: Dict[str, Any],
    clip_ids: jax.Array,
    clip_mask: jax.Array,
    prefix_len: int,
    prefix_kvs=None,
    s1=None,
) -> jax.Array:
    """(B, k, L) candidate rows -> (B*k, D) text embeddings.

    Applies the two engine-level FLOP/regime controls:
      - exact prefix-KV reuse when ``prefix_len >= 2`` (the candidates'
        common prefix is encoded once at B width);
      - candidate-row chunking (``spec.clip_row_chunk``) — oversized
        B*k batches are scanned in fixed-size chunks to stay out of the
        XLA large-batch layout-copy regime.

    ``s1``: optional ``(tower, tower_params, wcal)`` — encode through the
    TRUNCATED text tower + calibrated projection instead (the factorized
    stage-1 scorer). The prefix-KV cache is shared with the full tower:
    its first ``tower.config.num_layers`` entries ARE the truncated
    tower's prefix K/V (identical layer stacks).
    """
    if spec.clip_pad_to > clip_ids.shape[-1]:
        extra = spec.clip_pad_to - clip_ids.shape[-1]
        clip_ids = jnp.pad(
            clip_ids, ((0, 0), (0, 0), (0, extra)),
            constant_values=spec.clip_pad_id,
        )
        clip_mask = jnp.pad(clip_mask, ((0, 0), (0, 0), (0, extra)))
    B, k, L = clip_ids.shape
    P = prefix_len if 2 <= prefix_len < spec.clip_len - 1 else 0

    def encode(ids_bk, mask_bk):  # (B, kc, Lw) -> (B, kc, D)
        kc = ids_bk.shape[1]
        if s1 is not None:
            tower, tparams, wcal = s1
            S = ids_bk.shape[2]
            if P and prefix_kvs is not None:
                n = tower.config.num_layers
                pooled = tower.apply(
                    {"params": tparams},
                    ids_bk[:, :, P:].reshape(B * kc, S - P),
                    mask_bk[:, :, P:].reshape(B * kc, S - P),
                    pos_offset=P,
                    prefix_kvs=list(prefix_kvs[:n]),
                )
            elif P:
                _, kvs = tower.apply(
                    {"params": tparams}, ids_bk[:, 0, :P], return_kvs=True
                )
                pooled = tower.apply(
                    {"params": tparams},
                    ids_bk[:, :, P:].reshape(B * kc, S - P),
                    mask_bk[:, :, P:].reshape(B * kc, S - P),
                    pos_offset=P,
                    prefix_kvs=kvs,
                )
            else:
                pooled = tower.apply(
                    {"params": tparams},
                    ids_bk.reshape(B * kc, S),
                    mask_bk.reshape(B * kc, S),
                )
            emb = pooled.astype(jnp.float32) @ wcal
            return emb.reshape(B, kc, emb.shape[-1])
        if P and prefix_kvs is not None:
            # prompt-constant prefix: K/V computed once per GENERATION
            # (run_generation), not per position
            emb = clip.apply(
                {"params": params["clip"]},
                prefix_kvs,
                P,
                ids_bk[:, :, P:],
                mask_bk[:, :, P:],
                method=CLIPModel.encode_text_suffix,
            )
        elif P:
            emb = clip.apply(
                {"params": params["clip"]},
                ids_bk[:, 0, :P],
                ids_bk[:, :, P:],
                mask_bk[:, :, P:],
                method=CLIPModel.encode_text_shared_prefix,
            )
        else:
            emb = clip.apply(
                {"params": params["clip"]},
                ids_bk.reshape(B * kc, ids_bk.shape[2]),
                mask_bk.reshape(B * kc, ids_bk.shape[2]),
                method=CLIPModel.encode_text,
            )
        return emb.reshape(B, kc, emb.shape[-1])

    # windowed fast path (spec.clip_window): encode only the first W
    # columns when every row IN THE CHUNK fits — exact (causal tower,
    # first-EOS pool); the cond's other branch is the unchanged
    # full-width program. Per-chunk granularity: one long candidate
    # only slows its own scoring chunk, not the whole step.
    W = spec.clip_window
    if W and (W >= L or W <= P + 1):
        W = 0  # window no narrower than the prefix, no wider than L

    def enc(ids_bk, mask_bk):  # (B, kc, L) -> (B, kc, D), maybe windowed
        if not W:
            return encode(ids_bk, mask_bk)
        fits = jnp.logical_not(jnp.any(mask_bk[:, :, W:] != 0))
        return jax.lax.cond(
            fits,
            lambda: encode(ids_bk[:, :, :W], mask_bk[:, :, :W]),
            lambda: encode(ids_bk, mask_bk),
        )

    rc = spec.clip_row_chunk
    if rc and B * k > rc:
        kc = max(1, rc // B)
        while k % kc:
            kc -= 1
        n = k // kc
        if n > 1:
            ids_c = clip_ids.reshape(B, n, kc, L).transpose(1, 0, 2, 3)
            mask_c = clip_mask.reshape(B, n, kc, L).transpose(1, 0, 2, 3)
            emb = jax.lax.map(lambda t: enc(*t), (ids_c, mask_c))
            return emb.transpose(1, 0, 2, 3).reshape(B * k, -1)
    return enc(clip_ids, clip_mask).reshape(B * k, -1)


def _position_update(
    spec: EngineSpec,
    bert: BertForMaskedLM,
    clip: CLIPModel,
    params: Dict[str, Any],
    tables: Dict[str, jax.Array],
    hyper: Dict[str, jax.Array],
    image_embeds: jax.Array,
    base_ids: jax.Array,
    commit_ids: jax.Array,
    pos: jax.Array,
    logits: jax.Array,
    token_mask: jax.Array,
    banned: Optional[jax.Array] = None,
    prefix_len: int = 0,
    host_bridge=None,
    host_ctl=None,
    prefix_kvs=None,
    mesh=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Score k candidates for ``pos`` and commit the argmax.

    base_ids: rows candidates are built from; commit_ids: rows the winner is
    written into (they differ only in parallel order, gen_utils.py:257-271).
    ``pos`` is a per-row (B,) vector — batch rows may polish different
    positions (sample-fused schedules). ``prefix_len`` (static) is a proven
    lower bound on the candidates' common CLIP-prefix length for this step
    (0 disables prefix-KV reuse). Returns (new_commit_ids, cosine_sel,
    ctl_sel).
    """
    B = base_ids.shape[0]
    k = spec.candidate_k
    col = spec.seed_len + pos  # (B,)

    probs = energies.masked_lm_probs(logits, token_mask, hyper["temperature"])
    assert (banned is None) == (spec.mask_impl != "compare"), (
        "mask_impl='compare' call sites must pass the banned rows selected "
        "TOGETHER with token_mask (_token_mask_for / _mask_last_pair)"
    )
    top_probs, idxs = energies.topk_candidates(
        probs, token_mask, k, chunk=spec.topk_chunk,
        mode=spec.topk_mode, recall=spec.topk_recall, banned_ids=banned,
        mesh=mesh,
    )

    def _assemble(idxs_k):
        """(B, k') candidate ids -> ((B,k',L) CLIP ids, mask, prefix bound)."""
        kk = idxs_k.shape[1]
        if spec.exact_bridge:
            cand_ = jnp.broadcast_to(
                base_ids[:, None, :], (B, kk, base_ids.shape[1]))
            oh = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (base_ids.shape[1],), 0)[None, :]
                == col[:, None]
            )
            cand_ = jnp.where(oh[:, None, :], idxs_k[:, :, None], cand_)
            inner_ = cand_[:, :, 1 : spec.seq_len - 1]
            out_shape = jax.ShapeDtypeStruct((B, kk, spec.clip_len), jnp.int32)
            ids_, mask_ = jax.pure_callback(
                host_bridge, (out_shape, out_shape), inner_
            )
            return ids_, mask_, 0  # the table prefix bound does not apply
        ids_, mask_ = assemble_clip_ids_substitute(
            base_ids[:, 1 : spec.seq_len - 1],
            idxs_k,
            col - 1,
            tables["bridge_ids"],
            tables["bridge_lens"],
            bos_id=spec.clip_bos_id,
            eos_id=spec.clip_eos_id,
            pad_id=spec.clip_pad_id,
            clip_len=spec.clip_len,
        )
        return ids_, mask_, prefix_len

    def _stage1_rank(surr, idxs_k, top_probs_k):
        """Stage-1 cut ranking: the surrogate cosine, or — under
        spec.stage1_ctl — the full control-aware combine over the current
        candidate set (energies.stage1_ctl_rank)."""
        if not spec.stage1_ctl or spec.ctl is None:
            return surr
        kk = idxs_k.shape[1]
        rows = jnp.broadcast_to(
            base_ids[:, None, :], (B, kk, base_ids.shape[1]))
        oh = (
            jax.lax.broadcasted_iota(
                jnp.int32, (base_ids.shape[1],), 0)[None, :]
            == col[:, None]
        )
        rows = jnp.where(oh[:, None, :], idxs_k[:, :, None], rows)
        return energies.stage1_ctl_rank(
            surr, top_probs_k, idxs_k, rows,
            ctl=spec.ctl, negative=spec.negative, seq_len=spec.seq_len,
            logit_scale=params["clip"]["logit_scale"],
            alpha=hyper["alpha"], beta=hyper["beta"],
            gamma=hyper["gamma"],
            senti=tables.get("senti"), pos_table=tables.get("pos"),
            template=tables.get("template"),
            bridge_lens=tables["bridge_lens"],
        )

    preassembled = None
    if spec.prune_k is not None and spec.prune_k < k:
        if spec.prune_stage1 == "factorized":
            # factorized stage-1: assemble the candidates once and score
            # them through the truncated tower + calibrated projection;
            # survivors REUSE the assembled rows (gathered, not re-built).
            # ~10x lower selection regret than the bag proxy on semantic
            # weights (FACTORIZED_FIDELITY.json / BASELINE.md r4)
            def s1_scores_of(ids_a, mask_a, pl_, layers, wcal):
                """(B,k',L) assembled rows -> (B,k') truncated-tower
                cosines at ``layers`` depth under projection ``wcal``."""
                cfg_ = dataclasses.replace(
                    clip.config.text, num_layers=layers)
                tower_ = CLIPTextTower(
                    cfg_, dtype=clip.dtype, attn_impl=clip.attn_impl,
                    quant=clip.quant)
                params_ = truncated_text_params(params["clip"], layers)
                emb = _encode_candidates(
                    spec, clip, params, ids_a, mask_a, pl_, prefix_kvs,
                    s1=(tower_, params_, wcal),
                ).reshape(B, ids_a.shape[1], -1)
                emb = emb / (
                    jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-6)
                img_n = image_embeds.astype(jnp.float32)
                img_n = img_n / jnp.linalg.norm(
                    img_n, axis=-1, keepdims=True)
                return jnp.einsum("bkd,bd->bk", emb, img_n)

            assembled = None
            if spec.stage1_precut and spec.stage1_precut < k:
                if spec.stage1_precut_mode == "tower":
                    # two-stage factorized cascade: a SHALLOWER tower
                    # scores all k (the bag proxy's recall collapses at
                    # long contexts — BASELINE.md r4 len77), and the
                    # survivors' assembled rows are REUSED downstream
                    ids_all, mask_all, pl = _assemble(idxs)
                    pc_scores = s1_scores_of(
                        ids_all, mask_all, pl, spec.stage1_precut_layers,
                        tables["stage1_wcal_pc"])
                    _, keep0 = energies.dp_local_top_k(
                        _stage1_rank(pc_scores, idxs, top_probs),
                        spec.stage1_precut, mesh=mesh)
                    assembled = (
                        jnp.take_along_axis(
                            ids_all, keep0[:, :, None], axis=1),
                        jnp.take_along_axis(
                            mask_all, keep0[:, :, None], axis=1),
                        pl,
                    )
                else:
                    # cascade: the bag proxy cuts k -> m so the truncated
                    # tower (the dominant cost here) encodes only m rows
                    proxy0 = energies.prune_proxy_scores(
                        tables["word_embeds"], base_ids, col, idxs,
                        image_embeds, spec.seq_len,
                        exclude_slot=spec.order_kind == "parallel",
                    )
                    _, keep0 = energies.dp_local_top_k(
                        _stage1_rank(proxy0, idxs, top_probs),
                        spec.stage1_precut, mesh=mesh)
                idxs = jnp.take_along_axis(idxs, keep0, axis=1)
                top_probs = jnp.take_along_axis(top_probs, keep0, axis=1)
                k = spec.stage1_precut
            if assembled is None:
                assembled = _assemble(idxs)
            ids_all, mask_all, pl = assembled
            s1_scores = s1_scores_of(
                ids_all, mask_all, pl, spec.stage1_layers,
                tables["stage1_wcal"])
            _, keep = energies.dp_local_top_k(
                _stage1_rank(s1_scores, idxs, top_probs),
                spec.prune_k, mesh=mesh)  # (B, k')
            preassembled = (
                jnp.take_along_axis(ids_all, keep[:, :, None], axis=1),
                jnp.take_along_axis(mask_all, keep[:, :, None], axis=1),
                pl,
            )
        else:
            # stage-1 proxy: cos(image, normalize(bag + w[cand])); slot-
            # exclusion semantics pinned in energies.prune_proxy_scores.
            # Only the parallel order's base row is UNMASKED at the edited
            # slot; every masked order skips the subtraction (exact no-op
            # there — [MASK] embeds to 0 — and keeps the measured pruned
            # tiers' HLO byte-identical to the pre-fix program)
            proxy = energies.prune_proxy_scores(
                tables["word_embeds"], base_ids, col, idxs, image_embeds,
                spec.seq_len, exclude_slot=spec.order_kind == "parallel",
            )
            _, keep = energies.dp_local_top_k(
                _stage1_rank(proxy, idxs, top_probs),
                spec.prune_k, mesh=mesh)  # (B, k')
        idxs = jnp.take_along_axis(idxs, keep, axis=1)
        top_probs = jnp.take_along_axis(top_probs, keep, axis=1)
        k = spec.prune_k

    # (B, k, S) candidate rows
    cand = jnp.broadcast_to(base_ids[:, None, :], (B, k, base_ids.shape[1]))
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (base_ids.shape[1],), 0)[None, :]
        == col[:, None]
    )  # (B, S)
    cand = jnp.where(onehot[:, None, :], idxs[:, :, None], cand)

    # CLIP scoring over the caption span (prompt + sentence, no CLS/SEP).
    # Assembly is the substitution form (base stream + one edited word —
    # avoids per-candidate scalar-core gathers; tests/test_bridge.py) or
    # the host-exact decode->re-tokenize callback (gen_utils.py:75 +
    # clip/clip.py:71-73); the factorized stage-1 already assembled and
    # gathered the survivors' rows above.
    inner = cand[:, :, 1 : spec.seq_len - 1]
    if preassembled is not None:
        clip_ids, clip_mask, prefix_len = preassembled
    else:
        clip_ids, clip_mask, prefix_len = _assemble(idxs)
    text_embeds = _encode_candidates(
        spec, clip, params, clip_ids, clip_mask, prefix_len, prefix_kvs
    )
    clip_probs, cosine = clip.apply(
        {"params": params["clip"]},
        image_embeds,
        text_embeds,
        method=CLIPModel.similarity,
    )

    ctl_probs = None
    penalty = None
    ctl_score = jnp.zeros((B, k), jnp.float32)
    if spec.ctl is not None and spec.ctl_mode == "exact":
        # the reference's in-loop sentence-level NLTK scoring per
        # candidate (context-sensitive), as a pure host callback on the
        # decoded candidate rows — symmetric to exact_bridge above
        ctl_score = jax.pure_callback(
            host_ctl, jax.ShapeDtypeStruct((B, k), jnp.float32), inner
        )
        if spec.ctl == "sentiment":
            ctl_probs = energies.sentiment_probs(ctl_score)
            penalty = energies.repeat_penalty(idxs, cand)
        else:
            ctl_probs = energies.pos_probs(ctl_score)
    elif spec.ctl == "sentiment":
        ctl_score = energies.sentiment_scores(
            cand, tables["senti"], negative=spec.negative
        )
        ctl_probs = energies.sentiment_probs(ctl_score)
        penalty = energies.repeat_penalty(idxs, cand)
    elif spec.ctl == "pos":
        word_valid = (tables["bridge_lens"][inner] > 0).astype(jnp.int32)
        ctl_score = energies.pos_accuracy(
            inner, tables["pos"], tables["template"], word_valid
        )
        ctl_probs = energies.pos_probs(ctl_score)

    final = energies.combine_scores(
        top_probs,
        clip_probs,
        hyper["alpha"],
        hyper["beta"],
        ctl_probs=ctl_probs,
        gamma=hyper["gamma"],
        penalty=penalty,
    )
    sel = jnp.argmax(final, axis=1)  # (B,)
    chosen = jnp.take_along_axis(idxs, sel[:, None], axis=1)[:, 0]
    new_ids = _set_at_col(commit_ids, col, chosen, mesh=mesh)
    cos_sel = jnp.take_along_axis(cosine, sel[:, None], axis=1)[:, 0]
    ctl_sel = jnp.take_along_axis(ctl_score, sel[:, None], axis=1)[:, 0]
    return new_ids, cos_sel, ctl_sel


def _token_mask_for(spec: EngineSpec, tables, pos):
    """(B,) positions -> ((B, V) mask, (B, nb) banned rows or None).

    The mask and — under mask_impl="compare" — the banned-id rows are
    selected by ONE rule here, so the pair can never diverge: '.' only at
    the last slot (utils.py:53-59), i.e. mid everywhere else. The banned
    lists are padded to one static length with -1, which matches no
    top-k id. The parallel order does not use this helper — it passes the
    mask_last pair for every position (_mask_last_pair)."""
    mask = jnp.where(
        (pos == spec.sentence_len - 1)[:, None],
        tables["mask_last"][None, :],
        tables["mask_mid"][None, :],
    )
    if spec.mask_impl != "compare":
        return mask, None
    banned = jnp.where(
        (pos == spec.sentence_len - 1)[:, None],
        tables["banned_last"][None, :],
        tables["banned_mid"][None, :],
    )
    return mask, banned


def _mask_last_pair(spec: EngineSpec, tables, B: int):
    """The parallel order's (mask, banned) pair: mask_last for EVERY
    position (the reference never updates the mask there — '.' allowed
    everywhere, gen_utils.py:256-273 / PARITY.md)."""
    mask = tables["mask_last"][None, :]
    if spec.mask_impl != "compare":
        return mask, None
    banned = jnp.broadcast_to(
        tables["banned_last"][None, :],
        (B, tables["banned_last"].shape[0]),
    )
    return mask, banned


def _make_sweep(spec, bert, clip, params, tables, hyper, image_embeds,
                host_bridge=None, host_ctl=None, prefix_kvs=None,
                mesh=None):
    """Returns iteration_fn(ids, schedule_row) -> (ids, cos, ctl)."""

    def fresh_logits(ids, pos):
        col = spec.seed_len + pos  # (B,)
        masked = _set_at_col(ids, col, spec.mask_token_id, mesh=mesh)
        hidden = bert.apply(
            {"params": params["bert"]}, masked,
            pool_idx=col[:, None], method=BertForMaskedLM.hidden,
        )  # (B, 1, H): final layer computed at the masked slot only
        logits = bert.apply(
            {"params": params["bert"]}, hidden[:, 0],
            method=BertForMaskedLM.lm_head,
        )
        return masked, logits

    update = functools.partial(
        _position_update, spec, bert, clip, params, tables, hyper,
        image_embeds, host_bridge=host_bridge, host_ctl=host_ctl,
        prefix_kvs=prefix_kvs, mesh=mesh,
    )

    if spec.order_kind == "single":

        def make_step(P):
            def step(carry, pos):
                ids, _, _ = carry
                masked, logits = fresh_logits(ids, pos)
                mask, banned = _token_mask_for(spec, tables, pos)
                new_ids, cos, ctl = update(
                    masked, masked, pos, logits, mask, banned, prefix_len=P
                )
                return (new_ids, cos, ctl), None

            return step

        chunks = spec.prefix_chunks

        def iteration(ids, row):
            B = ids.shape[0]
            z = jnp.zeros((B,), jnp.float32)
            carry = (ids, z, z)
            if chunks is None:
                carry, _ = jax.lax.scan(make_step(0), carry, row)
            else:
                off = 0
                for P, n in chunks:
                    carry, _ = jax.lax.scan(
                        make_step(P), carry, row[off : off + n]
                    )
                    off += n
            return carry

        return iteration

    # span/parallel use one compiled body per iteration: only the
    # order-independent prompt-prefix bound applies
    P0 = spec.prefix_chunks[0][0] if spec.prefix_chunks else 0

    if spec.order_kind == "span":

        def span_body(carry, start_size):
            ids, _, _ = carry
            start, size = start_size
            offs = jnp.arange(SPAN_LEN, dtype=jnp.int32)
            cols = spec.seed_len + start + offs
            valid = offs < size
            # mask the whole (valid part of the) span: gen_utils.py:164
            cur = ids[:, cols]  # (B, SPAN)
            vals = jnp.where(valid[None, :], spec.mask_token_id, cur)
            ids = ids.at[:, cols].set(vals)
            # ONE stale forward for the span (gen_utils.py:165)
            B_ = ids.shape[0]
            hspan = bert.apply(
                {"params": params["bert"]}, ids,
                pool_idx=jnp.broadcast_to(cols[None, :], (B_, cols.shape[0])),
                method=BertForMaskedLM.hidden,
            )  # (B, SPAN, H)
            logits_span = bert.apply(
                {"params": params["bert"]}, hspan, method=BertForMaskedLM.lm_head
            )

            def inner(carry, j):
                ids, cos0, ctl0 = carry
                pos = jnp.full((ids.shape[0],), start + j, jnp.int32)

                def do(ids):
                    mask, banned = _token_mask_for(spec, tables, pos)
                    return update(
                        ids, ids, pos, logits_span[:, j], mask, banned,
                        prefix_len=P0,
                    )

                new_ids, cos, ctl = jax.lax.cond(
                    j < size, do, lambda ids: (ids, cos0, ctl0), ids
                )
                return (new_ids, cos, ctl), None

            carry, _ = jax.lax.scan(
                inner, (ids, carry[1], carry[2]), jnp.arange(SPAN_LEN)
            )
            return carry, None

        def iteration(ids, row):
            starts, sizes = row
            B = ids.shape[0]
            z = jnp.zeros((B,), jnp.float32)
            (ids, cos, ctl), _ = jax.lax.scan(
                span_body, (ids, z, z), (starts, sizes)
            )
            return ids, cos, ctl

        return iteration

    if spec.order_kind == "parallel":

        def iteration(ids, _row):
            B = ids.shape[0]
            base = ids  # candidates built from iteration-start rows
            # one UNMASKED forward (gen_utils.py:258 — quirk preserved)
            sent_cols = spec.seed_len + jnp.arange(spec.sentence_len)
            hspan = bert.apply(
                {"params": params["bert"]}, ids,
                pool_idx=jnp.broadcast_to(
                    sent_cols[None, :], (B, spec.sentence_len)
                ),
                method=BertForMaskedLM.hidden,
            )  # (B, L, H)
            logits_all = bert.apply(
                {"params": params["bert"]}, hspan, method=BertForMaskedLM.lm_head
            )

            def step(carry, kk):
                ids, _, _ = carry
                # reference parallel never updates the token mask; the
                # initial mask allows '.' everywhere (see PARITY.md)
                pos = jnp.full((B,), kk, jnp.int32)
                mask, banned = _mask_last_pair(spec, tables, B)
                new_ids, cos, ctl = update(
                    base, ids, pos, logits_all[:, kk], mask, banned,
                    prefix_len=P0,
                )
                return (new_ids, cos, ctl), None

            z = jnp.zeros((B,), jnp.float32)
            (ids, cos, ctl), _ = jax.lax.scan(
                step, (ids, z, z), jnp.arange(spec.sentence_len)
            )
            return ids, cos, ctl

        return iteration

    raise ValueError(spec.order_kind)


def run_generation(
    spec: EngineSpec,
    bert: BertForMaskedLM,
    clip: CLIPModel,
    params: Dict[str, Any],
    tables: Dict[str, jax.Array],
    hyper: Dict[str, jax.Array],
    image_embeds: jax.Array,
    init_ids: jax.Array,
    schedule_positions: jax.Array,
    schedule_sizes: Optional[jax.Array],
    host_bridge=None,
    host_ctl=None,
    mesh=None,
):
    """The full multi-iteration generation (jit this).

    Returns (iter_ids (I,B,S), iter_cos (I,B), iter_ctl (I,B),
    best_ids (B,S), best_cos (B,)). Best tracking matches
    gen_utils.py:85-88: strictly-greater update on the per-iteration cosine,
    initialized at 0.
    """
    # prompt-constant prefix K/V: with a single prefix chunk the shared
    # prefix is exactly BOS + prompt, which never changes across positions
    # or iterations — encode it ONCE here instead of at every Gibbs step
    prefix_kvs = None
    chunks = spec.prefix_chunks
    if (
        chunks is not None
        and len(chunks) == 1
        and 2 <= chunks[0][0] < spec.clip_len - 1
        and not spec.exact_bridge
    ):
        P0 = chunks[0][0]
        inner0 = init_ids[:, 1 : spec.seq_len - 1]
        pref_row, _ = assemble_clip_ids(
            inner0,
            tables["bridge_ids"],
            tables["bridge_lens"],
            bos_id=spec.clip_bos_id,
            eos_id=spec.clip_eos_id,
            pad_id=spec.clip_pad_id,
            clip_len=spec.clip_len,
        )
        prefix_kvs = clip.apply(
            {"params": params["clip"]},
            pref_row[:, :P0],
            method=CLIPModel.text_prefix_kvs,
        )
    iteration = _make_sweep(
        spec, bert, clip, params, tables, hyper, image_embeds,
        host_bridge=host_bridge, host_ctl=host_ctl, prefix_kvs=prefix_kvs,
        mesh=mesh,
    )
    final_iteration = None
    if spec.final_exact and spec.prune_k is not None:
        # hybrid schedule: the last iteration re-sweeps every position with
        # FULL k-candidate scoring — the committed caption is a full-parity
        # polish of the pruned trajectory (same compiled program; the full
        # body is a second sweep instance inside it)
        full_spec = dataclasses.replace(
            spec, prune_k=None, final_exact=False, topk_mode="exact"
        )
        final_iteration = _make_sweep(
            full_spec, bert, clip, params, tables, hyper, image_embeds,
            host_bridge=host_bridge, host_ctl=host_ctl, prefix_kvs=prefix_kvs,
            mesh=mesh,
        )
    B = init_ids.shape[0]

    def outer(carry, row):
        ids, best_cos, best_ids = carry
        ids, cos, ctl = iteration(ids, row)
        improved = best_cos < cos
        best_cos = jnp.where(improved, cos, best_cos)
        best_ids = jnp.where(improved[:, None], ids, best_ids)
        return (ids, best_cos, best_ids), IterOut(ids, cos, ctl)

    if spec.order_kind == "span":
        xs = (schedule_positions, schedule_sizes)
    else:
        xs = schedule_positions
    init = (
        init_ids,
        jnp.zeros((B,), jnp.float32),
        init_ids,
    )
    if final_iteration is None:
        (ids, best_cos, best_ids), outs = jax.lax.scan(outer, init, xs)
        return outs.ids, outs.cosine, outs.ctl_score, best_ids, best_cos
    xs_head = jax.tree.map(lambda a: a[:-1], xs)
    xs_last = jax.tree.map(lambda a: a[-1], xs)
    (ids, best_cos, best_ids), outs = jax.lax.scan(outer, init, xs_head)
    ids, cos, ctl = final_iteration(ids, xs_last)
    improved = best_cos < cos
    best_cos = jnp.where(improved, cos, best_cos)
    best_ids = jnp.where(improved[:, None], ids, best_ids)
    return (
        jnp.concatenate([outs.ids, ids[None]], axis=0),
        jnp.concatenate([outs.cosine, cos[None]], axis=0),
        jnp.concatenate([outs.ctl_score, ctl[None]], axis=0),
        best_ids,
        best_cos,
    )
