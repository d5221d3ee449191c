"""BERT-id -> CLIP-id bridge: on-device candidate sentence assembly.

The reference's hot loop round-trips every candidate through the host —
``tokenizer.batch_decode`` of B*k id-rows (``/root/reference/gen_utils.py:75``)
then CLIP re-tokenization (``clip/clip.py:71-73``) — the dominant non-GPU
cost. The rebuild precomputes, once per (BERT vocab, CLIP vocab) pair, the
CLIP BPE ids of every BERT wordpiece as a standalone word; candidate CLIP
sequences are then assembled **on device** by gather + cumsum + scatter, so
the whole Gibbs sweep stays inside one XLA program.

Exactness: BPE merges never cross word boundaries, so for whole-word
candidates the assembly is byte-identical to the host path. ``##``
continuation pieces are bridged as if they started a word — an approximation
(the host/"exact" engine mode reproduces reference behavior precisely and is
used for parity validation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from conzic_tpu.text.bpe import CLIPBPETokenizer
from conzic_tpu.text.wordpiece import WordPieceTokenizer


@dataclasses.dataclass
class BridgeTable:
    """Per-BERT-token CLIP pieces.

    ids:  (V, M) int32 — CLIP ids, zero-padded.
    lens: (V,)  int32 — number of valid pieces (0 for specials: their text
          contribution under ``skip_special_tokens=True`` is empty).
    bos_id / eos_id / pad_id: CLIP special ids.
    max_pieces: M.
    """

    ids: np.ndarray
    lens: np.ndarray
    bos_id: int
    eos_id: int
    pad_id: int
    max_pieces: int

    @property
    def vocab_size(self) -> int:
        return self.ids.shape[0]


def build_bridge_table(
    wp: WordPieceTokenizer,
    bpe: CLIPBPETokenizer,
    max_pieces: Optional[int] = None,
) -> BridgeTable:
    """``max_pieces=None`` (default) sizes the table to the longest piece
    sequence actually present in the vocab, so no token is ever truncated."""
    from conzic_tpu.text.vocab import token_body

    V = wp.vocab_size
    special = set(wp.special_tokens)
    entries: list[tuple[int, str]] = []
    for tok, i in wp.vocab.items():
        if tok in special:
            continue
        body = token_body(tok)
        if body:
            entries.append((i, body))
    all_pieces: dict[int, list[int]] = {}
    native_enc = None
    try:
        from conzic_tpu.text import native

        if native.available():
            native_enc = native.NativeBpeWordEncoder(bpe)
    except Exception:
        native_enc = None
    # the native encoder handles pre-normalized lowercase ASCII words; the
    # rest (punctuation, digits, mixed-case, non-ASCII) go through the
    # canonical Python path
    fast = [(i, b) for i, b in entries
            if b.isascii() and b.islower() and b.isalpha()]
    slow = [(i, b) for i, b in entries if not (
        b.isascii() and b.islower() and b.isalpha())]
    if native_enc is not None and fast:
        # a word of L chars yields at most L BPE pieces (merges only
        # reduce), so sizing the buffer to the longest word guarantees
        # the native path never truncates — preserving the documented
        # max_pieces=None "no token is ever truncated" contract that a
        # fixed cap (previously 64) broke for pathological vocab entries
        cap = max(len(b) for _, b in fast)
        ids_arr, lens_arr = native_enc.encode_words(
            [b for _, b in fast], max_pieces=cap
        )
        for row, (i, _) in enumerate(fast):
            all_pieces[i] = ids_arr[row, : lens_arr[row]].tolist()
    else:
        slow = entries
    for i, body in slow:
        all_pieces[i] = bpe.encode_word_ids(body)
    width = max((len(p) for p in all_pieces.values()), default=1)
    if max_pieces is not None:
        width = min(width, max_pieces)
    ids = np.zeros((V, width), np.int32)
    lens = np.zeros((V,), np.int32)
    for i, pieces in all_pieces.items():
        pieces = pieces[:width]
        ids[i, : len(pieces)] = pieces
        lens[i] = len(pieces)
    max_pieces = width
    return BridgeTable(
        ids=ids,
        lens=lens,
        bos_id=bpe.bos_token_id,
        eos_id=bpe.eos_token_id,
        pad_id=bpe.pad_token_id,
        max_pieces=max_pieces,
    )


def assemble_clip_ids(
    bert_ids: jax.Array,
    bridge_ids: jax.Array,
    bridge_lens: jax.Array,
    *,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    clip_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Assemble CLIP token rows from BERT token rows, fully on device.

    Args:
      bert_ids: (..., P) int32 — the caption-relevant BERT positions
        (prompt words + sentence slots; no [CLS]/[SEP]).
      bridge_ids/bridge_lens: the bridge table arrays.
      clip_len: static CLIP context length (<= 77).

    Returns:
      (clip_ids, attention_mask): (..., clip_len) int32 each. Rows are
      BOS + pieces + EOS, padded with ``pad_id``; pieces overflowing the
      context are dropped (mirrors reference truncation,
      clip/clip.py:71-73).
    """
    batch_shape = bert_ids.shape[:-1]
    P = bert_ids.shape[-1]
    flat = bert_ids.reshape(-1, P)

    # Gather formulation: each OUTPUT slot finds which (word, piece) lands
    # there — int32 scatters lower to the TPU scalar core (measured 1.3
    # ms/position, the most expensive single op in the hot loop); compares
    # + gathers are pure vector work.
    def one_row(row: jax.Array):
        pieces = bridge_ids[row]  # (P, M)
        lens = bridge_lens[row]  # (P,)
        M = pieces.shape[-1]
        ends = jnp.cumsum(lens)  # (P,) piece-space end of each word
        offs = ends - lens  # (P,) piece-space start of each word
        total = ends[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (clip_len,), 0)
        jw = j - 1  # piece-space index (slot 0 is BOS)
        # word covering piece jw = first word whose end exceeds jw
        # (zero-length words have end == start and are skipped)
        p_j = jnp.sum(
            (ends[None, :] <= jw[:, None]).astype(jnp.int32), axis=1
        )
        p_j = jnp.minimum(p_j, P - 1)
        m_j = jnp.clip(jw - offs[p_j], 0, M - 1)
        val = pieces[p_j, m_j]  # (clip_len,) vectorized gather
        eos_pos = jnp.minimum(1 + total, clip_len - 1)
        out = jnp.where(
            j == 0,
            bos_id,
            jnp.where(
                j == eos_pos,
                eos_id,
                jnp.where(
                    (jw >= 0) & (jw < total) & (j < eos_pos), val, pad_id
                ),
            ),
        ).astype(jnp.int32)
        mask = (j <= eos_pos).astype(jnp.int32)
        return out, mask

    ids, mask = jax.vmap(one_row)(flat)
    return (
        ids.reshape(*batch_shape, clip_len),
        mask.reshape(*batch_shape, clip_len),
    )


def assemble_clip_ids_substitute(
    base_inner: jax.Array,
    cand_ids: jax.Array,
    pos: jax.Array,
    bridge_ids: jax.Array,
    bridge_lens: jax.Array,
    *,
    bos_id: int,
    eos_id: int,
    pad_id: int,
    clip_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Candidate-row assembly specialized to the engine's hot shape.

    The k candidate rows of a Gibbs step differ from the base row at ONE
    word (``/root/reference/gen_utils.py:71-74``), so instead of running
    the general per-row assembly over all B*k rows (whose (V, M) table
    gathers and per-row piece gathers lower to serialized scalar-core ops
    — measured ~0.9 ms/position), assemble the base piece stream once per
    image row and compose each candidate as
    ``prefix pieces | candidate pieces | shifted suffix pieces``
    with pure vector compares + small-one-hot contractions.

    Args:
      base_inner: (B, P) int32 — the base caption rows (candidates are
        substituted at ``pos``; the word there is excluded from the stream).
      cand_ids: (B, k) int32 — candidate BERT ids for the edited slot.
      pos: (B,) int32 — edited column, in ``base_inner`` coordinates.

    Returns:
      (clip_ids, attention_mask): (B, k, clip_len) int32 each — identical
      to ``assemble_clip_ids`` on the materialized candidate rows.
    """
    B, P = base_inner.shape
    k = cand_ids.shape[1]
    M = bridge_ids.shape[-1]

    # base stream WITHOUT the edited word: per-image gathers (B*P*M ints)
    base_pieces = bridge_ids[base_inner]  # (B, P, M)
    base_lens = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, P), 1) == pos[:, None],
        0,
        bridge_lens[base_inner],
    )  # (B, P)
    ends = jnp.cumsum(base_lens, axis=1)  # (B, P)
    offs = ends - base_lens
    total_base = ends[:, -1]  # (B,)
    off0 = jnp.take_along_axis(ends, pos[:, None], axis=1)[:, 0]  # (B,)

    # flatten the excluded-word stream to (B, clip_len): piece t of row b
    t = jax.lax.broadcasted_iota(jnp.int32, (clip_len,), 0)
    p_t = jnp.sum(
        (ends[:, None, :] <= t[None, :, None]).astype(jnp.int32), axis=2
    )  # (B, clip_len)
    p_t = jnp.minimum(p_t, P - 1)
    m_t = jnp.clip(t[None, :] - jnp.take_along_axis(offs, p_t, axis=1), 0, M - 1)
    stream = jnp.take_along_axis(
        base_pieces.reshape(B, P * M), p_t * M + m_t, axis=1
    )  # (B, clip_len)
    stream = jnp.where(t[None, :] < total_base[:, None], stream, 0)

    # candidate pieces: (B*k) gathers
    cand_pieces = bridge_ids[cand_ids]  # (B, k, M)
    cand_lens = bridge_lens[cand_ids]  # (B, k)

    # compose per candidate: zones in piece space
    j = jax.lax.broadcasted_iota(jnp.int32, (clip_len,), 0)
    jw = (j - 1)[None, None, :]  # (1, 1, clip_len)
    off0_b = off0[:, None, None]
    Lc = cand_lens[:, :, None]
    in_cand = (jw >= off0_b) & (jw < off0_b + Lc)
    shift = jnp.where(jw >= off0_b + Lc, Lc, 0)
    idx_base = jw - shift  # (B, k, clip_len)

    # small-one-hot contractions (int multiply+sum — vector units only,
    # never the scalar-core gather path)
    oh_base = (
        idx_base[:, :, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (clip_len,), 0)
    ).astype(jnp.int32)  # (B, k, clip_len, clip_len)
    base_val = jnp.sum(oh_base * stream[:, None, None, :], axis=-1)
    idx_cand = jw - off0_b
    oh_cand = (
        idx_cand[:, :, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (M,), 0)
    ).astype(jnp.int32)  # (B, k, clip_len, M)
    cand_val = jnp.sum(oh_cand * cand_pieces[:, :, None, :], axis=-1)
    val = jnp.where(in_cand, cand_val, base_val)

    total = total_base[:, None, None] + Lc  # (B, k, 1)
    eos_pos = jnp.minimum(1 + total, clip_len - 1)
    jb = j[None, None, :]
    out = jnp.where(
        jb == 0,
        bos_id,
        jnp.where(
            jb == eos_pos,
            eos_id,
            jnp.where((jw >= 0) & (jw < total) & (jb < eos_pos), val, pad_id),
        ),
    ).astype(jnp.int32)
    mask = (jb <= eos_pos).astype(jnp.int32)
    return out, jnp.broadcast_to(mask, (B, k, clip_len))
