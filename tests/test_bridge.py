"""Device-side CLIP sequence assembly == host decode->re-tokenize path.

The bridge replaces the reference's per-candidate host round-trip
(gen_utils.py:75 batch_decode + clip/clip.py:71-73 re-tokenize). For
whole-word candidates the two must agree exactly.
"""

import os

import numpy as np
import pytest

from conzic_tpu.text import (
    CLIPBPETokenizer,
    WordPieceTokenizer,
    assemble_clip_ids,
    build_bridge_table,
    make_test_bpe_files,
    make_test_wordpiece_vocab,
)


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    d = tmp_path_factory.mktemp("bridge")
    vocab = make_test_wordpiece_vocab()
    wp_path = os.path.join(d, "vocab.txt")
    with open(wp_path, "w", encoding="utf-8") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
    wp = WordPieceTokenizer.from_vocab_file(wp_path)
    bpe = CLIPBPETokenizer.from_files(*make_test_bpe_files(str(d)))
    return wp, bpe


def _host_clip_ids(wp, bpe, bert_rows, clip_len):
    texts = wp.batch_decode(bert_rows, skip_special_tokens=True)
    ids, mask = bpe.batch_encode(texts, max_length=clip_len, pad_to_max=True)
    return ids, mask


def test_bridge_assembly_matches_host_path(toks):
    wp, bpe = toks
    import jax.numpy as jnp

    bridge = build_bridge_table(wp, bpe)
    clip_len = 32

    sentences = [
        "Image of a girl playing with a dog.",
        "image of a beautiful sunny beach",
        "the cat sitting on grass",
    ]
    # full BERT rows including CLS/SEP; bridge path gets the inner span
    rows = [wp.encode(s) for s in sentences]
    width = max(len(r) for r in rows)
    rows = [r + [wp.pad_token_id] * (width - len(r)) for r in rows]
    bert = np.asarray(rows, np.int32)
    inner = bert[:, 1:-1]  # strip CLS and SEP (specials bridge to len 0 anyway)

    got_ids, got_mask = assemble_clip_ids(
        jnp.asarray(inner),
        jnp.asarray(bridge.ids),
        jnp.asarray(bridge.lens),
        bos_id=bridge.bos_id,
        eos_id=bridge.eos_id,
        pad_id=bridge.pad_id,
        clip_len=clip_len,
    )
    ref_ids, ref_mask = _host_clip_ids(wp, bpe, bert, clip_len)
    np.testing.assert_array_equal(np.asarray(got_ids), ref_ids)
    np.testing.assert_array_equal(np.asarray(got_mask), ref_mask)


def test_bridge_with_masked_positions(toks):
    """[MASK]/[PAD] slots contribute nothing, as with skip_special_tokens."""
    wp, bpe = toks
    import jax.numpy as jnp

    bridge = build_bridge_table(wp, bpe)
    clip_len = 32
    text = "Image of a" + "[MASK]" * 4
    row = np.asarray([wp.encode(text)], np.int32)
    got_ids, _ = assemble_clip_ids(
        jnp.asarray(row[:, 1:-1]),
        jnp.asarray(bridge.ids),
        jnp.asarray(bridge.lens),
        bos_id=bridge.bos_id,
        eos_id=bridge.eos_id,
        pad_id=bridge.pad_id,
        clip_len=clip_len,
    )
    ref_ids, _ = _host_clip_ids(wp, bpe, row, clip_len)
    np.testing.assert_array_equal(np.asarray(got_ids), ref_ids)
