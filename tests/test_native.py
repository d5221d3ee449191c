"""Native (C++) batch text pipeline == Python canonical implementations."""

import os

import numpy as np
import pytest

from conzic_tpu.text import (
    CLIPBPETokenizer,
    WordPieceTokenizer,
    make_test_bpe_files,
    make_test_wordpiece_vocab,
)
from conzic_tpu.text import native


@pytest.fixture(scope="module")
def toks(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    vocab = make_test_wordpiece_vocab()
    wp_path = os.path.join(d, "vocab.txt")
    with open(wp_path, "w", encoding="utf-8") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
    wp = WordPieceTokenizer.from_vocab_file(wp_path)
    bpe = CLIPBPETokenizer.from_files(*make_test_bpe_files(str(d)))
    return wp, bpe


pytestmark = pytest.mark.skipif(
    not native.available(), reason="fast_text library not built"
)


def test_native_wordpiece_batch_decode_matches_python(toks):
    wp, _ = toks
    dec = native.NativeWordPieceDecoder(wp)
    rows = [
        wp.encode("Image of a girl playing with a dog."),
        wp.encode("the cat[MASK][MASK] sitting."),
        wp.encode("walking walk ##ing"),
        [wp.pad_token_id] * 8,
    ]
    width = max(len(r) for r in rows)
    rows = [r + [wp.pad_token_id] * (width - len(r)) for r in rows]
    ids = np.asarray(rows, np.int32)
    for skip in (False, True):
        assert dec.batch_decode(ids, skip) == wp.batch_decode(ids, skip)


def test_native_bpe_word_encode_matches_python(toks):
    _, bpe = toks
    enc = native.NativeBpeWordEncoder(bpe)
    words = ["girl", "playing", "the", "dog", "beautiful", "a", "x",
             "walking", "sunny"]
    ids, lens = enc.encode_words(words)
    for i, w in enumerate(words):
        assert ids[i, : lens[i]].tolist() == bpe.encode_word_ids(w), w


def test_native_decode_row_leading_continuation(toks):
    """A row-leading '##' piece keeps its marker, matching Python's
    ' '.join().replace(' ##','') semantics exactly."""
    wp, _ = toks
    dec = native.NativeWordPieceDecoder(wp)
    ing = wp.vocab["##ing"]
    dog = wp.vocab["dog"]
    rows = np.asarray([[ing, dog], [dog, ing]], np.int32)
    assert dec.batch_decode(rows, True) == wp.batch_decode(rows, True)
    assert dec.batch_decode(rows, True)[0] == "##ing dog"
    assert dec.batch_decode(rows, True)[1] == "doging"


def test_native_decode_out_of_range_ids_match_python(toks):
    """Python maps unknown ids to the UNK token (HF get(index, unk_token));
    the native decoder must do the same, not silently skip them."""
    wp, _ = toks
    dec = native.NativeWordPieceDecoder(wp)
    row = np.asarray([[wp.vocab["the"], -1, wp.vocab_size + 7,
                       wp.vocab["cat"]]], np.int32)
    for skip in (False, True):
        assert dec.batch_decode(row, skip) == wp.batch_decode(row, skip)
    # and the UNK substitution is visible when specials are kept
    assert wp.unk_token in dec.batch_decode(row, False)[0]


def test_native_decode_empty_batch_matches_python(toks):
    wp, _ = toks
    dec = native.NativeWordPieceDecoder(wp)
    empty = np.zeros((0, 5), np.int32)
    assert dec.batch_decode(empty, True) == wp.batch_decode(empty, True) == []


def test_native_bpe_word_encode_fuzz_matches_python(toks):
    """Seeded fuzz: the C++ word encoder against the Python BPE on random
    lowercase-LETTER words of widely varied lengths — its documented
    contract and exactly the subset the bridge builder routes to it
    (bridge.py gates on isascii+islower+isalpha; digit/mixed words go
    through the Python path because the CLIP pre-tokenizer regex splits
    them into sub-tokens, each with its own </w> — see the boundary test
    in tests/test_bridge.py)."""
    import random
    import string

    _, bpe = toks
    enc = native.NativeBpeWordEncoder(bpe)
    rng = random.Random(9)
    words = [
        "".join(rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(1, 24)))
        for _ in range(300)
    ]
    max_pieces = max(len(bpe.encode_word_ids(w)) for w in words)
    ids, lens = enc.encode_words(words, max_pieces=max_pieces)
    for i, w in enumerate(words):
        assert ids[i, : lens[i]].tolist() == bpe.encode_word_ids(w), w
