"""Seeded unicode fuzz: our from-scratch tokenizers vs HF slow tokenizers.

The fixed-sentence parity tests (test_tokenizers.py) pin the common paths;
this file sweeps a few hundred adversarial random strings — mixed scripts,
combining marks, CJK, emoji, control/format chars, exotic whitespace, the
Turkish dotless-i family (the r2 case-folding hole), digits glued to
letters — through tokenize/encode/decode and asserts byte-parity with HF
(reference behavior: utils.py:48-49 encode, gen_utils.py:75 batch_decode,
clip/clip.py:71-73 CLIP re-tokenize). Deterministic (seeded); no network.
"""

import os
import random

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from conzic_tpu.text import (
    CLIPBPETokenizer,
    WordPieceTokenizer,
    make_test_bpe_files,
    make_test_wordpiece_vocab,
)

# character pools chosen to hit distinct normalizer branches: BERT's
# lowercase+strip-accents, CJK spacing, control-char removal, and CLIP's
# whitespace cleanup + byte-level BPE
POOLS = [
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "0123456789",
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~",
    "àéîöûñçßøåÆŒüÜéÉ",          # accented latin (strip-accents path)
    "ıİIi",                        # dotless/dotted i (case-folding hole, r2)
    "日本語漢字中文한국어",          # CJK + Hangul (per-char spacing path)
    "😀🌍🚀❤️\U0001F9D1",          # emoji incl. ZWJ/VS16 sequences
    " \t\n\r\x0b\x0c",            # exotic whitespace
    "  　",          # unicode spaces
    "̧́̈",          # combining marks (attach to prior char)
    "​‍﻿\x00\x7f",  # zero-width / format / control chars
    "’“”—…·",                      # typographic punctuation
]
WORDS = ["image", "of", "a", "girl", "dog", "cat", "playing", "the",
         "beautiful", "grass", "walking", "unknownword", "mixed42tokens"]


def fuzz_strings(n: int, seed: int) -> list:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.4:
                parts.append(rng.choice(WORDS))
            else:
                pool = rng.choice(POOLS)
                parts.append(
                    "".join(rng.choice(pool) for _ in range(rng.randint(1, 6)))
                )
        sep = rng.choice([" ", "", "  ", " \t ", "\n"])
        out.append(sep.join(parts))
    return out


@pytest.fixture(scope="module")
def wp_pair(tmp_path_factory):
    vocab = make_test_wordpiece_vocab(extra_words=["unknownword", "stuff", "mixed"])
    d = tmp_path_factory.mktemp("wp_fuzz")
    path = os.path.join(d, "vocab.txt")
    with open(path, "w", encoding="utf-8") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
    return WordPieceTokenizer.from_vocab_file(path), transformers.BertTokenizer(path)


@pytest.fixture(scope="module")
def bpe_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_fuzz")
    vocab_path, merges_path = make_test_bpe_files(str(d))
    return (
        CLIPBPETokenizer.from_files(vocab_path, merges_path),
        transformers.CLIPTokenizer(vocab_path, merges_path),
    )


def test_wordpiece_fuzz_encode_matches_hf(wp_pair):
    ours, hf = wp_pair
    for s in fuzz_strings(300, seed=0):
        assert ours.tokenize(s) == hf.tokenize(s), repr(s)
        assert ours.encode(s) == hf.encode(s), repr(s)


def test_wordpiece_fuzz_decode_matches_hf(wp_pair):
    ours, hf = wp_pair
    rows = [hf.encode(s) for s in fuzz_strings(150, seed=1)]
    for skip in (False, True):
        assert ours.batch_decode(rows, skip_special_tokens=skip) == \
            hf.batch_decode(rows, skip_special_tokens=skip)


def test_wordpiece_fuzz_decode_random_id_rows(wp_pair):
    """Decode parity on arbitrary in-range id rows (not just encoder
    outputs): specials mid-row, ##-pieces in illegal positions, repeats —
    the shapes the Gibbs engine actually emits (gen_utils.py:75)."""
    ours, hf = wp_pair
    rng = np.random.RandomState(2)
    v = len(hf.get_vocab())
    rows = [rng.randint(0, v, size=rng.randint(1, 20)).tolist() for _ in range(100)]
    for skip in (False, True):
        assert ours.batch_decode(rows, skip_special_tokens=skip) == \
            hf.batch_decode(rows, skip_special_tokens=skip)


def test_clip_bpe_fuzz_encode_matches_hf(bpe_pair):
    ours, hf = bpe_pair
    for s in fuzz_strings(300, seed=3):
        assert ours.tokenize(s) == hf.tokenize(s), repr(s)
        assert ours.encode(s) == hf.encode(s), repr(s)


def test_clip_bpe_fuzz_batch_encode_matches_hf(bpe_pair):
    ours, hf = bpe_pair
    texts = [s for s in fuzz_strings(100, seed=4) if s.strip()]
    enc = hf(texts, padding=True, return_tensors="np", max_length=77,
             truncation=True)
    ids, mask = ours.batch_encode(texts)
    np.testing.assert_array_equal(ids, enc["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, enc["attention_mask"].astype(np.int32))


def test_native_decoder_fuzz_matches_python(wp_pair):
    """The C++ batch decoder (native/fast_text.cc) against the Python
    WordPiece decode on random id rows, both skip modes."""
    ours, _ = wp_pair
    from conzic_tpu.text import native

    if not native.available():
        pytest.skip("native decoder not built")
    dec = native.NativeWordPieceDecoder(ours)
    rng = np.random.RandomState(5)
    v = ours.vocab_size
    # rectangular (B, S) rows — the engine's shape (ragged input is not
    # part of the native contract; Python batch_decode is the fallback)
    for length in (1, 7, 20):
        rows = rng.randint(0, v, size=(50, length)).astype(np.int32)
        for skip in (False, True):
            assert dec.batch_decode(rows, skip_special_tokens=skip) == \
                ours.batch_decode(rows.tolist(), skip_special_tokens=skip)
