"""ctypes bindings for the C++ fast_text library (native/fast_text.cc).

Build: ``make -C native`` (or it is built on demand if a compiler is
available). The Python tokenizers in this package are the canonical
implementations; the native library accelerates the batch host paths
(snapshot decoding, corpus BPE encoding, bridge-table construction) and is
pinned to identical behavior by tests. All entry points degrade gracefully
to the Python implementations when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfast_text.so"))

_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ft_wordpiece_new.restype = ctypes.c_void_p
    lib.ft_wordpiece_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,  # unk id (substituted for out-of-range ids)
    ]
    lib.ft_wordpiece_free.argtypes = [ctypes.c_void_p]
    lib.ft_wordpiece_batch_decode.restype = ctypes.c_int64
    lib.ft_wordpiece_batch_decode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.c_int64,
    ]
    lib.ft_bpe_new.restype = ctypes.c_void_p
    lib.ft_bpe_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.ft_bpe_free.argtypes = [ctypes.c_void_p]
    lib.ft_bpe_encode_words.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


def _char_pp(strings: Sequence[bytes]):
    arr = (ctypes.c_char_p * len(strings))()
    arr[:] = list(strings)
    return arr


class NativeWordPieceDecoder:
    """Batch id-rows -> decoded strings, identical to
    WordPieceTokenizer.batch_decode."""

    def __init__(self, wp) -> None:
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("fast_text library unavailable")
        self._lib = lib
        tokens = sorted(wp.vocab, key=wp.vocab.get)
        special_ids = np.asarray(
            [wp.vocab[t] for t in wp.special_tokens], np.int32
        )
        self._handle = lib.ft_wordpiece_new(
            _char_pp([t.encode("utf-8") for t in tokens]),
            len(tokens),
            special_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(special_ids),
            wp.vocab.get(wp.unk_token, -1),
        )

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.ft_wordpiece_free(self._handle)
            self._handle = None

    def batch_decode(
        self, batch_ids, skip_special_tokens: bool = False
    ) -> List[str]:
        ids = np.ascontiguousarray(np.asarray(batch_ids, np.int32))
        if ids.ndim == 1:
            ids = ids[None]
        n_rows, row_len = ids.shape
        if n_rows == 0:
            return []  # "".split("\n") would invent one phantom row
        cap = max(4096, n_rows * row_len * 12)
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.ft_wordpiece_batch_decode(
                self._handle,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n_rows,
                row_len,
                1 if skip_special_tokens else 0,
                buf,
                cap,
            )
            if n >= 0:
                return buf.raw[:n].decode("utf-8").split("\n")
            cap *= 2


class NativeBpeWordEncoder:
    """Pre-normalized word -> BPE ids, identical to
    CLIPBPETokenizer.encode_word_ids for single lowercase words."""

    def __init__(self, bpe) -> None:
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("fast_text library unavailable")
        self._lib = lib
        self._bpe = bpe
        toks = list(bpe.encoder.items())
        merges = sorted(bpe.bpe_ranks.items(), key=lambda kv: kv[1])
        ids = np.asarray([i for _, i in toks], np.int32)
        self._handle = lib.ft_bpe_new(
            _char_pp([t.encode("utf-8") for t, _ in toks]),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(toks),
            _char_pp([a.encode("utf-8") for (a, _), _ in merges]),
            _char_pp([b.encode("utf-8") for (_, b), _ in merges]),
            len(merges),
            bpe.encoder[bpe.unk_token],
        )

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.ft_bpe_free(self._handle)
            self._handle = None

    def encode_words(
        self, words: Sequence[str], max_pieces: int = 16
    ):
        """Returns (ids (N, max_pieces), lens (N,)). Words must already be
        normalized + byte-encoded printable (ASCII lowercase words are)."""
        n = len(words)
        out_ids = np.zeros((n, max_pieces), np.int32)
        out_lens = np.zeros((n,), np.int32)
        self._lib.ft_bpe_encode_words(
            self._handle,
            _char_pp([w.encode("utf-8") for w in words]),
            n,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_pieces,
        )
        return out_ids, out_lens
