from conzic_tpu.text.bpe import CLIPBPETokenizer
from conzic_tpu.text.bridge import BridgeTable, assemble_clip_ids, build_bridge_table
from conzic_tpu.text.vocab import (
    build_stop_ids,
    build_token_masks,
    load_stop_words_file,
    make_test_bpe_files,
    make_test_wordpiece_vocab,
)
from conzic_tpu.text.wordpiece import WordPieceTokenizer

__all__ = [
    "CLIPBPETokenizer",
    "WordPieceTokenizer",
    "BridgeTable",
    "assemble_clip_ids",
    "build_bridge_table",
    "build_stop_ids",
    "build_token_masks",
    "load_stop_words_file",
    "make_test_bpe_files",
    "make_test_wordpiece_vocab",
]
