"""End-to-end checkpoint loading: HF ``save_pretrained`` directories ->
``Captioner.from_pretrained`` -> generation.

This is the production path (``--lm_model``/``--match_model`` checkpoint
dirs, /root/reference loads the same artifacts via transformers at
demo.py:125-128): config.json + model weights + tokenizer files on disk,
read by conzic_tpu's own loaders (models/convert.py, text/*.py) with no
HF runtime in the loop. Forward outputs are pinned against the torch
models that produced the checkpoints.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine.sampler import Captioner
from conzic_tpu.models.clip import CLIPModel
from conzic_tpu.text.vocab import (
    make_test_bpe_files,
    make_test_wordpiece_vocab,
)


@pytest.fixture(scope="module")
def checkpoint_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    lm_dir, match_dir = str(root / "bert"), str(root / "clip")

    vocab = make_test_wordpiece_vocab()
    wp_path = root / "vocab.txt"
    with open(wp_path, "w", encoding="utf-8") as f:
        for tok in sorted(vocab, key=vocab.get):
            f.write(tok + "\n")
    wp_tok = transformers.BertTokenizer(str(wp_path))
    bpe_files = make_test_bpe_files(str(root))
    bpe_tok = transformers.CLIPTokenizer(*bpe_files)

    torch.manual_seed(0)
    bert = transformers.BertForMaskedLM(
        transformers.BertConfig(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
        )
    ).eval()
    clip = transformers.CLIPModel(
        transformers.CLIPConfig(
            text_config=dict(
                vocab_size=len(bpe_tok.encoder), hidden_size=32,
                num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=64,
                eos_token_id=bpe_tok.eos_token_id,
                bos_token_id=bpe_tok.bos_token_id,
            ),
            vision_config=dict(
                hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=96, image_size=32, patch_size=8,
            ),
            projection_dim=24,
        )
    ).eval()
    bert.save_pretrained(lm_dir)
    wp_tok.save_pretrained(lm_dir)
    clip.save_pretrained(match_dir)
    bpe_tok.save_pretrained(match_dir)
    return lm_dir, match_dir, bert, clip


def test_from_pretrained_loads_and_matches_torch(checkpoint_dirs):
    lm_dir, match_dir, hf_bert, hf_clip = checkpoint_dirs
    cfg = ConzicConfig(dtype="float32")
    cfg.lm_model, cfg.match_model = lm_dir, match_dir
    cap = Captioner.from_pretrained(cfg)

    # tokenizer artifacts loaded from disk
    assert cap.wp.vocab_size == hf_bert.config.vocab_size
    assert cap.bpe.eos_token_id == hf_clip.config.text_config.eos_token_id

    # BERT forward parity through the disk path
    ids = np.random.RandomState(0).randint(
        0, cap.wp.vocab_size, size=(2, 9)
    ).astype(np.int32)
    with torch.no_grad():
        ref = hf_bert(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(
        cap.bert_model.apply({"params": cap.params["bert"]}, jnp.asarray(ids))
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    # CLIP text forward parity through the disk path
    S, eos = 10, cap.bpe.eos_token_id
    tids = np.random.RandomState(1).randint(1, 60, size=(3, S)).astype(np.int32)
    tids[:, -1] = eos
    mask = np.ones((3, S), np.int32)
    with torch.no_grad():
        tref = hf_clip.get_text_features(
            torch.tensor(tids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).numpy()
    tgot = np.asarray(
        cap.clip_model.apply(
            {"params": cap.params["clip"]}, jnp.asarray(tids),
            jnp.asarray(mask), method=CLIPModel.encode_text,
        )
    )
    np.testing.assert_allclose(tgot, tref, rtol=5e-4, atol=5e-4)


def test_from_pretrained_generates(checkpoint_dirs):
    lm_dir, match_dir, _, _ = checkpoint_dirs
    cfg = ConzicConfig(dtype="float32")
    cfg.lm_model, cfg.match_model = lm_dir, match_dir
    cfg.verbose = False
    cap = Captioner.from_pretrained(cfg)
    rng = np.random.RandomState(2)
    embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    res = cap.run(
        embeds, prompt="Image of a", max_len=3, top_k=4, temperature=0.1,
        max_iter=1, alpha=0.02, beta=2.0, order="sequential",
        rng=np.random.RandomState(4),
    )
    assert len(res.gen_texts_list) == 2
    assert res.gen_texts_list[0][0].startswith("image of a")
