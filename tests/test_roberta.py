"""RoBERTa model-family support: tokenizer + model parity, engine run.

The reference's --lm_model works with any HF masked-LM ("bert,roberta",
demo.py:63-64); these tests pin our byte-BPE tokenizer to HF
RobertaTokenizer and our converted RobertaForMaskedLM to HF torch outputs.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from conzic_tpu.models import BertForMaskedLM
from conzic_tpu.models.configs import BertConfig
from conzic_tpu.models.convert import (
    bert_params_from_state_dict,
    torch_state_dict_to_numpy,
)
from conzic_tpu.text.roberta_bpe import RobertaBPETokenizer
from conzic_tpu.text.vocab import make_test_roberta_files

SENTENCES = [
    "image of a girl",
    "the dog sitting",  # 'sitting' has no merges -> char pieces
    "a big red dog playing",
    "the cat, run!",
    "",
]


@pytest.fixture(scope="module")
def rob_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("rob")
    vocab_path, merges_path = make_test_roberta_files(str(d))
    ours = RobertaBPETokenizer.from_files(vocab_path, merges_path)
    hf = transformers.RobertaTokenizer(vocab_path, merges_path)
    return ours, hf


def test_roberta_tokenize_matches_hf(rob_pair):
    ours, hf = rob_pair
    for s in SENTENCES:
        assert ours.tokenize(s) == hf.tokenize(s), s
        assert ours.encode(s) == hf.encode(s), s


def test_roberta_mask_token_inline(rob_pair):
    ours, hf = rob_pair
    text = "image of a" + "<mask>" * 3
    assert ours.encode(text) == hf.encode(text)


def test_roberta_decode_matches_hf(rob_pair):
    ours, hf = rob_pair
    rows = [
        hf.encode("image of a girl"),
        hf.encode("the dog<mask><mask> run"),
    ]
    for skip in (False, True):
        assert ours.batch_decode(rows, skip) == hf.batch_decode(
            rows, skip_special_tokens=skip
        )


def test_roberta_model_parity():
    """Converted RobertaForMaskedLM == HF torch outputs (position offset,
    lm_head naming)."""
    cfg = BertConfig(
        vocab_size=101, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=40, type_vocab_size=1,
        layer_norm_eps=1e-5, pad_token_id=1, position_offset=2,
    )
    hf_cfg = transformers.RobertaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=1, layer_norm_eps=1e-5, pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = transformers.RobertaForMaskedLM(hf_cfg).eval()
    params = bert_params_from_state_dict(torch_state_dict_to_numpy(hf), cfg)
    ids = np.random.randint(4, cfg.vocab_size, size=(2, 9)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    model = BertForMaskedLM(cfg)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_engine_runs_with_roberta_tokenizer(tmp_path):
    """Full Gibbs generation with the byte-BPE tokenizer (bridge, masks,
    lexicons all byte-level-aware)."""
    import os

    from conzic_tpu.engine import Captioner
    from conzic_tpu.models.configs import CLIPConfig
    from conzic_tpu.text.bpe import CLIPBPETokenizer
    from conzic_tpu.text.vocab import make_test_bpe_files

    vocab_path, merges_path = make_test_roberta_files(str(tmp_path))
    rob = RobertaBPETokenizer.from_files(vocab_path, merges_path)
    clip_bpe = CLIPBPETokenizer.from_files(*make_test_bpe_files(str(tmp_path)))
    bert_cfg = BertConfig(
        vocab_size=rob.vocab_size, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=1,
        pad_token_id=1, position_offset=2,
    )
    clip_cfg = CLIPConfig.tiny()
    clip_cfg = dataclasses.replace(
        clip_cfg,
        text=dataclasses.replace(
            clip_cfg.text,
            vocab_size=max(clip_cfg.text.vocab_size, clip_bpe.vocab_size),
            eos_token_id=clip_bpe.eos_token_id,
        ),
    )
    import jax

    bert = BertForMaskedLM(bert_cfg)
    from conzic_tpu.models.clip import CLIPModel

    clip = CLIPModel(clip_cfg)
    bert_params = bert.init_params(jax.random.PRNGKey(0))
    clip_params = clip.init_params(jax.random.PRNGKey(1))
    cap = Captioner(bert, bert_params, clip, clip_params, rob, clip_bpe)
    cap.cfg.verbose = False
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        rng.randn(1, clip_cfg.projection_dim).astype(np.float32)
    )
    r = cap.run(
        embeds, prompt="image of a", max_len=4, top_k=6, temperature=0.1,
        max_iter=2, alpha=0.02, beta=2.0, order="sequential",
    )
    assert len(r.gen_texts_list) == 3
    final = r.gen_texts_list[-2][0]
    assert final.startswith("image of a")
    # committed tokens decode to space-separated words, no markers leak
    assert "Ġ" not in final and "<mask>" not in final


def test_roberta_trailing_space_prompt(tmp_path):
    """seed_len derives from the encoded row: a trailing prompt space
    (absorbed by <mask> lstrip) must not desynchronize the engine."""
    vocab_path, merges_path = make_test_roberta_files(str(tmp_path))
    rob = RobertaBPETokenizer.from_files(vocab_path, merges_path)
    text_a = "image of a" + rob.mask_token * 3
    text_b = "image of a " + rob.mask_token * 3
    assert rob.encode(text_a) == rob.encode(text_b)  # lstrip semantics
