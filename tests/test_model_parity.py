"""Forward-pass parity of the JAX models vs HF torch implementations.

No pretrained downloads are available in this environment, so parity is
checked against randomly initialized HF models of identical architecture:
instantiate torch model from config -> convert its state dict with
conzic_tpu.models.convert -> compare forward outputs. This validates the
full conversion + architecture (layer ordering, activation choice, masking,
pooling) to float tolerance, which is exactly what matters for checkpoint
compatibility (SURVEY.md §4 "unit" strategy).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from conzic_tpu.models import BertForMaskedLM, CLIPModel
from conzic_tpu.models.configs import (
    BertConfig,
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)
from conzic_tpu.models.convert import (
    bert_params_from_state_dict,
    clip_params_from_state_dict,
    torch_state_dict_to_numpy,
)

TINY_BERT = BertConfig.tiny(vocab_size=211)
TINY_CLIP = CLIPConfig(
    text=CLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=77,
        eos_token_id=98,
    ),
    vision=CLIPVisionConfig(
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        intermediate_size=96,
        image_size=32,
        patch_size=8,
    ),
    projection_dim=24,
)


def _hf_bert(config: BertConfig):
    hf_cfg = transformers.BertConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_layers,
        num_attention_heads=config.num_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        type_vocab_size=config.type_vocab_size,
        layer_norm_eps=config.layer_norm_eps,
        hidden_act=config.hidden_act,
    )
    torch.manual_seed(0)
    model = transformers.BertForMaskedLM(hf_cfg)
    model.eval()
    return model


def _hf_clip(config: CLIPConfig):
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=config.text.vocab_size,
            hidden_size=config.text.hidden_size,
            num_hidden_layers=config.text.num_layers,
            num_attention_heads=config.text.num_heads,
            intermediate_size=config.text.intermediate_size,
            max_position_embeddings=config.text.max_position_embeddings,
            eos_token_id=config.text.eos_token_id,
            bos_token_id=config.text.eos_token_id - 1,
        ),
        vision_config=dict(
            hidden_size=config.vision.hidden_size,
            num_hidden_layers=config.vision.num_layers,
            num_attention_heads=config.vision.num_heads,
            intermediate_size=config.vision.intermediate_size,
            image_size=config.vision.image_size,
            patch_size=config.vision.patch_size,
        ),
        projection_dim=config.projection_dim,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg)
    model.eval()
    return model


def test_bert_mlm_logits_match_hf():
    hf = _hf_bert(TINY_BERT)
    params = bert_params_from_state_dict(torch_state_dict_to_numpy(hf), TINY_BERT)

    ids = np.random.randint(0, TINY_BERT.vocab_size, size=(3, 13)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()

    model = BertForMaskedLM(TINY_BERT)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_bert_respects_attention_mask():
    hf = _hf_bert(TINY_BERT)
    params = bert_params_from_state_dict(torch_state_dict_to_numpy(hf), TINY_BERT)
    ids = np.random.randint(0, TINY_BERT.vocab_size, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[:, 7:] = 0
    with torch.no_grad():
        ref = hf(
            torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).logits.numpy()
    model = BertForMaskedLM(TINY_BERT)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got[:, :7], ref[:, :7], rtol=2e-4, atol=2e-4)


def test_clip_text_and_image_embeds_match_hf():
    hf = _hf_clip(TINY_CLIP)
    params = clip_params_from_state_dict(torch_state_dict_to_numpy(hf), TINY_CLIP)
    model = CLIPModel(TINY_CLIP)

    # --- text: right-padded, EOS marks the pooling position ---
    S = 12
    eos = TINY_CLIP.text.eos_token_id
    ids = np.random.randint(1, eos - 1, size=(4, S)).astype(np.int32)
    lengths = [5, 12, 8, 3]
    mask = np.zeros((4, S), np.int32)
    for r, L in enumerate(lengths):
        ids[r, L - 1] = eos
        ids[r, L:] = 0
        mask[r, :L] = 1
    with torch.no_grad():
        ref_text = hf.get_text_features(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).numpy()
    got_text = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(ids),
            jnp.asarray(mask),
            method=CLIPModel.encode_text,
        )
    )
    np.testing.assert_allclose(got_text, ref_text, rtol=2e-4, atol=2e-4)

    # --- image ---
    img = np.random.randn(
        2, TINY_CLIP.vision.image_size, TINY_CLIP.vision.image_size, 3
    ).astype(np.float32)
    with torch.no_grad():
        ref_img = hf.get_image_features(
            pixel_values=torch.tensor(img.transpose(0, 3, 1, 2))
        ).numpy()
    got_img = np.asarray(
        model.apply({"params": params}, jnp.asarray(img), method=CLIPModel.encode_image)
    )
    np.testing.assert_allclose(got_img, ref_img, rtol=2e-4, atol=2e-4)


def test_clip_similarity_reference_semantics():
    """similarity() == softmax over K of exp(logit_scale)*cosine, plus raw
    cosine — reference formula at clip/clip.py:86-98."""
    hf = _hf_clip(TINY_CLIP)
    params = clip_params_from_state_dict(torch_state_dict_to_numpy(hf), TINY_CLIP)
    model = CLIPModel(TINY_CLIP)

    B, K, D = 2, 5, TINY_CLIP.projection_dim
    img = np.random.randn(B, D).astype(np.float32)
    txt = np.random.randn(B * K, D).astype(np.float32)
    probs, cos = model.apply(
        {"params": params},
        jnp.asarray(img),
        jnp.asarray(txt),
        method=CLIPModel.similarity,
    )
    # numpy reference
    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    txtn = txt.reshape(B, K, D)
    txtn = txtn / np.linalg.norm(txtn, axis=-1, keepdims=True)
    cos_ref = np.einsum("bkd,bd->bk", txtn, imgn)
    scale = np.exp(float(params["logit_scale"]))
    z = cos_ref * scale
    probs_ref = np.exp(z - z.max(-1, keepdims=True))
    probs_ref = probs_ref / probs_ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(cos), cos_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), probs_ref, rtol=1e-5, atol=1e-5)


def test_scan_layers_equals_unrolled():
    """TransformerStack(scan_layers=True) with stacked params == the
    unrolled stack — validates both the scan path and the param re-pack."""
    import jax
    from conzic_tpu.models.convert import params_with_scanned_encoders

    hf = _hf_bert(TINY_BERT)
    params = bert_params_from_state_dict(torch_state_dict_to_numpy(hf), TINY_BERT)
    ids = np.random.randint(0, TINY_BERT.vocab_size, size=(2, 9)).astype(np.int32)

    unrolled = BertForMaskedLM(TINY_BERT)
    ref = np.asarray(unrolled.apply({"params": params}, jnp.asarray(ids)))

    scanned = BertForMaskedLM(TINY_BERT, scan_layers=True)
    sp = params_with_scanned_encoders(params)
    got = np.asarray(scanned.apply({"params": sp}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fullsize_bert_and_clip_drift_vs_torch():
    """Full-size (12L/768H BERT, real-shape CLIP text tower) numeric drift
    vs HF torch, fp32 and bf16 — the closest available proxy to a
    real-checkpoint golden harness (no downloads in this environment).
    Measured deltas are recorded in PARITY.md §Numerical parity."""
    bert_cfg = BertConfig()  # real bert-base shape, vocab included
    hf = _hf_bert(bert_cfg)
    params = bert_params_from_state_dict(torch_state_dict_to_numpy(hf), bert_cfg)
    ids = np.random.RandomState(0).randint(
        0, bert_cfg.vocab_size, size=(2, 17)
    ).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got32 = np.asarray(
        BertForMaskedLM(bert_cfg).apply({"params": params}, jnp.asarray(ids))
    )
    np.testing.assert_allclose(got32, ref, rtol=5e-3, atol=5e-3)
    got16 = np.asarray(
        BertForMaskedLM(bert_cfg, dtype=jnp.bfloat16).apply(
            {"params": params}, jnp.asarray(ids)
        )
    ).astype(np.float32)
    # bf16 compute: logits drift grows with depth; what matters for the
    # engine is proposal RANK stability at the masked slot
    top_ref = np.argsort(-ref, axis=-1)[..., :10]
    top_16 = np.argsort(-got16, axis=-1)[..., :10]
    overlap = np.mean([
        len(set(a) & set(b)) / 10.0
        for a, b in zip(top_ref.reshape(-1, 10), top_16.reshape(-1, 10))
    ])
    assert overlap >= 0.8, f"bf16 top-10 proposal overlap {overlap:.2f}"

    clip_cfg = CLIPConfig()  # real clip-vit-base-patch32 text shape
    hf_clip = _hf_clip(clip_cfg)
    cparams = clip_params_from_state_dict(
        torch_state_dict_to_numpy(hf_clip), clip_cfg
    )
    S, eos = 24, clip_cfg.text.eos_token_id
    tids = np.random.RandomState(1).randint(
        1, eos - 1, size=(4, S)
    ).astype(np.int32)
    tids[:, -1] = eos
    mask = np.ones((4, S), np.int32)
    with torch.no_grad():
        tref = hf_clip.get_text_features(
            torch.tensor(tids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).numpy()

    def cosines(dtype):
        emb = np.asarray(
            CLIPModel(clip_cfg, dtype=dtype).apply(
                {"params": cparams}, jnp.asarray(tids), jnp.asarray(mask),
                method=CLIPModel.encode_text,
            )
        ).astype(np.float32)
        a = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        b = tref / np.linalg.norm(tref, axis=-1, keepdims=True)
        return (a * b).sum(-1)

    cos32 = cosines(jnp.float32)
    cos16 = cosines(jnp.bfloat16)
    assert cos32.min() > 1 - 1e-5, cos32  # fp32: embedding parity
    # bf16 embedding-cosine drift — the number PARITY.md cites
    assert cos16.min() > 0.99, cos16
    print(f"fullsize drift: bert bf16 top-10 overlap={overlap:.3f}, "
          f"clip bf16 embed cosine min={cos16.min():.5f}")


def test_clip_vit_l_shaped_config_parity():
    """Conversion/architecture generality beyond ViT-B/32: a ViT-L/14
    SHAPED config (patch 14, non-power-of-two head ratios, deeper text
    tower) converts and matches HF torch — the reference's --match_model
    accepts any CLIP checkpoint (clip/clip.py:12), so the rebuild's
    converter must be shape-generic, not hardcoded to B/32."""
    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=99, hidden_size=40, num_layers=3, num_heads=5,
            intermediate_size=80, max_position_embeddings=77,
            eos_token_id=98,
        ),
        vision=CLIPVisionConfig(
            hidden_size=56, num_layers=2, num_heads=7,
            intermediate_size=112, image_size=28, patch_size=14,
        ),
        projection_dim=32,
    )
    hf = _hf_clip(cfg)
    params = clip_params_from_state_dict(torch_state_dict_to_numpy(hf), cfg)
    model = CLIPModel(cfg)

    eos = cfg.text.eos_token_id
    ids = np.random.randint(1, eos - 1, size=(2, 9)).astype(np.int32)
    ids[:, -1] = eos
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref_text = hf.get_text_features(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).numpy()
    got_text = np.asarray(
        model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask),
                    method=CLIPModel.encode_text)
    )
    np.testing.assert_allclose(got_text, ref_text, rtol=2e-4, atol=2e-4)

    img = np.random.randn(2, cfg.vision.image_size, cfg.vision.image_size,
                          3).astype(np.float32)
    with torch.no_grad():
        ref_img = hf.get_image_features(
            pixel_values=torch.tensor(img).permute(0, 3, 1, 2)
        ).numpy()
    got_img = np.asarray(
        model.apply({"params": params}, jnp.asarray(img),
                    method=CLIPModel.encode_image)
    )
    np.testing.assert_allclose(got_img, ref_img, rtol=2e-4, atol=2e-4)
