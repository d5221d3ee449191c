"""The trained-tiny pipeline: synthetic world, word-level BPE, flax
checkpoint round-trip, Captioner loading, trainer smoke, and the
trained-cells harness (VERDICT r3 item 1).

All CPU (conftest forces the backend); the committed trained_tiny/
checkpoint is produced on the TPU by tools/train_tiny.py.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conzic_tpu.data import synthetic as syn  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dataset_is_deterministic():
    a_imgs, a_caps, a_scenes = syn.build_dataset(6, seed=3)
    b_imgs, b_caps, b_scenes = syn.build_dataset(6, seed=3)
    assert (a_imgs == b_imgs).all()
    assert a_caps == b_caps
    assert a_scenes == b_scenes
    # different seed -> different world
    c_imgs, c_caps, _ = syn.build_dataset(6, seed=4)
    assert a_caps != c_caps


def test_captions_stay_inside_the_vocab():
    vocab = syn.make_tiny_wordpiece_vocab(4096)
    _, caps, _ = syn.build_dataset(64, seed=1)
    for c in caps:
        for w in c.split():
            assert w in vocab, (w, c)


def test_scenes_render_their_objects():
    # the object's color must actually appear in the rendered pixels
    imgs, _, scenes = syn.build_dataset(16, seed=2)
    for img, scene in zip(imgs, scenes):
        for obj in scene.objects:
            rgb = np.asarray(syn.COLORS[obj.color])
            dist = np.abs(img.astype(int) - rgb).sum(-1)
            assert (dist < 30).any(), (obj, scene)


def test_word_bpe_single_token_property(tmp_path):
    from conzic_tpu.text.bpe import CLIPBPETokenizer

    vocab = syn.make_tiny_wordpiece_vocab(512)
    vp, mp = syn.make_word_bpe_files(list(vocab), str(tmp_path))
    tok = CLIPBPETokenizer.from_files(vp, mp)
    words = [w for w in vocab if w.isalpha()]
    assert words
    for w in words:
        pieces = tok._bpe(w).split(" ")
        assert pieces == [w + "</w>"], (w, pieces)
    # arbitrary out-of-vocab text still tokenizes (char fallback, no UNKs)
    ids = tok.encode("zzxqy unknownword")
    assert all(i in tok.decoder for i in ids)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from conzic_tpu.models.bert import BertForMaskedLM
    from conzic_tpu.models.checkpoint import (
        is_tiny_checkpoint,
        load_tiny_checkpoint,
        save_tiny_checkpoint,
    )
    from conzic_tpu.models.clip import CLIPModel
    from conzic_tpu.models.configs import BertConfig, CLIPConfig

    vocab = syn.make_tiny_wordpiece_vocab(128)
    vp, mp = syn.make_word_bpe_files(list(vocab), str(tmp_path))
    bcfg = BertConfig.tiny(vocab_size=len(vocab))
    ccfg = CLIPConfig.tiny()
    key = jax.random.PRNGKey(0)
    bparams = BertForMaskedLM(bcfg).init_params(key)
    cparams = CLIPModel(ccfg).init_params(key)
    out = str(tmp_path / "ckpt")
    save_tiny_checkpoint(out, bcfg, bparams, ccfg, cparams, vocab, vp, mp,
                         meta={"hello": 1}, save_dtype="float32")
    assert is_tiny_checkpoint(out)
    b2cfg, b2, c2cfg, c2, doc = load_tiny_checkpoint(out)
    assert b2cfg == bcfg and c2cfg == ccfg
    assert doc["meta"]["hello"] == 1
    flat1 = jax.tree.leaves(bparams)
    flat2 = jax.tree.leaves(b2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bf16 save halves float leaves but preserves structure
    save_tiny_checkpoint(out, bcfg, bparams, ccfg, cparams, vocab, vp, mp,
                         save_dtype="bfloat16")
    _, b3, _, _, doc3 = load_tiny_checkpoint(out)
    assert doc3["save_dtype"] == "bfloat16"
    assert jax.tree.leaves(b3)[0].dtype == jnp.bfloat16


@pytest.fixture(scope="module")
def smoke_checkpoint(tmp_path_factory):
    """One CI-sized trained checkpoint shared by the loading/engine/cells
    tests (the trainer is the expensive part)."""
    out = str(tmp_path_factory.mktemp("tt") / "ckpt")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_tiny.py"),
         "--out", out, "--device", "cpu", "--smoke",
         "--train_n", "64", "--val_n", "16", "--batch", "8",
         "--clip_steps", "4", "--bert_steps", "4", "--chunk", "2"],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def test_trainer_smoke_checkpoint_loads_and_generates(smoke_checkpoint):
    from PIL import Image

    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.engine.sampler import Captioner

    cfg = ConzicConfig()
    cfg.lm_model = smoke_checkpoint
    cfg.match_model = smoke_checkpoint
    cfg.verbose = False
    # from_pretrained must auto-detect the tiny format
    cap = Captioner.from_pretrained(cfg)
    with open(os.path.join(smoke_checkpoint, "conzic_tiny.json")) as f:
        doc = json.load(f)
    assert doc["meta"]["validation"]["n_val"] == 16
    imgs, _, _ = syn.build_dataset(2, seed=50)
    emb = cap.encode_images([Image.fromarray(imgs[i]) for i in range(2)])
    res = cap.run(emb, prompt="Image of a", max_len=4, top_k=16,
                  temperature=0.1, max_iter=1, alpha=0.02, beta=2.0,
                  order="sequential", rng=np.random.RandomState(0))
    assert len(res.gen_texts_list[-2]) == 2
    for caption in res.gen_texts_list[-2]:
        assert caption.startswith("image of a ")


def test_trained_quality_cells_tool(smoke_checkpoint, tmp_path):
    out = str(tmp_path / "matrix.json")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "trained_quality_cells.py"),
         "--checkpoint", smoke_checkpoint, "--cpu",
         "--prune_k", "3", "--topk_mode", "exact",
         "--n_images", "2", "--iters", "1", "--sentence_len", "4",
         "--k", "16", "--out", out],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out) as f:
        matrix = json.load(f)
    cells = matrix["trained"]["cells"]
    (key,) = cells
    assert key.startswith("sequential/free/prune3@n2") and "CPU-SMOKE" in key
    cell = cells[key]
    for field in ("best_cosine_delta", "token_agreement", "best_cos_full",
                  "best_cos_pruned", "attr_recall_full",
                  "attr_recall_pruned", "session"):
        assert field in cell, field
    assert matrix["trained"]["validation"]["n_val"] == 16


def test_fused_ln_backward_matches_reference():
    """The Pallas fused LN's custom VJP (training path, train_tiny.py)
    must match plain-jnp LayerNorm gradients."""
    import functools

    import jax
    import jax.numpy as jnp

    from conzic_tpu.ops.fused_ln import fused_layer_norm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 3, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    scale = jnp.asarray(rng.rand(128).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)

    def ref(x, scale, bias, eps=1e-5):
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mean * mean, 0)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)

    def loss(fn):
        return lambda *a: (fn(*a).astype(jnp.float32) ** 2).sum()

    fused = functools.partial(fused_layer_norm, interpret=True)
    g1 = jax.grad(loss(fused), argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss(ref), argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_tiny_lm_model_with_different_match_model_raises(smoke_checkpoint,
                                                         tmp_path):
    """A trained-tiny checkpoint is a single artifact carrying BOTH
    towers: silently ignoring a DIFFERENT --match_model would swap the
    requested CLIP scorer for the tiny one and report wrong numbers."""
    import pytest

    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.engine.sampler import Captioner

    other = tmp_path / "other_clip"
    other.mkdir()
    cfg = ConzicConfig()
    cfg.lm_model = smoke_checkpoint
    cfg.match_model = str(other)
    with pytest.raises(ValueError, match="match_model"):
        Captioner.from_pretrained(cfg)
