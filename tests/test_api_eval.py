"""API periphery tests: result artifacts, retrieval round-trip, metrics."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from conzic_tpu.api.app import format_output
from conzic_tpu.api.retrieval import CLIPIndex, build_index
from conzic_tpu.api.run import accumulate, save_results
from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine import Captioner
from conzic_tpu.eval.ndiv import calc_diversity, compute, word_tokenize
from conzic_tpu.eval.pos_eval import batch_texts_pos_analysis, histogram_position


@pytest.fixture(scope="module")
def captioner(tmp_path_factory):
    d = tmp_path_factory.mktemp("cap_api")
    cap = Captioner.from_random(tmpdir=str(d), dtype=jnp.float32, init_mode="proper")
    cap.cfg.verbose = False
    return cap


def test_accumulate_and_save_results_layout(tmp_path):
    cfg = ConzicConfig()
    cfg.results_dir = str(tmp_path / "results")
    cfg.num_iterations = 2
    all_results = [None] * 3
    gen_texts = [["cap a", "cap b"], ["cap a2", "cap b2"], ["best a", "best b"]]
    all_results = accumulate(all_results, ["img1.jpg", "img2.jpg"], gen_texts)
    assert all_results[0] == {"img1": "cap a", "img2": "cap b"}
    save_dir = save_results(cfg, "caption", all_results, sample_id=0)
    # reference layout: iter_N.json per iteration + best_clipscore.json
    assert os.path.exists(os.path.join(save_dir, "iter_0.json"))
    assert os.path.exists(os.path.join(save_dir, "iter_1.json"))
    assert os.path.exists(os.path.join(save_dir, "best_clipscore.json"))
    with open(os.path.join(save_dir, "best_clipscore.json")) as f:
        assert json.load(f) == {"img1": "best a", "img2": "best b"}


def test_format_output_variants():
    finals = [f"f{i}" for i in range(5)]
    bests = [f"b{i}" for i in range(5)]
    assert format_output(1, finals, bests) == ("f0", "b0")
    assert format_output(3, finals, bests) == ("f0\nf1\nf2", "b0\nb1\nb2")
    assert format_output(5, finals, bests)[0].count("\n") == 4


def test_retrieval_index_roundtrip(captioner, tmp_path):
    corpus = ["a girl playing with a dog", "the beach at sunset",
              "a cat sitting on grass"]
    corpus_path = tmp_path / "corpus.json"
    corpus_path.write_text(json.dumps(corpus))
    out_dir = tmp_path / "index"
    build_index(captioner, str(corpus_path), str(out_dir), batch_size=2)
    assert (out_dir / "index_matrix.txt").exists()
    assert (out_dir / "mapping_dict.json").exists()
    matrix_lines = (out_dir / "index_matrix.txt").read_text().strip().split("\n")
    assert len(matrix_lines) == 3  # no trailing-batch drop
    index = CLIPIndex(
        str(out_dir / "index_matrix.txt"),
        str(out_dir / "mapping_dict.json"),
        captioner,
    )
    assert index.matrix.shape == (3, captioner.clip_model.config.projection_dim)
    # retrieval of a caption's own embedding returns that caption
    vec = index.matrix[1]
    assert index.mapping[str(int(np.argmax(vec @ index.matrix.T)))] == corpus[1]


def test_ndiv_metrics(tmp_path):
    corpus = [
        {"captions": ["a dog runs", "a dog sits"]},
        {"captions": ["the cat sleeps on the mat"]},
    ]
    path = tmp_path / "div.json"
    path.write_text(json.dumps(corpus))
    res = compute(str(path))
    assert 0 < res["div_1"] <= 1
    assert 0 < res["div_2"] <= 1
    assert res["vocab_len"] >= 7
    # identical captions -> lower diversity than distinct ones
    d_same, _ = calc_diversity(["a dog", "a dog"], [])
    d_diff, _ = calc_diversity(["a dog", "the cat"], [])
    assert d_same[0] < d_diff[0]


def test_pos_eval_template_accuracy():
    texts = ["the girl walked slowly", "dog"]
    template = [["DET"], ["NOUN"], ["VERB"], ["ADV"]]
    tags, scores = batch_texts_pos_analysis(texts, template)
    assert scores[0] == 1.0  # DET NOUN VERB ADV
    assert scores[1] == 0.0  # "dog" = NOUN at the DET slot, rest padded
    hist = histogram_position(texts, 0)
    assert hist["DET"] == 1 and hist["NOUN"] == 1


def test_pos_eval_flat_string_template_reference_semantics():
    """EXACT reference operator semantics for flat string templates
    (POS_classifier.py:23-26, used by its own __main__ eval at :44):
    string slots use Python substring `in`, so ""-padded tags of a short
    caption count as correct for every non-empty slot."""
    template = ["DET", "NOUN", "VERB", "ADV"]
    _, scores = batch_texts_pos_analysis(["dog"], template)
    # "dog" tags NOUN: slot DET wrong, padded ""-tags match slots 2-4
    # by substring ("" in "NOUN" etc.) -> 3/4
    assert scores[0] == 0.75
    _, scores = batch_texts_pos_analysis(["the girl walked slowly"], template)
    assert scores[0] == 1.0
    # list slots keep membership semantics: "" does NOT match ["NOUN"]
    _, scores = batch_texts_pos_analysis(["dog"], [["NOUN"], ["VERB"]])
    assert scores[0] == 0.5
    # only a bare "" slot is auto-correct (reference line 23); [""] is a
    # list slot and matches nothing but the "" pad tag
    _, scores = batch_texts_pos_analysis(["dog"], [[""], ["NOUN"]])
    assert scores[0] == 0.0  # NOUN not in [""], "" pad not in ["NOUN"]


def test_word_tokenize_fallback():
    assert word_tokenize("A dog, running!") == ["a", "dog", ",", "running", "!"]


def test_stage_timers_report():
    from conzic_tpu.runtime.profiling import StageTimers

    t = StageTimers()
    with t.stage("build"):
        pass
    with t.stage("run"):
        pass
    with t.stage("run"):
        pass
    rep = t.report()
    assert "build" in rep and "run" in rep and "2 call(s)" in rep


def test_annotate_reraises_body_exception():
    """An exception raised INSIDE an annotate() block must propagate
    unchanged — the old guard yielded a second time on throw, which
    contextlib converted into RuntimeError('generator didn't stop after
    throw()'), masking the body's real exception."""
    import pytest

    from conzic_tpu.runtime.profiling import annotate

    with pytest.raises(ValueError, match="real error"):
        with annotate("stage"):
            raise ValueError("real error")


def test_compat_shim_reference_signatures(captioner):
    """conzic_tpu.compat mirrors the reference call signatures."""
    import numpy as np
    import jax.numpy as jnp
    from conzic_tpu import compat
    from conzic_tpu.runtime.logging import null_logger

    cap = captioner
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        rng.randn(1, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    texts, scores = compat.generate_caption(
        ["x.jpg"], cap, None, None, embeds, None, null_logger(),
        prompt="Image of a", batch_size=1, max_len=4, top_k=6,
        temperature=0.1, max_iter=2, alpha=0.02, beta=2.0,
        generate_order="sequential",
    )
    assert len(texts) == 3 and len(scores) == 3
    # utils parity
    batch = compat.get_init_text(cap.wp, "Image of a", 4, batch_size=2)
    assert len(batch) == 2 and batch[0][0] == cap.wp.cls_token_id
    mask = np.ones((1, cap.wp.vocab_size), np.float32)
    m2 = compat.update_token_mask(cap.wp, mask, 4, 1)
    assert m2[0, cap.wp.vocab["."]] == 0.0
    m3 = compat.update_token_mask(cap.wp, mask, 4, 3)
    assert m3[0, cap.wp.vocab["."]] == 1.0
    # Captioner accepted in the tokenizer slot; '.'-less vocab is a no-op
    m4 = compat.update_token_mask(cap, mask, 4, 1)
    assert m4[0, cap.wp.vocab["."]] == 0.0

    class _NoPeriod:
        vocab = {"[CLS]": 0, "word": 1}

    m5 = compat.update_token_mask(_NoPeriod(), mask, 4, 1)
    np.testing.assert_array_equal(m5, mask)


def test_clip_scores_eval(captioner, tmp_path):
    """eval/clipscore: cosine per (image, caption) pair, results-file mode."""
    from PIL import Image

    from conzic_tpu.eval.clipscore import clip_scores, score_results_file

    rng = np.random.RandomState(5)
    paths = []
    for i in range(2):
        p = tmp_path / f"im_{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    scores = clip_scores(captioner, paths, ["a girl", "a dog running"])
    assert scores.shape == (2,)
    assert np.all(np.abs(scores) <= 1.0 + 1e-5)

    results = {"im_0": "a girl", "im_1": "a dog running"}
    rp = tmp_path / "res.json"
    rp.write_text(json.dumps(results))
    per_image = score_results_file(captioner, str(rp), str(tmp_path))
    assert set(per_image) == {"im_0.jpg", "im_1.jpg"}


def test_retrieval_cli_end_to_end(captioner, tmp_path, monkeypatch):
    """conzic-build-index + conzic-retrieval CLI flow with artifacts."""
    from PIL import Image

    from conzic_tpu.api import retrieval

    corpus = ["a girl with a dog", "sunny beach", "a cat on grass"]
    (tmp_path / "corpus.json").write_text(json.dumps(corpus))
    rng = np.random.RandomState(6)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(
        rng.randint(0, 255, (50, 60, 3), dtype=np.uint8)
    ).save(img_dir / "q.jpg")
    (tmp_path / "test.json").write_text(
        json.dumps([{"image_name": "q.jpg"}, {"image_name": "missing.jpg"}])
    )
    monkeypatch.setattr(retrieval, "_make_captioner", lambda args: captioner)
    retrieval.build_index_main([
        "--text_file_path", str(tmp_path / "corpus.json"),
        "--save_index_prefix", str(tmp_path / "index"),
        "--batch_size", "2",
    ])
    retrieval.retrieval_main([
        "--index_matrix_path", str(tmp_path / "index" / "index_matrix.txt"),
        "--mapping_dict_path", str(tmp_path / "index" / "mapping_dict.json"),
        "--test_image_prefix_path", str(img_dir),
        "--test_path", str(tmp_path / "test.json"),
        "--save_path_prefix", str(tmp_path),
    ])
    with open(tmp_path / "retrieval_result.json") as f:
        preds = json.load(f)
    # bad image skipped (invalid counting), good one predicted from corpus
    assert len(preds) == 1
    assert preds[0]["prediction"] in corpus
