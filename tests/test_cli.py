"""CLI end-to-end smoke tests (tiny models injected via monkeypatch)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from conzic_tpu.engine import Captioner


@pytest.fixture(scope="module")
def tiny_captioner(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_cap")
    cap = Captioner.from_random(tmpdir=str(d), dtype=jnp.float32,
                                init_mode="proper")
    return cap


def _fake_build(cfg, random_models=False, mesh=None, _cap=[]):
    raise AssertionError("patched in tests")


def _write_images(dir_path, n):
    os.makedirs(dir_path, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        arr = rng.randint(0, 255, size=(64, 48, 3), dtype=np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(os.path.join(dir_path, name))
        names.append(name)
    return names


def test_demo_cli_caption(tmp_path, monkeypatch, tiny_captioner):
    from conzic_tpu.api import demo

    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), 1)
    monkeypatch.setattr(
        demo, "build_captioner", lambda cfg, random_models=False, mesh=None: tiny_captioner
    )
    monkeypatch.chdir(tmp_path)
    demo.main([
        "--run_type", "caption", "--order", "sequential",
        "--sentence_len", "4", "--candidate_k", "6", "--num_iterations", "2",
        "--samples_num", "1",
        "--caption_img_path", str(img_dir / "img_0.jpg"),
    ])
    logs = os.listdir(tmp_path / "logger")
    assert len(logs) == 1
    content = (tmp_path / "logger" / logs[0]).read_text()
    assert "final caption:" in content and "best caption:" in content


def test_demo_cli_controllable(tmp_path, monkeypatch, tiny_captioner):
    from conzic_tpu.api import demo

    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), 1)
    monkeypatch.setattr(
        demo, "build_captioner", lambda cfg, random_models=False, mesh=None: tiny_captioner
    )
    monkeypatch.chdir(tmp_path)
    demo.main([
        "--run_type", "controllable", "--control_type", "sentiment",
        "--sentiment_type", "negative", "--order", "sequential",
        "--sentence_len", "4", "--candidate_k", "6", "--num_iterations", "1",
        "--samples_num", "1",
        "--caption_img_path", str(img_dir / "img_0.jpg"),
    ])
    logs = os.listdir(tmp_path / "logger")
    content = (tmp_path / "logger" / logs[0]).read_text()
    assert "ctl score" in content


def test_run_cli_writes_reference_artifacts(tmp_path, monkeypatch, tiny_captioner):
    from conzic_tpu.api import run as run_cli

    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), 5)  # batch_size=2 -> 2 batches, 1 dropped
    monkeypatch.setattr(
        run_cli, "build_captioner",
        lambda cfg, random_models=False, mesh=None: tiny_captioner,
    )
    monkeypatch.chdir(tmp_path)
    run_cli.main([
        "--run_type", "caption", "--order", "sequential",
        "--sentence_len", "4", "--candidate_k", "6", "--num_iterations", "2",
        "--samples_num", "1", "--batch_size", "2",
        "--caption_img_path", str(img_dir),
    ])
    results_root = tmp_path / "results"
    runs = list(results_root.iterdir())
    assert len(runs) == 1
    sample_dir = runs[0] / "sample_0"
    files = sorted(os.listdir(sample_dir))
    assert files == ["best_clipscore.json", "iter_0.json", "iter_1.json"]
    with open(sample_dir / "iter_0.json") as f:
        res = json.load(f)
    assert len(res) == 4  # 5 images, drop_last -> 4 captioned
    assert all(isinstance(v, str) for v in res.values())


def test_demo_cli_fused_samples_match_looped(tmp_path, monkeypatch, tiny_captioner):
    """--no_fuse_samples and the default fused path log identical captions."""
    from conzic_tpu.api import demo

    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), 1)
    monkeypatch.setattr(
        demo, "build_captioner", lambda cfg, random_models=False, mesh=None: tiny_captioner
    )
    argv = [
        "--run_type", "caption", "--order", "shuffle",
        "--sentence_len", "4", "--candidate_k", "6", "--num_iterations", "2",
        "--samples_num", "2",
        "--caption_img_path", str(img_dir / "img_0.jpg"),
    ]
    out = {}
    for mode, extra in (("fused", []), ("loop", ["--no_fuse_samples"])):
        d = tmp_path / mode
        d.mkdir()
        monkeypatch.chdir(d)
        demo.main(argv + extra)
        log = (d / "logger" / os.listdir(d / "logger")[0]).read_text()
        out[mode] = [l for l in log.splitlines()
                     if l.startswith(("final caption:", "best caption:"))]
    assert out["fused"] == out["loop"]
    assert len(out["fused"]) == 4  # 2 samples x (final+best)
