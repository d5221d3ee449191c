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


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_cli_true_e2e_on_shipped_example(tmp_path, monkeypatch):
    """NO monkeypatched captioner: `conzic-demo --random_models tiny` runs
    the real build path end-to-end on the in-repo examples/girl.jpg
    (fresh-clone runnable defaults, VERDICT r1 item 6)."""
    from conzic_tpu.api import demo

    img = os.path.join(REPO_ROOT, "examples", "girl.jpg")
    assert os.path.exists(img)
    monkeypatch.chdir(tmp_path)
    demo.main([
        "--random_models", "tiny",
        "--run_type", "caption", "--order", "sequential",
        "--sentence_len", "3", "--candidate_k", "4", "--num_iterations", "1",
        "--samples_num", "1", "--dtype", "float32",
        "--caption_img_path", img,
    ])
    logs = os.listdir(tmp_path / "logger")
    content = (tmp_path / "logger" / logs[0]).read_text()
    assert "final caption:" in content and "best caption:" in content


def test_run_cli_true_e2e_on_shipped_examples(tmp_path, monkeypatch):
    """`conzic-run --random_models tiny` over the shipped examples/ dir:
    real image decode + preprocess + generation + artifact layout."""
    from conzic_tpu.api import run as run_cli

    ex_dir = os.path.join(REPO_ROOT, "examples")
    monkeypatch.chdir(tmp_path)
    run_cli.main([
        "--random_models", "tiny",
        "--run_type", "caption", "--order", "sequential",
        "--sentence_len", "3", "--candidate_k", "4", "--num_iterations", "1",
        "--samples_num", "1", "--batch_size", "2", "--dtype", "float32",
        "--caption_img_path", ex_dir,
    ])
    runs = list((tmp_path / "results").iterdir())
    sample_dir = runs[0] / "sample_0"
    files = sorted(os.listdir(sample_dir))
    assert files == ["best_clipscore.json", "iter_0.json"]
    with open(sample_dir / "iter_0.json") as f:
        res = json.load(f)
    assert len(res) == 2  # 3 shipped images, batch_size=2, drop_last


def test_run_cli_mesh_matches_single_device(tmp_path, monkeypatch):
    """--mesh_data_axis N on the virtual CPU mesh writes byte-identical
    artifacts to the single-device run, including a ragged batch padded to
    the mesh (VERDICT r1 item 4)."""
    import jax

    from conzic_tpu.api import run as run_cli

    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), 3)
    argv = [
        "--random_models", "tiny",
        "--run_type", "caption", "--order", "sequential",
        "--sentence_len", "3", "--candidate_k", "4", "--num_iterations", "1",
        "--samples_num", "1", "--batch_size", "3", "--dtype", "float32",
        "--caption_img_path", str(img_dir),
    ]
    results = {}
    n_dev = min(2, len(jax.devices()))
    for mode, extra in (("single", []),
                        ("mesh", ["--mesh_data_axis", str(n_dev)])):
        d = tmp_path / mode
        d.mkdir()
        monkeypatch.chdir(d)
        run_cli.main(argv + extra)
        sample_dir = list((d / "results").iterdir())[0] / "sample_0"
        with open(sample_dir / "best_clipscore.json") as f:
            results[mode] = json.load(f)
    assert results["single"] == results["mesh"]
    assert len(results["single"]) == 3  # batch of 3 padded onto the mesh


def test_app_callback_caption_and_controllable(tiny_captioner):
    """The Gradio Submit callback (api/app.py make_demo_fn) end-to-end for
    both run types, no gradio required (reference Demo, app.py:119-182)."""
    from PIL import Image

    from conzic_tpu.api import app as app_mod
    from conzic_tpu.config import ConzicConfig

    cfg = ConzicConfig()
    cfg.candidate_k = 6
    cfg.verbose = False
    tiny_captioner.cfg.verbose = False
    demo_fn = app_mod.make_demo_fn(tiny_captioner, cfg)
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 48, 3), dtype=np.uint8)
    )
    final, best = demo_fn(
        "caption", "sentiment", "positive", "sequential", "Image of a",
        4, 1, 2, 0.02, 2.0, 5.0, img,
    )
    assert final.count("\n") == 1 and len(final.splitlines()) == 2
    assert best and isinstance(best, str)
    final_c, best_c = demo_fn(
        "controllable", "sentiment", "negative", "sequential", "Image of a",
        4, 1, 1, 0.02, 2.0, 5.0, img,
    )
    assert final_c and "\n" not in final_c


def test_app_widget_logic_matches_reference():
    """Dynamic visibility + reset defaults (reference app.py:185-196,
    264-277) as pure functions."""
    from conzic_tpu.api import app as app_mod

    assert app_mod.control_widgets_visible("controllable")
    assert not app_mod.control_widgets_visible("caption")
    assert app_mod.sentiment_widget_visible("sentiment")
    assert not app_mod.sentiment_widget_visible("pos")
    vals = app_mod.reset_values()
    assert vals[0] == "caption" and vals[4] == "Image of a"
    assert vals[5:8] == (10, 10, 2)  # len, iters, samples defaults


def test_run_cli_skips_unreadable_images(tmp_path, monkeypatch, tiny_captioner):
    """Per-image failure handling (the reference's only fault tolerance,
    clipretrieval.py:121-127, promoted to the batch runner): a corrupt file
    in the directory is skipped and logged, the rest caption normally."""
    from conzic_tpu.api import run as run_cli

    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), 2)
    (img_dir / "corrupt.jpg").write_bytes(b"not an image at all")
    monkeypatch.setattr(
        run_cli, "build_captioner",
        lambda cfg, random_models=False, mesh=None: tiny_captioner,
    )
    monkeypatch.chdir(tmp_path)
    run_cli.main([
        "--run_type", "caption", "--order", "sequential",
        "--sentence_len", "3", "--candidate_k", "4", "--num_iterations", "1",
        "--samples_num", "1", "--batch_size", "2",
        "--caption_img_path", str(img_dir),
    ])
    log = (tmp_path / "logger" / os.listdir(tmp_path / "logger")[0]).read_text()
    assert "skipping unreadable image corrupt.jpg" in log
    sample_dir = list((tmp_path / "results").iterdir())[0] / "sample_0"
    with open(sample_dir / "iter_0.json") as f:
        res = json.load(f)
    assert len(res) == 2  # both valid images captioned


def test_fallback_ui_server_serves_and_submits(tiny_captioner):
    """The stdlib fallback web UI (api/fallback_ui.py) actually SERVES: GET
    / returns the widget page; POST /submit runs the shared Submit callback
    and returns captions — the live-UI analog of the gradio path, runnable
    in environments where gradio cannot be installed."""
    import base64
    import http.client
    import io
    import json as json_mod
    import threading

    from PIL import Image

    from conzic_tpu.api.fallback_ui import make_server
    from conzic_tpu.config import ConzicConfig

    cfg = ConzicConfig()
    cfg.candidate_k = 6
    cfg.verbose = False
    tiny_captioner.cfg.verbose = False
    server = make_server(tiny_captioner, cfg, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode("utf-8")
        for widget in ("Run Type", "Control Type", "Sentiment",
                       "Generation Order", "Prompt", "Sentence Length",
                       "Num Iterations", "Samples", "Alpha", "Beta",
                       "Gamma", "Upload Picture", "Final Caption",
                       "Best Caption", "Submit", "Reset"):
            assert widget in page, widget

        buf = io.BytesIO()
        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (64, 48, 3),
                                             dtype=np.uint8)
        ).save(buf, format="PNG")
        payload = {
            "run_type": "caption", "control_type": "sentiment",
            "sentiment_type": "positive", "order": "sequential",
            "prompt": "Image of a", "sentence_len": 4,
            "num_iterations": 1, "samples_num": 2,
            "alpha": 0.02, "beta": 2.0, "gamma": 5.0,
            "image": "data:image/png;base64,"
                     + base64.b64encode(buf.getvalue()).decode(),
        }
        conn.request("POST", "/submit", body=json_mod.dumps(payload),
                     headers={"Content-Type": "application/json"})
        out = json_mod.loads(conn.getresponse().read())
        assert len(out["final"].splitlines()) == 2  # samples joined
        assert out["best"]
        # bad request surfaces as a 500 with an error field, not a crash
        conn.request("POST", "/submit", body=json_mod.dumps({"image": "x"}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 500
        assert "error" in json_mod.loads(resp.read())
    finally:
        server.shutdown()


def test_compiler_options_parse(tiny_captioner, monkeypatch):
    """ConzicConfig.compiler_options "k=v,k=v" parses into the dict passed
    to jax.jit (whitespace tolerated, empty -> None) — and is suppressed
    entirely off-TPU (the default options are TPU flag names)."""
    from conzic_tpu.engine import sampler as sampler_mod

    cap = tiny_captioner
    old = cap.cfg.compiler_options
    try:
        # CPU backend (this test env): always None, even with the default
        # (non-empty) option string
        assert cap._compiler_options() is None
        monkeypatch.setattr(sampler_mod.jax, "default_backend",
                            lambda: "tpu")
        cap.cfg.compiler_options = ""
        assert cap._compiler_options() is None
        cap.cfg.compiler_options = (
            " xla_tpu_scoped_vmem_limit_kib=32768 ,"
            "xla_tpu_enable_dot_strength_reduction=false"
        )
        assert cap._compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "32768",
            "xla_tpu_enable_dot_strength_reduction": "false",
        }
    finally:
        cap.cfg.compiler_options = old


def test_prefetch_map_order_and_errors():
    """runtime/prefetch.py: order-preserving one-ahead map; exceptions
    from the mapped fn propagate at the consuming site."""
    from conzic_tpu.runtime.prefetch import prefetch_map

    assert list(prefetch_map(lambda x: x * 2, range(7))) == [
        0, 2, 4, 6, 8, 10, 12
    ]

    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    out = []
    with pytest.raises(ValueError, match="boom"):
        for v in prefetch_map(boom, range(10)):
            out.append(v)
    assert out == [0, 1, 2]


def test_prefetch_map_abandoned_consumer_releases_worker():
    """Closing/abandoning the generator must unblock the worker thread
    (it previously sat forever on the full queue, leaking the thread and
    a decoded image batch per abandonment)."""
    import threading
    import time as _time

    from conzic_tpu.runtime.prefetch import prefetch_map

    before = {t.ident for t in threading.enumerate()}
    gen = prefetch_map(lambda x: x, range(100))
    assert next(gen) == 0
    gen.close()  # triggers the generator's finally -> stop event
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        _time.sleep(0.05)
    assert not extra, f"prefetch worker leaked: {extra}"


def test_prefetch_map_pool_workers_order_errors_and_cleanup():
    """workers>1 path (the multi-core host-feed lever, HOST_FEED.json):
    order preserved, in-order exception propagation, no leaked threads
    when the consumer abandons the generator."""
    import threading
    import time

    from conzic_tpu.runtime.prefetch import prefetch_map

    assert list(prefetch_map(lambda x: x * 2, range(17), workers=4)) == [
        x * 2 for x in range(17)
    ]

    def boom(x):
        if x == 5:
            raise ValueError("x5")
        return x

    got = []
    with pytest.raises(ValueError):
        for v in prefetch_map(boom, range(10), workers=4):
            got.append(v)
    assert got == [0, 1, 2, 3, 4]

    before = set(threading.enumerate())
    gen = prefetch_map(lambda x: x, range(100), workers=4)
    next(gen)
    gen.close()
    time.sleep(0.3)
    extra = [t for t in set(threading.enumerate()) - before if t.is_alive()]
    assert not extra, f"pool thread leaked: {extra}"
