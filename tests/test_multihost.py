"""Multi-host scale-out (VERDICT r4 item 7 / SURVEY §2.3 comm backend).

The real thing: a 2-process jax.distributed CPU run (4 local devices
each, Gloo coordination) builds the tiny captioner over the GLOBAL
8-device mesh, feeds per-process local pixel blocks
(`encode_images(local=True)` -> `make_array_from_process_local_data`),
generates, and gathers results on every host — compared byte-for-byte
against the single-process no-mesh reference (the 8-device dryrun
already pins mesh == single-device, so this pins multi-PROCESS ==
single-process).

Plus unit tests of the degenerate/single-process helper contracts.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from conzic_tpu.parallel import distributed  # noqa: E402


def test_local_slice_contract():
    assert distributed.local_slice(8, pid=0, cnt=2) == slice(0, 4)
    assert distributed.local_slice(8, pid=1, cnt=2) == slice(4, 8)
    assert distributed.local_slice(6, pid=2, cnt=3) == slice(4, 6)
    with pytest.raises(ValueError, match="does not divide"):
        distributed.local_slice(7, pid=0, cnt=2)
    # single-process degenerate: the whole batch
    assert distributed.local_slice(5, pid=0, cnt=1) == slice(0, 5)


def test_single_process_helpers_degenerate_to_device_put():
    from jax.sharding import PartitionSpec as P, NamedSharding

    from conzic_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    s = NamedSharding(mesh, P("data"))
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    a = distributed.put_global(x, s)
    b = distributed.put_local_shard(x, s, 8)
    np.testing.assert_array_equal(np.asarray(a), x)
    np.testing.assert_array_equal(np.asarray(b), x)
    assert a.sharding == s and b.sharding == s
    np.testing.assert_array_equal(distributed.gather_to_host(a), x)
    with pytest.raises(ValueError, match="got 4 rows"):
        distributed.put_local_shard(x[:4], s, 8)


def test_two_process_run_matches_single_process(tmp_path):
    """End-to-end: 2 OS processes x 4 CPU devices, global mesh, local
    feeding — captions and scores byte-identical to single-process."""
    from conzic_tpu.config import ConzicConfig
    from conzic_tpu.engine.sampler import Captioner

    # single-process reference (no mesh; dryrun pins mesh==no-mesh)
    cfg = ConzicConfig()
    cfg.verbose = False
    cfg.dtype = "float32"
    cfg.param_dtype = "float32"
    cap = Captioner.from_random(cfg, init_mode="proper", seed=7)
    B = 8
    side = cap.clip_model.config.vision.image_size
    pixels = np.random.RandomState(3).rand(B, side, side, 3).astype(
        np.float32)
    embeds = cap.encode_images(pixels)
    ref = cap.run(
        embeds, prompt="Image of a", max_len=4, top_k=8, temperature=0.1,
        max_iter=2, alpha=0.02, beta=2.0, order="sequential",
        rng=np.random.RandomState(5))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out = tmp_path / "proc0.json"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    with open(out) as f:
        got = json.load(f)
    assert got["finals"] == ref.gen_texts_list[-2]
    assert got["best"] == ref.gen_texts_list[-1]
    np.testing.assert_allclose(
        np.asarray(got["best_cos"]), np.asarray(ref.best_cos),
        rtol=0, atol=1e-5)
