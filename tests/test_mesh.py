"""Mesh sharding: sharded generation == single-device generation.

SURVEY.md §4's mesh strategy: 8 virtual CPU devices via conftest; the
(images x samples) batch axis is data-parallel, params/tables replicated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conzic_tpu.engine import Captioner
from conzic_tpu.parallel import mesh as mesh_lib


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device(tmp_path):
    mesh = mesh_lib.make_mesh(8)
    cap_mesh = Captioner.from_random(
        tmpdir=str(tmp_path / "a"), dtype=jnp.float32, mesh=mesh,
        init_mode="proper",
    )
    cap_mesh.cfg.verbose = False
    cap_single = Captioner.from_random(
        tmpdir=str(tmp_path / "b"), dtype=jnp.float32, init_mode="proper",
    )
    cap_single.cfg.verbose = False

    rng = np.random.RandomState(0)
    embeds_host = rng.randn(8, cap_mesh.clip_model.config.projection_dim).astype(
        np.float32
    )
    kwargs = dict(prompt="Image of a", max_len=4, top_k=6, temperature=0.1,
                  max_iter=2, alpha=0.02, beta=2.0, order="sequential")
    r_mesh = cap_mesh.run(
        mesh_lib.shard_batch(mesh, jnp.asarray(embeds_host)),
        rng=np.random.RandomState(1), **kwargs,
    )
    r_single = cap_single.run(
        jnp.asarray(embeds_host), rng=np.random.RandomState(1), **kwargs
    )
    assert r_mesh.gen_texts_list == r_single.gen_texts_list
    np.testing.assert_allclose(r_mesh.best_cos, r_single.best_cos, rtol=1e-5)


def test_pad_batch_to_mesh():
    mesh = mesh_lib.make_mesh(8)
    arrays = [np.arange(10)[:, None].repeat(3, 1)]
    padded, orig = mesh_lib.pad_batch_to_mesh(arrays, mesh)
    assert orig == 10
    assert padded[0].shape[0] == 16
    np.testing.assert_array_equal(padded[0][:10], arrays[0])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_2d_mesh_tensor_parallel_matches_single_device(tmp_path):
    """data=4 x model=2 mesh: vocab-dim TP on the MLM head + word embedding
    must reproduce single-device captions exactly."""
    from conzic_tpu.text import make_test_wordpiece_vocab

    vocab = make_test_wordpiece_vocab()
    if len(vocab) % 2:  # vocab must divide the model axis to shard
        vocab["zzpad"] = len(vocab)
    mesh = mesh_lib.make_mesh_2d(4, 2)
    cap_tp = Captioner.from_random(
        tmpdir=str(tmp_path / "tp"), dtype=jnp.float32, mesh=mesh,
        init_mode="proper", wp_vocab=vocab,
    )
    cap_tp.cfg.verbose = False
    # confirm the vocab-dim params actually got sharded over the model axis
    emb_sharding = cap_tp.params["bert"]["embeddings"]["word"]["embedding"].sharding
    assert "model" in str(emb_sharding.spec)
    cap_single = Captioner.from_random(
        tmpdir=str(tmp_path / "sd"), dtype=jnp.float32, init_mode="proper",
        wp_vocab=dict(vocab),
    )
    cap_single.cfg.verbose = False

    rng = np.random.RandomState(0)
    embeds = rng.randn(4, cap_tp.clip_model.config.projection_dim).astype(np.float32)
    kwargs = dict(prompt="Image of a", max_len=4, top_k=6, temperature=0.1,
                  max_iter=2, alpha=0.02, beta=2.0, order="sequential")
    r_tp = cap_tp.run(
        mesh_lib.shard_batch(mesh, jnp.asarray(embeds)),
        rng=np.random.RandomState(1), **kwargs,
    )
    r_sd = cap_single.run(jnp.asarray(embeds), rng=np.random.RandomState(1), **kwargs)
    assert r_tp.gen_texts_list == r_sd.gen_texts_list
