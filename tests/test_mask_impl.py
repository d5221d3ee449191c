"""mask_impl="compare" (banned-id membership) must be byte-identical to
the default take-along-gather stop-mask lookup — including the
softmax-underflow 0.0-tie regime where shortcut reformulations break
(the reference keeps allowed zero-prob tokens while collapsing banned
ones to [PAD]: gen_utils.py:72 ``(idxs * mask[idxs]).long()``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conzic_tpu import energies
from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine import Captioner


def test_topk_candidates_compare_matches_gather_in_zero_tie_regime():
    V, k = 64, 16
    mask = np.ones(V, np.float32)
    banned = np.array([0, 3, 5, 17, 33, 50], np.int32)
    mask[banned] = 0.0
    # only two nonzero probs; everything else exactly 0.0 — top-k must
    # fill from the 0.0 ties (banned AND allowed ids, index order), and
    # the banned winners collapse to [PAD]
    probs = np.zeros((3, V), np.float32)
    probs[:, 7] = 0.5
    probs[:, 9] = 0.25
    probs *= mask  # as energies.masked_lm_probs produces
    tp_g, idx_g = energies.topk_candidates(
        jnp.asarray(probs), jnp.asarray(mask), k
    )
    tp_c, idx_c = energies.topk_candidates(
        jnp.asarray(probs), jnp.asarray(mask), k,
        banned_ids=jnp.asarray(banned),
    )
    np.testing.assert_array_equal(np.asarray(tp_g), np.asarray(tp_c))
    np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(idx_c))
    # the regime actually engaged: banned 0.0-ties were selected and
    # collapsed, and allowed 0.0-ties survived as real ids
    assert 0 in np.asarray(idx_g)[0][2:]
    assert (np.asarray(idx_g)[0][2:] > 0).any()


def test_topk_candidates_compare_per_row_banned_with_padding():
    """(B, nb) banned rows with -1 padding (the engine's mid/last-select
    shape) against per-row (B, V) mask gathers."""
    V, k = 48, 12
    rng = np.random.RandomState(1)
    banned_a = np.array([2, 4, 6], np.int32)
    banned_b = np.array([1, 3, 5, 7, 11], np.int32)
    nb = max(banned_a.size, banned_b.size)
    pad = lambda a: np.pad(a, (0, nb - a.size), constant_values=-1)  # noqa: E731
    banned = np.stack([pad(banned_a), pad(banned_b)])
    mask = np.ones((2, V), np.float32)
    mask[0, banned_a] = 0.0
    mask[1, banned_b] = 0.0
    probs = rng.rand(2, V).astype(np.float32)
    probs[:, :24] = 0.0  # plenty of exact ties
    probs *= mask
    tp_g, idx_g = energies.topk_candidates(
        jnp.asarray(probs), jnp.asarray(mask), k
    )
    tp_c, idx_c = energies.topk_candidates(
        jnp.asarray(probs), jnp.asarray(mask), k,
        banned_ids=jnp.asarray(banned),
    )
    np.testing.assert_array_equal(np.asarray(tp_g), np.asarray(tp_c))
    np.testing.assert_array_equal(np.asarray(idx_g), np.asarray(idx_c))


def test_flipping_mask_impl_back_does_not_retrace_gather_program(
    tmp_path_factory,
):
    """Lazily-built banned tables must not leak into the gather program's
    argument pytree: gather -> compare -> gather must reuse BOTH compiled
    programs (one trace each), not retrace the gather program with two
    dead table inputs."""
    d = tmp_path_factory.mktemp("capflip")
    cap = Captioner.from_random(tmpdir=str(d), dtype=jnp.float32,
                                init_mode="proper")
    cap.cfg.verbose = False
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(
            1, cap.clip_model.config.projection_dim
        ).astype(np.float32)
    )
    kw = dict(prompt="Image of a", max_len=4, top_k=8, temperature=0.1,
              max_iter=1, alpha=0.02, beta=2.0, order="sequential")
    r1 = cap.run(embeds, rng=np.random.RandomState(1), **kw)
    cap.cfg.mask_impl = "compare"
    r2 = cap.run(embeds, rng=np.random.RandomState(1), **kw)
    cap.cfg.mask_impl = "gather"
    r3 = cap.run(embeds, rng=np.random.RandomState(1), **kw)
    assert r1.gen_texts_list == r2.gen_texts_list == r3.gen_texts_list
    assert "banned_mid" in cap.tables  # built by the compare run
    sizes = [
        fn._cache_size() for fn in cap._jit_cache.values()
        if hasattr(fn, "_cache_size")
    ]
    assert sizes and all(s == 1 for s in sizes), sizes


def test_unknown_mask_impl_rejected_at_run_time(tmp_path_factory):
    """Env-mutated configs bypass ConzicConfig.validate; a typo'd
    mask_impl must fail loudly, not silently run the gather path under a
    compare label (the vacuous-measurement failure mode)."""
    d = tmp_path_factory.mktemp("capbad")
    cap = Captioner.from_random(tmpdir=str(d), dtype=jnp.float32)
    cap.cfg.verbose = False
    cap.cfg.mask_impl = "compre"
    embeds = jnp.zeros((1, cap.clip_model.config.projection_dim), jnp.float32)
    with pytest.raises(ValueError, match="mask_impl"):
        cap.run(embeds, prompt="Image of a", max_len=3, top_k=4,
                temperature=0.1, max_iter=1, alpha=0.02, beta=2.0)


@pytest.fixture(scope="module")
def cap_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("capm")
    caps = []
    for impl in ("gather", "compare"):
        cfg = ConzicConfig()
        cfg.mask_impl = impl
        cap = Captioner.from_random(
            config=cfg, tmpdir=str(d), dtype=jnp.float32, init_mode="proper"
        )
        cap.cfg.verbose = False
        caps.append(cap)
    return caps


@pytest.mark.parametrize(
    "order,kwargs",
    [
        ("sequential", {}),
        ("sequential", {"prune_k": 4}),  # the tier the lever targets
        ("parallel", {}),  # mask_last-everywhere selection rule
    ],
)
def test_engine_compare_mask_byte_identical(cap_pair, order, kwargs):
    cap_g, cap_c = cap_pair
    embeds = jnp.asarray(
        np.random.RandomState(0).randn(
            2, cap_g.clip_model.config.projection_dim
        ).astype(np.float32)
    )
    run_kw = dict(
        prompt="Image of a", max_len=5, top_k=12, temperature=0.1,
        max_iter=2, alpha=0.02, beta=2.0, order=order, **kwargs
    )
    r_g = cap_g.run(embeds, rng=np.random.RandomState(42), **run_kw)
    r_c = cap_c.run(embeds, rng=np.random.RandomState(42), **run_kw)
    # lazily built, one static shape for the mid/last pair, gather-only
    # captioners never carry them
    assert cap_c.tables["banned_mid"].shape == cap_c.tables["banned_last"].shape
    assert "banned_mid" not in cap_g.tables
    assert r_g.gen_texts_list == r_c.gen_texts_list
    np.testing.assert_array_equal(r_g.iter_ids, r_c.iter_ids)
    np.testing.assert_array_equal(r_g.best_ids, r_c.best_ids)
    assert r_g.clip_score_sequence == r_c.clip_score_sequence
