"""High-level captioning API with the reference's behavioral contract.

``Captioner`` owns models/params/tokenizers/tables and compiles one XLA
program per (order, control, shape) combination.
``generate_caption`` / ``control_generate_caption`` mirror the reference
entry functions (``/root/reference/gen_utils.py:289-333``,
``control_gen_utils.py:197-232``): both return
``(gen_texts_list, clip_score_sequence)`` where index ``[-2]`` is the
final-iteration caption and ``[-1]`` the best-by-CLIPScore caption.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import sys
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conzic_tpu.config import ConzicConfig
from conzic_tpu.engine.gibbs import EngineSpec, run_generation
from conzic_tpu.engine.orders import build_schedule
from conzic_tpu.models.bert import BertForMaskedLM
from conzic_tpu.models.clip import CLIPModel
from conzic_tpu.models.configs import BertConfig, CLIPConfig
from conzic_tpu.parallel import mesh as mesh_lib
from conzic_tpu.runtime.image import preprocess_batch_pil
from conzic_tpu.text.bpe import CLIPBPETokenizer
from conzic_tpu.text.bridge import build_bridge_table
from conzic_tpu.text.lexicons import (
    build_pos_table,
    build_sentiment_table,
    template_matrix,
)
from conzic_tpu.text.vocab import (
    build_token_masks,
    load_stop_words_file,
    make_test_bpe_files,
    make_test_wordpiece_vocab,
)
from conzic_tpu.text.wordpiece import WordPieceTokenizer


def random_params_like(init_fn, seed: int, *example_inputs):
    """Deterministic random parameters WITHOUT tracing a device forward.

    ``linen.Module.init`` executes (and on TPU compiles) the whole forward
    pass just to shape-infer — minutes for full-size towers. For random-init
    models (tests/benchmarks; real runs convert HF checkpoints) we only need
    shapes: ``jax.eval_shape`` traces abstractly in milliseconds, then leaves
    are filled by name (LayerNorm scales 1, biases 0, logit_scale ln(100),
    everything else N(0, 0.02)).
    """
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *example_inputs)
    shapes = shapes["params"] if "params" in shapes else shapes

    def produce(key):
        def fill(path, leaf):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if name.endswith("logit_scale"):  # before the generic "scale"
                return jnp.full(leaf.shape, 4.6052, leaf.dtype)
            if name.endswith("scale"):
                return jnp.ones(leaf.shape, leaf.dtype)
            if name.endswith("bias"):
                return jnp.zeros(leaf.shape, leaf.dtype)
            import zlib  # crc32: stable across processes (hash() is not)

            sub = jax.random.fold_in(key, zlib.crc32(name.encode()) % (2**31))
            return 0.02 * jax.random.normal(sub, leaf.shape, leaf.dtype)

        return jax.tree_util.tree_map_with_path(fill, shapes)

    # generated on device: no host->device transfer of full-size param trees
    return jax.jit(produce)(jax.random.PRNGKey(seed))


def cast_params_dtype(params, dtype):
    """Cast float32 param leaves to ``dtype`` for storage (halves weight HBM
    reads in the hot loop). ``logit_scale`` stays fp32 — ``similarity``
    exponentiates it in fp32 (clip/clip.py:95 semantics)."""

    def fill(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if name.endswith("logit_scale") or leaf.dtype != jnp.float32:
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(fill, params)


def tower_quants(quant: str) -> tuple:
    """Map the config-level ``quant`` tier onto per-tower modes:
    "int8" quantizes the CLIP text tower (candidate scoring) only;
    "int8_all" additionally quantizes the BERT proposal encoder.
    Returns ``(bert_quant, clip_quant)`` — each "none" or "int8" (the
    value the TransformerStack understands).

    Raises on unknown tiers: callers that MUTATE cfg.quant (bench.py's
    env knob) bypass config validation, and silently mapping a typo'd
    tier to full precision would bench the fp program under a quant
    label — exactly the vacuous-measurement failure the r2 int8 wiring
    bug already caused once."""
    if quant not in ("none", "int8", "int8_all"):
        raise ValueError(f"unknown quant tier {quant!r} "
                         "(expected none | int8 | int8_all)")
    bert_q = "int8" if quant == "int8_all" else "none"
    clip_q = "int8" if quant in ("int8", "int8_all") else "none"
    return bert_q, clip_q


# factorized stage-1 calibration pass band: every measured UNDER-gate
# cell ran at held-out cosine 0.917-0.975 and the over-gate quarter-depth
# cells at 0.854 (PRUNING_MATRIX "trained"); 0.91 is the pass band's
# floor. Auto depth-select accepts the smallest depth clearing this, and
# the runtime warning fires below it — one constant so the two can never
# straddle a depth (a 0.92 auto band once rejected the flagship 2-of-12
# depth whose holdout is 0.9166).
STAGE1_CALIB_FLOOR = 0.91

# Deep-map guard for the factorized stage-1 candidate encode: the
# no-precut B=512/clip_row_chunk=800 program — a 200-deep lax.map of
# 512-row truncated encodes — reproducibly device-faults UNAVAILABLE on
# the axon v5e runtime, while the 40-deep B=256/rc=1600 program runs
# (BASELINE.md r4, "fact50 (no pre-cut)" row). 64 is a conservative
# bound between the measured-good and measured-faulting depths; override
# with --allow_deep_stage1 / cfg.allow_deep_stage1.
MAX_STAGE1_MAP_DEPTH = 64


def stage1_map_depth(spec, batch_rows: int) -> int:
    """Depth of the DEEPEST lax.map chunking a factorized candidate
    encode — mirrors ``gibbs._encode_candidates``'s chunk arithmetic
    (rows = batch * stage width, chunked at ``clip_row_chunk``). With a
    PROXY pre-cut the truncated tower sees only m rows; a TOWER pre-cut
    itself encodes all k rows, so the guard keys on the full width."""
    k = spec.candidate_k
    if (spec.stage1_precut and spec.stage1_precut < k
            and getattr(spec, "stage1_precut_mode", "proxy") != "tower"):
        k = spec.stage1_precut
    rc = spec.clip_row_chunk
    if not rc or batch_rows * k <= rc:
        return 1
    kc = max(1, rc // batch_rows)
    while k % kc:
        kc -= 1
    return k // kc


@dataclasses.dataclass
class GenerationResult:
    gen_texts_list: List[List[str]]  # per-iteration captions + best at [-1]
    clip_score_sequence: List[List[float]]
    iter_ids: np.ndarray  # (I, B, S)
    iter_ctl: np.ndarray  # (I, B)
    best_ids: np.ndarray  # (B, S)
    best_cos: np.ndarray  # (B,)
    elapsed_s: float


class Captioner:
    def __init__(
        self,
        bert_model: BertForMaskedLM,
        bert_params,
        clip_model: CLIPModel,
        clip_params,
        wp: WordPieceTokenizer,
        bpe: CLIPBPETokenizer,
        config: Optional[ConzicConfig] = None,
        mesh=None,
    ):
        self.cfg = config or ConzicConfig()
        self.bert_model = bert_model
        self.clip_model = clip_model
        self.wp = wp
        self.bpe = bpe
        self.mesh = mesh

        stop_words = (
            load_stop_words_file(self.cfg.stop_words_path)
            if self.cfg.stop_words_path
            else None
        )
        mask_mid, mask_last = build_token_masks(
            wp.vocab,
            extra_stop_words=self.cfg.add_extra_stopwords,
            stop_words=stop_words,
        )
        bridge = build_bridge_table(wp, bpe)
        self.bridge = bridge
        # prefix-KV safety: the committed-words-each-add->=1-CLIP-piece
        # argument (engine/gibbs.py prefix_chunks) requires that no
        # selectable token bridges to zero pieces; with the rule-derived
        # mask this always holds (specials are banned), but a user-supplied
        # stop-words file may leave zero-piece tokens selectable
        self._mask_allows_empty_piece = bool(
            (((mask_mid > 0) | (mask_last > 0)) & (bridge.lens == 0)).any()
        )
        # control-energy tables (senti/pos/template) are built lazily on the
        # first controlled run: plain captioning never needs them, and exact
        # (NLTK) mode pays 30k taggings per construction
        tables = {
            "mask_mid": jnp.asarray(mask_mid),
            "mask_last": jnp.asarray(mask_last),
            "bridge_ids": jnp.asarray(bridge.ids),
            "bridge_lens": jnp.asarray(bridge.lens),
        }
        params = {"bert": bert_params, "clip": clip_params}
        if self.cfg.param_dtype == "bfloat16":
            params = cast_params_dtype(params, jnp.bfloat16)
        self.tables = mesh_lib.replicate(mesh, tables)
        self.params = mesh_lib.shard_params(
            mesh, jax.tree.map(jnp.asarray, params)
        )
        self._jit_cache: Dict[Any, Any] = {}
        self._encode_image_jit = jax.jit(
            lambda params, px: clip_model.apply(
                {"params": params}, px, method=CLIPModel.encode_image
            )
        )
        try:  # native batch decoder for snapshot decoding (Python fallback)
            from conzic_tpu.text import native as _native

            self._decoder = (
                _native.NativeWordPieceDecoder(wp)
                if _native.available() and isinstance(wp, WordPieceTokenizer)
                else wp
            )
        except Exception:
            self._decoder = wp

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls, config: ConzicConfig, mesh=None
    ) -> "Captioner":
        """Load from local HF checkpoint directories named by
        ``config.lm_model`` / ``config.match_model``. A directory saved by
        models/checkpoint.py (locally trained flax models, marked by
        conzic_tiny.json) is auto-detected and routed to from_tiny_dir."""
        from conzic_tpu.models.checkpoint import is_tiny_checkpoint

        if is_tiny_checkpoint(config.lm_model):
            # a tiny dir carries BOTH towers; silently dropping a
            # DIFFERENT --match_model would swap the requested CLIP
            # scorer for the tiny one and report wrong numbers
            default_match = type(config).__dataclass_fields__[
                "match_model"].default  # unset -> the tiny dir's own CLIP
            if config.match_model not in (
                    None, "", config.lm_model, default_match):
                raise ValueError(
                    f"lm_model={config.lm_model!r} is a trained-tiny "
                    f"checkpoint (single artifact with both towers) but "
                    f"match_model={config.match_model!r} names a "
                    f"different directory — pass the same path for both "
                    f"(or leave match_model at its default).")
            return cls.from_tiny_dir(config, mesh=mesh)
        from conzic_tpu.models.convert import load_bert, load_clip

        from conzic_tpu.models.convert import params_with_scanned_encoders

        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        bert_cfg, bert_params = load_bert(config.lm_model)
        clip_cfg, clip_params = load_clip(config.match_model)
        if config.scan_layers:
            bert_params = params_with_scanned_encoders(bert_params)
            clip_params = params_with_scanned_encoders(clip_params)
        bert_quant, clip_quant = tower_quants(config.quant)
        bert = BertForMaskedLM(bert_cfg, dtype=dtype, attn_impl=config.attn_impl,
                               scan_layers=config.scan_layers, quant=bert_quant)
        clip = CLIPModel(clip_cfg, dtype=dtype, attn_impl=config.attn_impl,
                         scan_layers=config.scan_layers, quant=clip_quant)
        from conzic_tpu.models.configs import load_hf_config

        if load_hf_config(config.lm_model).get("model_type") == "roberta":
            from conzic_tpu.text.roberta_bpe import RobertaBPETokenizer

            wp = RobertaBPETokenizer.from_pretrained(config.lm_model)
        else:
            wp = WordPieceTokenizer.from_pretrained(config.lm_model)
        bpe = CLIPBPETokenizer.from_pretrained(config.match_model)
        return cls(bert, bert_params, clip, clip_params, wp, bpe, config, mesh)

    @classmethod
    def from_tiny_dir(
        cls, config: ConzicConfig, path: Optional[str] = None, mesh=None
    ) -> "Captioner":
        """Load a locally trained flax checkpoint directory
        (models/checkpoint.py; produced by tools/train_tiny.py). One
        directory carries BOTH towers plus both tokenizers — the
        trained-tiny world is a single artifact."""
        import os

        from conzic_tpu.models.checkpoint import load_tiny_checkpoint
        from conzic_tpu.models.convert import params_with_scanned_encoders

        path = path or config.lm_model
        bert_cfg, bert_params, clip_cfg, clip_params, _doc = (
            load_tiny_checkpoint(path)
        )
        if config.scan_layers:
            bert_params = params_with_scanned_encoders(bert_params)
            clip_params = params_with_scanned_encoders(clip_params)
        dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        bert_quant, clip_quant = tower_quants(config.quant)
        bert = BertForMaskedLM(bert_cfg, dtype=dtype,
                               attn_impl=config.attn_impl,
                               scan_layers=config.scan_layers,
                               quant=bert_quant)
        clip = CLIPModel(clip_cfg, dtype=dtype, attn_impl=config.attn_impl,
                         scan_layers=config.scan_layers, quant=clip_quant)
        wp = WordPieceTokenizer.from_vocab_file(
            os.path.join(path, "vocab.txt"))
        bpe = CLIPBPETokenizer.from_files(
            os.path.join(path, "bpe_vocab.json"),
            os.path.join(path, "bpe_merges.txt"))
        return cls(bert, bert_params, clip, clip_params, wp, bpe, config,
                   mesh)

    @classmethod
    def from_random(
        cls,
        config: Optional[ConzicConfig] = None,
        bert_config: Optional[BertConfig] = None,
        clip_config: Optional[CLIPConfig] = None,
        seed: int = 0,
        tmpdir: Optional[str] = None,
        mesh=None,
        dtype=None,
        wp_vocab: Optional[dict] = None,
        clip_text_vocab_size: Optional[int] = None,
        init_mode: str = "fast",
        scan_layers: Optional[bool] = None,
    ) -> "Captioner":
        """Deterministic random-init models over synthetic vocabularies —
        the no-download path used by tests, dry-runs and throughput
        benchmarks (weight values don't affect speed)."""
        import os
        import tempfile

        config = config or ConzicConfig()
        # the arg and config flag MUST agree: the models are built from
        # the arg while the engine's prefix-KV/pooled-readout guards key
        # on cfg.scan_layers — a split (scanned models, unscanned cfg)
        # crashes on the stack's internal assertion, and the reverse
        # silently tests unrolled stacks under a scanned label
        if scan_layers is None:
            scan_layers = config.scan_layers
        else:
            config.scan_layers = scan_layers
        tmpdir = tmpdir or tempfile.mkdtemp(prefix="conzic_vocab_")
        os.makedirs(tmpdir, exist_ok=True)
        vocab = wp_vocab or make_test_wordpiece_vocab()
        wp_path = os.path.join(tmpdir, "vocab.txt")
        with open(wp_path, "w", encoding="utf-8") as f:
            for tok in sorted(vocab, key=vocab.get):
                f.write(tok + "\n")
        wp = WordPieceTokenizer.from_vocab_file(wp_path)
        bpe = CLIPBPETokenizer.from_files(*make_test_bpe_files(tmpdir))
        bert_config = bert_config or BertConfig.tiny(vocab_size=wp.vocab_size)
        if bert_config.vocab_size != wp.vocab_size:
            bert_config = dataclasses.replace(
                bert_config, vocab_size=wp.vocab_size
            )
        clip_config = clip_config or CLIPConfig.tiny()
        text_vocab = max(
            bpe.vocab_size, clip_text_vocab_size or 0, clip_config.text.vocab_size
        )
        # the text tower pools at the first EOS: its id must be the BPE's EOS
        clip_config = dataclasses.replace(
            clip_config,
            text=dataclasses.replace(
                clip_config.text,
                vocab_size=text_vocab,
                eos_token_id=bpe.eos_token_id,
            ),
        )
        if dtype is None:
            dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        bert_quant, clip_quant = tower_quants(config.quant)
        bert = BertForMaskedLM(bert_config, dtype=dtype,
                               attn_impl=config.attn_impl,
                               scan_layers=scan_layers, quant=bert_quant)
        clip = CLIPModel(clip_config, dtype=dtype, attn_impl=config.attn_impl,
                         scan_layers=scan_layers, quant=clip_quant)
        if init_mode == "proper":
            # real linen init (traces a forward): use for small test configs
            # where well-separated output statistics matter
            key = jax.random.PRNGKey(seed)
            bert_params = bert.init_params(jax.random.fold_in(key, 0))
            clip_params = clip.init_params(jax.random.fold_in(key, 1))
        else:
            bert_params = random_params_like(
                lambda k, ids: bert.init(k, ids),
                seed,
                jnp.zeros((1, 16), jnp.int32),
            )
            v = clip_config.vision
            clip_params = random_params_like(
                lambda k, px, ids: clip.init(k, px, ids),
                seed + 1,
                jnp.zeros((1, v.image_size, v.image_size, v.num_channels), jnp.float32),
                jnp.zeros((1, clip_config.text.max_position_embeddings), jnp.int32),
            )
        return cls(bert, bert_params, clip, clip_params, wp, bpe, config, mesh)

    # ------------------------------------------------------------------
    def encode_images(self, images, local: bool = False) -> jax.Array:
        """PIL images (or preprocessed NHWC array) -> (B, D) embeddings.
        Image is encoded ONCE per generation (reference
        gen_utils.py:58 / clip/clip.py:48-62).

        ``local=True``: multi-host per-process feeding — ``images`` are
        THIS process's contiguous block of the global batch
        (parallel.distributed.local_slice); the global array is
        assembled across processes and the returned embeddings are the
        GLOBAL (B_global, D) batch. Single-process it is the identity
        path."""
        if isinstance(images, (list, tuple)):
            pixels = preprocess_batch_pil(
                images, self.clip_model.config.vision.image_size
            )
        else:
            pixels = np.asarray(images, np.float32)
            if pixels.ndim == 3:
                pixels = pixels[None]
        if local and jax.process_count() > 1:
            from conzic_tpu.parallel import distributed

            if self.mesh is None:
                raise ValueError(
                    "encode_images(local=True) on a multi-host run needs "
                    "a mesh (--mesh_data_axis)")
            global_b = pixels.shape[0] * jax.process_count()
            if mesh_lib.data_axis_pad(self.mesh, global_b):
                raise ValueError(
                    f"multi-host local feeding requires the global batch "
                    f"({global_b}) to divide the mesh's data axis — pick "
                    f"a --batch_size multiple of the mesh size")
            pixels = distributed.put_local_shard(
                pixels, mesh_lib.batch_sharding(self.mesh), global_b)
            return self._encode_image_jit(self.params["clip"], pixels)
        pixels = jnp.asarray(pixels)
        B = pixels.shape[0]
        pad = mesh_lib.data_axis_pad(self.mesh, B)
        if pad:  # ragged batch: pad to the mesh, slice the result back
            pixels = jnp.concatenate([pixels] + [pixels[-1:]] * pad, axis=0)
        pixels = mesh_lib.shard_batch(self.mesh, pixels)
        emb = self._encode_image_jit(self.params["clip"], pixels)
        return emb[:B] if pad else emb

    def _ensure_stage1_calibration(self, n_sentences: int = 2048,
                                   seed: int = 0) -> None:
        """Lazily fit the factorized stage-1's calibrated projection
        (tables["stage1_wcal"], (H, D) fp32): least-squares map from the
        truncated tower's pooled states to the FULL tower's projected
        embeddings, fit on random bridge-assembled word sequences.
        Checkpoint-specific and cheap (one chunked encode pass + an HxH
        host solve) — viable for real checkpoints too. Recomputed when
        prune_stage1_layers or clip_len changes."""
        from conzic_tpu.models.clip import (
            CLIPTextTower,
            truncated_text_params,
        )

        requested = self.cfg.prune_stage1_layers
        full_layers = self.clip_model.config.text.num_layers
        if requested and not 1 <= requested < full_layers:
            raise ValueError(
                f"prune_stage1_layers={requested} must be in [1, "
                f"{full_layers - 1}] (full tower has {full_layers} layers) "
                "or 0 for auto-select")
        if self.cfg.scan_layers:
            raise ValueError(
                "factorized stage-1 needs unrolled layer params "
                "(scan_layers=False)")
        pc_layers = 0
        if (self.cfg.prune_stage1_precut
                and self.cfg.prune_stage1_precut_mode == "tower"):
            pc_layers = self.cfg.prune_stage1_precut_layers
            if not 1 <= pc_layers < full_layers:
                raise ValueError(
                    f"prune_stage1_precut_layers={pc_layers} must be in "
                    f"[1, {full_layers - 1}]")
        meta = (requested, self.cfg.clip_len, pc_layers)
        if ("stage1_wcal" in self.tables
                and getattr(self, "_stage1_meta", None) == meta):
            return
        br = self.bridge
        rng = np.random.RandomState(seed)
        lens = np.asarray(br.lens)
        valid = np.where(lens > 0)[0]
        L = self.cfg.clip_len
        rows = np.full((n_sentences, L), br.pad_id, np.int32)
        mask = np.zeros((n_sentences, L), np.int32)
        ids_tab = np.asarray(br.ids)
        for i in range(n_sentences):
            row = [br.bos_id]
            for w in rng.choice(valid, rng.randint(3, 13)):
                row.extend(ids_tab[w][: lens[w]].tolist())
                if len(row) >= L - 1:
                    break
            row = row[: L - 1] + [br.eos_id]
            rows[i, : len(row)] = row
            mask[i, : len(row)] = 1

        encode_full = jax.jit(lambda p, i, m: self.clip_model.apply(
            {"params": p}, i, m, method=CLIPModel.encode_text))
        chunk = 1024
        tgt = []
        for s in range(0, n_sentences, chunk):
            i_c = jnp.asarray(rows[s : s + chunk])
            m_c = jnp.asarray(mask[s : s + chunk])
            tgt.append(np.asarray(encode_full(self.params["clip"], i_c, m_c),
                                  np.float32))
        y = np.concatenate(tgt).astype(np.float64)
        n_hold = max(32, len(y) // 8)

        def fit(nl):
            """Held-out ridge fit at nl layers -> (w, mean holdout cos).
            The holdout is the per-checkpoint transferability contract
            (see the pass-band comment below)."""
            tcfg = dataclasses.replace(
                self.clip_model.config.text, num_layers=nl)
            tower = CLIPTextTower(tcfg, dtype=self.clip_model.dtype,
                                  attn_impl=self.cfg.attn_impl,
                                  quant=self.clip_model.quant)
            encode_trunc = jax.jit(
                lambda p, i, m: tower.apply({"params": p}, i, m))
            tparams = truncated_text_params(self.params["clip"], nl)
            pooled = []
            for s in range(0, n_sentences, chunk):
                i_c = jnp.asarray(rows[s : s + chunk])
                m_c = jnp.asarray(mask[s : s + chunk])
                pooled.append(np.asarray(encode_trunc(tparams, i_c, m_c),
                                         np.float32))
            h = np.concatenate(pooled).astype(np.float64)
            h_fit, y_fit = h[:-n_hold], y[:-n_hold]
            w = np.linalg.solve(
                h_fit.T @ h_fit + 1e-3 * np.eye(h.shape[1]),
                h_fit.T @ y_fit)
            pred = h[-n_hold:] @ w
            tgt_h = y[-n_hold:]
            cos = np.sum(pred * tgt_h, axis=1) / (
                np.linalg.norm(pred, axis=1)
                * np.linalg.norm(tgt_h, axis=1) + 1e-9)
            return w, float(np.mean(cos))

        if requested:
            n_layers = requested
            w, calib = fit(n_layers)
        else:
            # auto-select (--prune_stage1_layers 0): the SMALLEST layer
            # count from 2 (the measured floor — 1 layer failed the gate
            # on both trained towers) whose held-out cosine clears the
            # pass band; fall back to the best seen. One extra encode
            # pass per probed depth — seconds on a real checkpoint.
            best = None
            n_layers = w = calib = None
            # floor 2 where the tower allows it (1 layer failed the gate
            # on both trained towers); a 2-layer tower can only probe 1
            for nl in range(min(2, full_layers - 1), full_layers):
                w_nl, cos_nl = fit(nl)
                if best is None or cos_nl > best[2]:
                    best = (nl, w_nl, cos_nl)
                # accept exactly the depths the runtime warning below
                # would not warn about (see STAGE1_CALIB_FLOOR)
                if cos_nl >= STAGE1_CALIB_FLOOR:
                    n_layers, w, calib = nl, w_nl, cos_nl
                    break
            if n_layers is None:
                n_layers, w, calib = best
            self.cfg.prune_stage1_layers = n_layers  # sticky resolve:
            # the engine spec and the bench metric label read the
            # concrete depth from here on
            if self.cfg.verbose:
                print(f"factorized stage-1 auto-selected "
                      f"{n_layers}/{full_layers} layers "
                      f"(held-out cosine {calib:.4f})")
        self.stage1_calib_cos = calib
        # measured pass/fail boundary across BOTH trained towers — see
        # STAGE1_CALIB_FLOOR. Fidelity tracks ABSOLUTE stage-1 layer count
        # (2-of-12 at 0.917 passes; 1-of-4 at 0.854 fails), so >= 2
        # layers is the practical minimum on any tower.
        if self.stage1_calib_cos < STAGE1_CALIB_FLOOR:
            print(
                f"WARNING: factorized stage-1 calibration held-out cosine "
                f"{self.stage1_calib_cos:.4f} < {STAGE1_CALIB_FLOOR} for "
                f"prune_stage1_layers={n_layers} on this checkpoint — the "
                f"under-gate quality cells were measured at 0.917-0.975 "
                f"(the over-gate ones at 0.854); raise the layer count or "
                f"treat quality as unbounded.",
                file=sys.stderr)
        elif self.cfg.verbose:
            print(f"factorized stage-1 calibration held-out cosine "
                  f"{self.stage1_calib_cos:.4f} (layers={n_layers})")
        self.tables["stage1_wcal"] = mesh_lib.replicate(
            self.mesh, jnp.asarray(w.astype(np.float32)))
        if pc_layers:
            # the tower pre-cut's own projection. Its held-out cosine is
            # recorded but NOT hard-warned: the pre-cut is a recall
            # filter whose errors the deeper stage-1 reranks away unless
            # recall itself collapses — the end-to-end gate cells are
            # the contract (BASELINE.md r5 len77 rows).
            if pc_layers >= n_layers:
                raise ValueError(
                    f"prune_stage1_precut_layers={pc_layers} must be "
                    f"shallower than the (resolved) prune_stage1_layers="
                    f"{n_layers}")
            w_pc, self.stage1_pc_calib_cos = fit(pc_layers)
            self.tables["stage1_wcal_pc"] = mesh_lib.replicate(
                self.mesh, jnp.asarray(w_pc.astype(np.float32)))
            if self.cfg.verbose:
                print(f"factorized tower pre-cut calibration held-out "
                      f"cosine {self.stage1_pc_calib_cos:.4f} "
                      f"(layers={pc_layers})")
        # cache under BOTH the request key (0 = auto) and the resolved
        # concrete depth — a later run with either value reuses the fit
        self._stage1_meta = (self.cfg.prune_stage1_layers,
                             self.cfg.clip_len, pc_layers)

    def init_ids(self, prompt: str, max_len: int, batch_size: int) -> np.ndarray:
        """[CLS] prompt [MASK]*L [SEP], replicated (utils.py:46-51)."""
        text = prompt + self.wp.mask_token * max_len
        row = self.wp.encode(text)
        return np.tile(np.asarray(row, np.int32), (batch_size, 1))

    def seed_len(self, prompt: str) -> int:
        """[CLS]+prompt length, derived from an actual init encoding so it
        can never disagree with init_ids (e.g. RoBERTa's <mask> lstrip
        absorbs a trailing prompt space)."""
        return int(len(self.init_ids(prompt, 1, 1)[0])) - 2

    # ------------------------------------------------------------------
    def _ensure_ctl_tables(self) -> None:
        """Build the control-energy tables on first use (sentiment/POS
        lexicons over the vocab + the POS template matrix)."""
        if "senti" in self.tables:
            return
        self.tables["senti"] = mesh_lib.replicate(
            self.mesh, jnp.asarray(build_sentiment_table(self.wp.vocab))
        )
        self.tables["pos"] = mesh_lib.replicate(
            self.mesh, jnp.asarray(build_pos_table(self.wp.vocab))
        )
        self.tables["template"] = mesh_lib.replicate(
            self.mesh, jnp.asarray(template_matrix(self.cfg.pos_type))
        )

    # ------------------------------------------------------------------
    def _ensure_banned_tables(self) -> None:
        """mask_impl="compare": static banned-id lists for the compare-form
        stop-mask lookup (engine/gibbs.py _token_mask_for), padded to one
        shape with -1 (matches no top-k id). Built lazily on first use so
        the default program's inputs — and its jit key — stay unchanged
        and the knob can be flipped on an existing captioner."""
        if "banned_mid" in self.tables:
            return
        banned = {
            out: np.nonzero(np.asarray(self.tables[src]) == 0)[0]
            for out, src in (
                ("banned_mid", "mask_mid"), ("banned_last", "mask_last")
            )
        }
        nb = max(a.size for a in banned.values())
        for key, a in banned.items():
            padded = np.pad(
                a.astype(np.int32), (0, nb - a.size), constant_values=-1
            )
            self.tables[key] = mesh_lib.replicate(
                self.mesh, jnp.asarray(padded)
            )

    # ------------------------------------------------------------------
    def _ensure_word_embeds(self) -> None:
        """Lazily build the (V, D) per-vocab-word CLIP embedding table used
        by the pruning proxy: each BERT token embedded as a standalone word
        through the full text tower (one-time, batched)."""
        if "word_embeds" in self.tables:
            return
        br = self.bridge
        V, M = br.ids.shape
        seq_len = min(M + 2, 77)
        ids = np.full((V, seq_len), br.pad_id, np.int32)
        mask = np.zeros((V, seq_len), np.int32)
        ids[:, 0] = br.bos_id
        lens = np.minimum(br.lens, seq_len - 2)
        for m in range(min(M, seq_len - 2)):
            sel = lens > m
            ids[sel, 1 + m] = br.ids[sel, m]
        ids[np.arange(V), 1 + lens] = br.eos_id
        for v in range(seq_len):
            mask[:, v] = (v <= 1 + lens).astype(np.int32)

        from conzic_tpu.models.clip import CLIPModel

        chunk = 4096
        pad_V = (-V) % chunk
        if pad_V:
            ids = np.concatenate([ids, np.tile(ids[-1:], (pad_V, 1))])
            mask = np.concatenate([mask, np.tile(mask[-1:], (pad_V, 1))])
        encode = jax.jit(
            lambda p, i, m: self.clip_model.apply(
                {"params": p}, i, m, method=CLIPModel.encode_text
            )
        )
        outs = []
        for s in range(0, ids.shape[0], chunk):
            outs.append(
                np.asarray(
                    encode(self.params["clip"],
                           jnp.asarray(ids[s : s + chunk]),
                           jnp.asarray(mask[s : s + chunk]))
                )
            )
        emb = np.concatenate(outs, axis=0)[:V].astype(np.float32)
        emb[np.asarray(br.lens) == 0] = 0.0  # specials contribute nothing
        self.tables["word_embeds"] = mesh_lib.replicate(
            self.mesh, jnp.asarray(emb)
        )

    def _prefix_chunks(self, order, order_kind, init_row, seed_len, max_len):
        """Static ((prefix_len, n_steps), ...) chunking for exact prefix-KV
        reuse (engine/gibbs.py). The bound for a step is 1 (BOS) + the CLIP
        pieces of the prompt + the number of sentence words guaranteed
        committed before the edited position across every iteration/row
        sharing the compiled body (sequential: the position index itself;
        all other orders: 0)."""
        if self.cfg.kv_chunk_size <= 0:
            return None
        if self.cfg.scan_layers:
            # prefix-KV reuse / pooled readout need per-layer K/V access,
            # which the nn.scan-rolled stack cannot expose — without this
            # gate the generation crashes on an assertion deep inside the
            # stack (layers.py "require scan_layers=False")
            return None
        lens = np.asarray(self.bridge.lens)
        prompt_ids = np.asarray(init_row[0][1:seed_len])
        if prompt_ids.size and (lens[prompt_ids] <= 0).any():
            return None  # prompt itself bridges to nothing provable
        base = 1 + int(lens[prompt_ids].sum())
        per_word = 0 if self._mask_allows_empty_piece else 1
        if order_kind != "single" or order != "sequential" or per_word == 0:
            return ((base, max_len),)
        sz = self.cfg.kv_chunk_size
        chunks = []
        for start in range(0, max_len, sz):
            n = min(sz, max_len - start)
            chunks.append((base + start * per_word, n))
        return tuple(chunks)

    def _get_host_bridge(self, clip_len: int):
        """Memoized host callback for ``bridge_mode="exact"``: the
        reference's decode -> re-tokenize per candidate row
        (gen_utils.py:75 + clip/clip.py:71-73)."""
        cache = getattr(self, "_host_bridge_cache", None)
        if cache is None:
            cache = self._host_bridge_cache = {}
        fn = cache.get(clip_len)
        if fn is None:
            decoder, bpe = self._decoder, self.bpe

            def host_bridge(inner):
                inner = np.asarray(inner)
                B, k, P = inner.shape
                texts = decoder.batch_decode(
                    inner.reshape(B * k, P), skip_special_tokens=True
                )
                ids, mask = bpe.batch_encode(
                    texts, max_length=clip_len, pad_to_max=True
                )
                return (
                    np.asarray(ids, np.int32).reshape(B, k, clip_len),
                    np.asarray(mask, np.int32).reshape(B, k, clip_len),
                )

            fn = cache[clip_len] = host_bridge
        return fn

    def _spec(self, seed_len, max_len, top_k, order_kind, ctl, negative,
              prune_k=None, prefix_chunks=None,
              final_exact=False, ctl_key="") -> EngineSpec:
        exact = self.cfg.bridge_mode == "exact"
        ctl_mode = self.cfg.ctl_mode if ctl is not None else "table"
        if self.cfg.topk_mode == "approx" and not prune_k:
            raise ValueError(
                "topk_mode='approx' is a pruned-tier-only lever: it relaxes "
                "the candidate set (non-parity) and is refused without "
                "prune_k so the full-parity tier stays exact"
            )
        if self.cfg.mask_impl not in ("gather", "compare"):
            # consumption-site check: env-mutated configs (bench.py's
            # CONZIC_BENCH_MASK_IMPL) bypass ConzicConfig.validate, and a
            # typo'd value would silently run the gather path under a
            # compare label — the vacuous-measurement failure mode again
            # (cf. tower_quants)
            raise ValueError(
                f"unknown mask_impl {self.cfg.mask_impl!r} "
                "(expected gather | compare)"
            )
        row_chunk = self.cfg.clip_row_chunk
        budget = self.cfg.clip_token_budget
        if row_chunk and budget and self.cfg.clip_len > 48:
            # long-context regime: chunk scoring passes to a token budget
            # (sweep-tuned; see config.clip_token_budget)
            row_chunk = min(row_chunk, max(1, budget // self.cfg.clip_len))
        # control-aware stage-1 ranking: "auto" engages it for every
        # controlled pruned run ("on" is the same under the ctl+prune
        # guard; "off" reproduces the r4 cosine-only cuts). Free tiers
        # never carry the flag — their programs are unchanged.
        stage1_ctl = (
            self.cfg.prune_stage1_ctl != "off"
            and ctl is not None
            and prune_k is not None
        )
        return EngineSpec(
            seed_len=seed_len,
            sentence_len=max_len,
            seq_len=seed_len + max_len + 1,
            candidate_k=top_k,
            clip_len=self.cfg.clip_len,
            mask_token_id=self.wp.mask_token_id,
            clip_bos_id=self.bridge.bos_id,
            clip_eos_id=self.bridge.eos_id,
            clip_pad_id=self.bridge.pad_id,
            ctl=ctl,
            negative=negative,
            ctl_mode=ctl_mode,
            ctl_key=ctl_key if ctl_mode == "exact" and ctl == "pos" else "",
            order_kind=order_kind,
            prune_k=prune_k,
            final_exact=bool(final_exact and prune_k is not None),
            prune_stage1=self.cfg.prune_stage1,
            stage1_layers=self.cfg.prune_stage1_layers,
            stage1_precut=self.cfg.prune_stage1_precut,
            stage1_precut_mode=self.cfg.prune_stage1_precut_mode,
            stage1_precut_layers=self.cfg.prune_stage1_precut_layers,
            stage1_ctl=stage1_ctl,
            prefix_chunks=None if exact else prefix_chunks,
            clip_row_chunk=row_chunk,
            clip_pad_to=self._clip_pad_to(),
            clip_window=self._clip_window(),
            topk_chunk=self.cfg.topk_chunk,
            topk_mode=self.cfg.topk_mode,
            topk_recall=self.cfg.topk_recall,
            mask_impl=self.cfg.mask_impl,
            exact_bridge=exact,
        )

    def _get_host_ctl(self, spec: EngineSpec):
        """Memoized host callback for ``ctl_mode="exact"``: decode each
        candidate row and score it with the reference's sentence-level
        pipeline (sentiments_classifer.py:14-32 / POS_classifier.py:6-31;
        real NLTK when its data packs exist, the repo's built-in
        evaluators otherwise)."""
        import json

        cache = getattr(self, "_host_ctl_cache", None)
        if cache is None:
            cache = self._host_ctl_cache = {}
        key = (spec.ctl, spec.negative, spec.ctl_key)
        fn = cache.get(key)
        if fn is None:
            decoder = self._decoder
            ctl, negative = spec.ctl, spec.negative
            template = json.loads(spec.ctl_key) if spec.ctl_key else None

            def host_ctl(inner):
                from conzic_tpu.eval.pos_eval import batch_texts_pos_analysis
                from conzic_tpu.eval.sentiment_eval import (
                    batch_texts_sentiment_scores,
                )

                inner = np.asarray(inner)
                B, k, P = inner.shape
                texts = decoder.batch_decode(
                    inner.reshape(B * k, P), skip_special_tokens=True
                )
                if ctl == "sentiment":
                    scores = batch_texts_sentiment_scores(
                        texts, negative=negative
                    )
                else:
                    _, scores = batch_texts_pos_analysis(texts, template)
                return np.asarray(scores, np.float32).reshape(B, k)

            fn = cache[key] = host_ctl
        return fn

    def _clip_pad_to(self) -> int:
        """Resolve cfg.clip_pad_to: -1 = auto-align long contexts to a
        sublane multiple (77 -> 80 measured +42%, config.py note); 0 =
        off; N = explicit (ignored unless > clip_len)."""
        pad, L = self.cfg.clip_pad_to, self.cfg.clip_len
        if pad < 0:
            pad = (L + 7) // 8 * 8 if L > 64 and L % 8 else 0
        return pad if pad > L else 0

    def _clip_window(self) -> int:
        """Resolve cfg.clip_window (the exact windowed candidate encode):
        round up to a sublane multiple (8 — the odd-S lesson, config.py
        clip_pad_to note), drop it when it is not narrower than the
        effective static width, refuse it on a mesh (the per-step fit
        check is a cross-shard any() on batch-sharded rows — it would
        break the engine's zero-collective DP program)."""
        w = self.cfg.clip_window
        if not w:
            return 0
        if self.mesh is not None:
            raise ValueError(
                "--clip_window requires a single chip (no "
                "--mesh_data_axis): the per-step fit check is a "
                "cross-shard reduction on the batch-sharded candidate "
                "rows, which would insert a collective into the "
                "engine's zero-collective data-parallel program. Drop "
                "the window or the mesh."
            )
        w = (w + 7) // 8 * 8
        eff = self._clip_pad_to() or self.cfg.clip_len
        return w if w < eff else 0

    def _compiler_options(self) -> Optional[Dict[str, str]]:
        """Parse ``cfg.compiler_options`` ("k=v,k=v") for the engine jit.
        TPU-only: the default options are TPU flag names, which other
        backends' compilers reject."""
        s = (self.cfg.compiler_options or "").strip()
        if not s or jax.default_backend() != "tpu":
            return None
        out = {}
        for kv in s.split(","):
            k, _, v = kv.partition("=")
            if k.strip():
                out[k.strip()] = v.strip()
        return out or None

    def _compiled(self, spec: EngineSpec):
        fn = self._jit_cache.get(spec)
        if fn is None:
            host_bridge = (
                self._get_host_bridge(spec.clip_len)
                if spec.exact_bridge
                else None
            )
            host_ctl = (
                self._get_host_ctl(spec)
                if spec.ctl is not None and spec.ctl_mode == "exact"
                else None
            )
            fn = jax.jit(
                functools.partial(
                    run_generation, spec, self.bert_model, self.clip_model,
                    host_bridge=host_bridge, host_ctl=host_ctl,
                    mesh=self.mesh,
                ),
                compiler_options=self._compiler_options(),
            )
            self._jit_cache[spec] = fn
        return fn

    def run(
        self,
        image_embeds: jax.Array,
        *,
        prompt: str,
        max_len: int,
        top_k: int,
        temperature: float,
        max_iter: int,
        alpha: float,
        beta: float,
        gamma: float = 0.0,
        order: str = "sequential",
        ctl: Optional[str] = None,
        negative: bool = False,
        rng: Optional[np.random.RandomState] = None,
        n_samples: int = 1,
        prune_k: Optional[int] = None,
        prune_final_exact: bool = False,
        pos_template=None,
    ) -> GenerationResult:
        """Run one full generation; decode snapshots on host afterwards.

        ``prune_final_exact`` (with ``prune_k``) runs iterations
        ``1..I-1`` pruned and the LAST iteration with full k-candidate
        scoring — the committed caption is a full-parity polish sweep
        over the pruned state (the quality-bounded speed tier).

        ``n_samples > 1`` fuses independent samples as extra batch lanes in
        the SAME compiled program (rows ordered sample-major). Each sample
        draws its own schedule from ``rng`` sequentially, so fused results
        are byte-identical to ``n_samples`` separate calls — the reference
        runs samples as an outer Python loop (demo.py:83-89); on TPU the
        fused batch keeps the MXU fed. Use :meth:`split_samples` to unpack.
        """
        rng = rng or np.random.RandomState(self.cfg.seed)
        # k cannot exceed the vocabulary (lax.top_k hard-errors); clamping
        # keeps small test vocabularies usable with the reference default
        # k=200 — beyond V the extra candidates would all be mask-banned
        # [PAD] duplicates anyway
        top_k = min(top_k, self.wp.vocab_size)
        scheds = [
            build_schedule(order, max_len, max_iter, rng)
            for _ in range(n_samples)
        ]
        sched = scheds[0]
        if prune_k is None:  # config-level tier (CLI --prune_k); an
            prune_k = self.cfg.prune_k or None  # explicit arg overrides
        prune_final_exact = prune_final_exact or self.cfg.prune_final_exact
        if prune_k is not None and prune_k >= top_k:
            prune_k = None
        if prune_k is not None:
            if self.cfg.prune_stage1 == "factorized":
                self._ensure_stage1_calibration()
                if (self.cfg.prune_stage1_precut
                        and self.cfg.prune_stage1_precut_mode == "proxy"):
                    self._ensure_word_embeds()  # the cascade's proxy cut
            else:
                self._ensure_word_embeds()
        if self.cfg.mask_impl == "compare":
            self._ensure_banned_tables()
        tables = self.tables
        ctl_key = ""
        # the ctl-aware stage-1 rank consumes the device ctl tables even
        # under ctl_mode="exact" (stage 1 is a surrogate either way)
        stage1_ctl_on = (
            self.cfg.prune_stage1_ctl != "off"
            and ctl is not None
            and prune_k is not None
        )
        if ctl is not None and self.cfg.ctl_mode == "exact":
            # exact mode scores candidates host-side: no device tables
            # needed (unless the stage-1 rank wants them); the POS
            # template is baked into the host callback (and into the
            # jit-cache key via ctl_key)
            import json

            template = (
                pos_template if pos_template is not None
                else self.cfg.pos_type
            )
            ctl_key = json.dumps(template) if ctl == "pos" else ""
        if ctl is not None and (self.cfg.ctl_mode != "exact"
                                or stage1_ctl_on):
            self._ensure_ctl_tables()
            if pos_template is not None:
                # per-call template override; never mutates shared state
                tables = {
                    **self.tables,
                    "template": mesh_lib.replicate(
                        self.mesh, jnp.asarray(template_matrix(pos_template))
                    ),
                }
        init_row = self.init_ids(prompt, max_len, 1)
        seed_len = init_row.shape[1] - max_len - 1
        spec = self._spec(
            seed_len, max_len, top_k,
            sched.kind, ctl, negative, prune_k=prune_k,
            prefix_chunks=self._prefix_chunks(
                order, sched.kind, init_row, seed_len, max_len
            ),
            final_exact=prune_final_exact,
            ctl_key=ctl_key,
        )
        # pass the program ONLY the tables this spec consumes: lazily-built
        # tables (ctl lexicons, word_embeds, banned lists) otherwise change
        # the argument pytree of every LATER run — e.g. flipping
        # mask_impl compare -> gather would force a full retrace of the
        # already-compiled gather program with two dead inputs
        need = {"mask_mid", "mask_last", "bridge_ids", "bridge_lens"}
        if spec.ctl is not None and (spec.ctl_mode == "table"
                                     or spec.stage1_ctl):
            need |= {"senti", "pos", "template"}
        if spec.prune_k is not None:
            if spec.prune_stage1 == "factorized":
                need.add("stage1_wcal")
                if spec.stage1_precut:
                    need.add("stage1_wcal_pc"
                             if spec.stage1_precut_mode == "tower"
                             else "word_embeds")
            else:
                need.add("word_embeds")
        if spec.mask_impl == "compare":
            need |= {"banned_mid", "banned_last"}
        tables = {k: v for k, v in tables.items() if k in need}
        missing = need - set(tables)
        assert not missing, f"spec needs tables not built: {missing}"
        B0 = int(image_embeds.shape[0])
        B = B0 * n_samples
        if n_samples > 1:
            image_embeds = jnp.concatenate([image_embeds] * n_samples, axis=0)
        init = self.init_ids(prompt, max_len, B)
        n_masks = int((init[0] == self.wp.mask_token_id).sum())
        assert n_masks == max_len, (
            f"prompt {prompt!r} encoded {n_masks} mask slots, expected {max_len}"
        )
        hyper = {
            "alpha": jnp.float32(alpha),
            "beta": jnp.float32(beta),
            "gamma": jnp.float32(gamma),
            "temperature": jnp.float32(temperature),
        }
        if sched.kind == "single":
            # (I, steps, B): per-row positions, sample-major blocks
            positions = np.concatenate(
                [np.repeat(s.positions[:, :, None], B0, axis=2) for s in scheds],
                axis=2,
            )
        else:
            # span/parallel schedules carry no randomness: shared across rows
            positions = sched.positions
        # ragged batches on a mesh: pad rows to the data-axis size with
        # copies of the last lane, sliced off after the run (positions
        # pad on their batch axis 2, so pad_batch_to_mesh doesn't apply)
        pad_rows = mesh_lib.data_axis_pad(self.mesh, B)
        if pad_rows:
            image_embeds = jnp.concatenate(
                [image_embeds] + [image_embeds[-1:]] * pad_rows, axis=0
            )
            init = np.concatenate(
                [init, np.repeat(init[-1:], pad_rows, axis=0)], axis=0
            )
            if sched.kind == "single":
                positions = np.concatenate(
                    [positions, np.repeat(positions[:, :, -1:], pad_rows, axis=2)],
                    axis=2,
                )
        if (spec.prune_k is not None
                and spec.prune_stage1 == "factorized"
                and not self.cfg.allow_deep_stage1):
            depth = stage1_map_depth(spec, int(init.shape[0]))
            if depth > MAX_STAGE1_MAP_DEPTH:
                raise ValueError(
                    f"factorized stage-1 would chunk its candidate encode "
                    f"into a {depth}-deep lax.map of "
                    f"{int(init.shape[0])}-row truncated passes — beyond "
                    f"the measured-safe envelope (depth "
                    f"{MAX_STAGE1_MAP_DEPTH}; the 200-deep B=512/"
                    f"row_chunk=800 program reproducibly device-faults on "
                    f"the axon v5e runtime, BASELINE.md r4). Shrink the "
                    f"depth with --prune_stage1_precut (the dominant "
                    f"cascade tier anyway), a larger --clip_row_chunk, or "
                    f"a smaller batch; or pass --allow_deep_stage1 to run "
                    f"the deep program anyway."
                )
        from conzic_tpu.engine import host_exact

        needs_host_cb = spec.exact_bridge or (
            spec.ctl is not None and spec.ctl_mode == "exact"
        )
        if needs_host_cb and not host_exact.supports_host_callbacks():
            # this TPU runtime rejects jax host callbacks: run the exact
            # (reference decode->re-tokenize / sentence-tagging) modes as
            # a host-stepped loop
            if self.mesh is not None:
                raise NotImplementedError(
                    "bridge_mode='exact' / ctl_mode='exact' on a mesh "
                    "requires a backend with host-callback support"
                )
            t0 = time.time()
            iter_ids, iter_cos, iter_ctl, best_ids, best_cos = (
                host_exact.run_generation_host(
                    self, spec, image_embeds, init, np.asarray(positions),
                    hyper, tables,
                    span_sizes=(
                        np.asarray(sched.span_sizes)
                        if sched.span_sizes is not None else None
                    ),
                )
            )
            elapsed = time.time() - t0
            return self._package_result(
                iter_ids, iter_cos, iter_ctl, best_ids, best_cos, B, elapsed
            )

        positions = jnp.asarray(positions)
        sizes = jnp.asarray(sched.span_sizes) if sched.span_sizes is not None else None
        init_dev = mesh_lib.shard_batch(self.mesh, jnp.asarray(init))
        image_embeds = mesh_lib.shard_batch(self.mesh, image_embeds)

        t0 = time.time()
        iter_ids, iter_cos, iter_ctl, best_ids, best_cos = self._compiled(spec)(
            self.params, tables, hyper, image_embeds, init_dev,
            positions, sizes,
        )
        # dispatch is asynchronous: block before reading the clock, or
        # elapsed records dispatch time (~ms) instead of generation time
        # (the reference's "Finished in %.3fs", gen_utils.py:294)
        jax.block_until_ready((iter_ids, iter_cos, iter_ctl, best_ids,
                               best_cos))
        elapsed = time.time() - t0
        return self._package_result(
            iter_ids, iter_cos, iter_ctl, best_ids, best_cos, B, elapsed
        )

    def _package_result(self, iter_ids, iter_cos, iter_ctl, best_ids,
                        best_cos, B, elapsed) -> GenerationResult:
        """Decode snapshots and build the reference-contract result (rows
        beyond B are mesh padding and sliced off). On a multi-host run
        the outputs are not fully addressable here: gather them so every
        process decodes the full result (single-process: plain asarray)."""
        from conzic_tpu.parallel.distributed import gather_to_host

        iter_ids = gather_to_host(iter_ids)[:, :B]
        iter_cos = gather_to_host(iter_cos)[:, :B]
        iter_ctl = gather_to_host(iter_ctl)[:, :B]
        best_ids = gather_to_host(best_ids)[:B]
        best_cos = gather_to_host(best_cos)[:B]

        gen_texts_list: List[List[str]] = []
        clip_score_sequence: List[List[float]] = []
        for i in range(iter_ids.shape[0]):
            gen_texts_list.append(
                self._decoder.batch_decode(iter_ids[i], skip_special_tokens=True)
            )
            clip_score_sequence.append([float(c) for c in iter_cos[i]])
        decoded_best = self._decoder.batch_decode(
            best_ids, skip_special_tokens=True
        )
        best_caps = [
            # "None" where the best never improved over the 0-initialized
            # tracker (reference: best_caption stays unset)
            decoded_best[b] if best_cos[b] > 0 else "None"
            for b in range(B)
        ]
        gen_texts_list.append(best_caps)
        clip_score_sequence.append([float(c) for c in best_cos])
        return GenerationResult(
            gen_texts_list=gen_texts_list,
            clip_score_sequence=clip_score_sequence,
            iter_ids=iter_ids,
            iter_ctl=iter_ctl,
            best_ids=best_ids,
            best_cos=best_cos,
            elapsed_s=elapsed,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def split_samples(result: GenerationResult, n_samples: int) -> List[GenerationResult]:
        """Unpack a fused ``n_samples`` run into per-sample results."""
        B = result.iter_ids.shape[1]
        B0 = B // n_samples
        out = []
        for s in range(n_samples):
            sl = slice(s * B0, (s + 1) * B0)
            out.append(
                GenerationResult(
                    gen_texts_list=[row[sl] for row in result.gen_texts_list],
                    clip_score_sequence=[
                        row[sl] for row in result.clip_score_sequence
                    ],
                    iter_ids=result.iter_ids[:, sl],
                    iter_ctl=result.iter_ctl[:, sl],
                    best_ids=result.best_ids[sl],
                    best_cos=result.best_cos[sl],
                    elapsed_s=result.elapsed_s,
                )
            )
        return out

    # ------------------------------------------------------------------
    def log_iterations(
        self,
        logger: logging.Logger,
        img_name: Sequence[str],
        result: GenerationResult,
        with_ctl: bool = False,
    ) -> None:
        """Per-iteration logs in the reference format (gen_utils.py:89-90,
        control_gen_utils.py:73-74). Emitted after the run — the program is
        one XLA computation, so logs are not interleaved with compute."""
        I = result.iter_ids.shape[0]
        B = result.iter_ids.shape[1]
        for i in range(I):
            for_print = self._decoder.batch_decode(result.iter_ids[i])
            for jj in range(B):
                cos = result.clip_score_sequence[i][jj]
                if with_ctl:
                    logger.info(
                        f"iter {i + 1}, The {jj + 1}-th image: {img_name[jj]},"
                        f" clip score {cos:.3f}, ctl score "
                        f"{result.iter_ctl[i][jj]:.3f}: " + for_print[jj]
                    )
                else:
                    logger.info(
                        f"iter {i + 1}, The {jj + 1}-th image: {img_name[jj]},"
                        f"clip score {cos:.3f}: " + for_print[jj]
                    )


# ---------------------------------------------------------------------------
# Reference-contract entry functions (gen_utils.py:289 / control_gen_utils.py:197)
# ---------------------------------------------------------------------------

def generate_caption(
    img_name,
    captioner: Captioner,
    image_instance,
    logger: logging.Logger,
    prompt: str = "",
    batch_size: int = 1,
    max_len: int = 15,
    top_k: int = 100,
    temperature: float = 1.0,
    max_iter: int = 500,
    alpha: float = 0.7,
    beta: float = 1.0,
    generate_order: str = "sequential",
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[List[List[str]], List[List[float]]]:
    start = time.time()
    image_embeds = (
        image_instance
        if isinstance(image_instance, jax.Array)
        else captioner.encode_images(
            image_instance if isinstance(image_instance, (list, tuple)) else [image_instance] * batch_size
        )
    )
    result = captioner.run(
        image_embeds,
        prompt=prompt,
        max_len=max_len,
        top_k=top_k,
        temperature=temperature,
        max_iter=max_iter,
        alpha=alpha,
        beta=beta,
        order=generate_order,
        rng=rng,
    )
    if captioner.cfg.verbose:
        captioner.log_iterations(logger, img_name, result)
    logger.info("Finished in %.3fs" % (time.time() - start))
    final_caption = result.gen_texts_list[-2]
    best_caption = result.gen_texts_list[-1]
    for i in range(len(final_caption)):
        logger.info(f"The {i + 1}-th image: {img_name[i]}")
        logger.info(f"final caption: {final_caption[i]}")
        logger.info(f"best caption: {best_caption[i]}")
    return result.gen_texts_list, result.clip_score_sequence


def control_generate_caption(
    img_name,
    captioner: Captioner,
    image_instance,
    logger: logging.Logger,
    prompt: str = "",
    batch_size: int = 10,
    max_len: int = 25,
    top_k: int = 100,
    temperature: float = 1.0,
    max_iter: int = 500,
    alpha: float = 0.7,
    beta: float = 1.0,
    gamma: float = 5.0,
    ctl_type: str = "sentiment",
    style_type: str = "positive",
    pos_type=None,
    generate_order: str = "sequential",
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[List[List[str]], List[List[float]]]:
    start = time.time()
    image_embeds = (
        image_instance
        if isinstance(image_instance, jax.Array)
        else captioner.encode_images(
            image_instance if isinstance(image_instance, (list, tuple)) else [image_instance] * batch_size
        )
    )
    if ctl_type == "sentiment":
        # sentiment supports sequential and shuffle (control_gen_utils.py:204-217)
        order = generate_order if generate_order in ("sequential", "shuffle") else "shuffle"
        ctl = "sentiment"
        negative = style_type == "negative"
    else:
        order = "sequential"  # POS control is sequential-only (":220")
        ctl = "pos"
        negative = False
    result = captioner.run(
        image_embeds,
        prompt=prompt,
        max_len=max_len,
        top_k=top_k,
        temperature=temperature,
        max_iter=max_iter,
        alpha=alpha,
        beta=beta,
        gamma=gamma,
        order=order,
        ctl=ctl,
        negative=negative,
        rng=rng,
        pos_template=pos_type if ctl == "pos" else None,
    )
    if captioner.cfg.verbose:
        captioner.log_iterations(logger, img_name, result, with_ctl=True)
    logger.info("Finished in %.3fs" % (time.time() - start))
    final_caption = result.gen_texts_list[-2]
    best_caption = result.gen_texts_list[-1]
    for i in range(len(final_caption)):
        logger.info(f"The {i + 1}-th image: {img_name[i]}")
        logger.info(f"final caption: {final_caption[i]}")
        logger.info(f"best caption: {best_caption[i]}")
    return result.gen_texts_list, result.clip_score_sequence
