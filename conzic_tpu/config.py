"""Single configuration dataclass shared by CLI / API / web UI.

The reference duplicates ~60 argparse lines across three entry points
(``/root/reference/demo.py:15-76``, ``run.py:15-76``, ``app.py:17-78``);
here one dataclass carries flag parity (same names, same defaults) plus the
TPU-specific knobs of the rebuild.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List, Optional

DEFAULT_POS_TEMPLATE: List[List[str]] = [
    ["DET"], ["ADJ", "NOUN"], ["NOUN"], ["VERB"], ["VERB"], ["ADV"],
    ["ADP"], ["DET", "NOUN"], ["NOUN"], ["NOUN", "."], [".", "NOUN"],
    [".", "NOUN"],
]


@dataclasses.dataclass
class ConzicConfig:
    # --- reference flags (demo.py:15-76 names & defaults) -----------------
    seed: int = 42
    batch_size: int = 1
    run_type: str = "caption"  # caption | controllable
    prompt: str = "Image of a"
    order: str = "shuffle"  # sequential | shuffle | span | random | parallel
    control_type: str = "sentiment"  # sentiment | pos
    sentiment_type: str = "positive"  # positive | negative
    pos_type: List[List[str]] = dataclasses.field(
        default_factory=lambda: [list(s) for s in DEFAULT_POS_TEMPLATE]
    )
    samples_num: int = 2
    sentence_len: int = 10
    candidate_k: int = 200
    alpha: float = 0.02
    beta: float = 2.0
    gamma: float = 5.0
    lm_temperature: float = 0.1
    num_iterations: int = 10
    lm_model: str = "bert-base-uncased"
    match_model: str = "openai/clip-vit-base-patch32"
    caption_img_path: str = "./examples/girl.jpg"
    stop_words_path: Optional[str] = None  # rule-derived mask when None
    add_extra_stopwords: List[str] = dataclasses.field(default_factory=list)

    # --- rebuild-specific knobs ------------------------------------------
    dtype: str = "bfloat16"  # compute dtype on TPU; "float32" for parity
    param_dtype: str = "float32"  # "bfloat16" halves weight HBM traffic
    # candidate CLIP-id assembly: "table" = on-device BERT-id->CLIP-id
    # bridge (fast; '##' continuations bridged as word starts — see
    # PARITY.md); "exact" = host callback reproducing the reference's
    # decode -> re-tokenize byte-exactly (gen_utils.py:75, clip/clip.py:71)
    bridge_mode: str = "table"
    # control-energy mode (the control analog of bridge_mode): "table" =
    # per-token device tables (fast, context-free); "exact" = the
    # reference's sentence-level tagging per candidate on the host
    # (real NLTK pipeline when its data packs exist, the repo's built-in
    # evaluators otherwise; sentiments_classifer.py:14-32,
    # POS_classifier.py:6-31)
    ctl_mode: str = "table"
    # opt-in NON-parity int8 MXU path for the CLIP text tower's
    # projections/MLPs ("int8_all" additionally quantizes the BERT
    # proposal encoder). MEASURED END-TO-END LOSER on this toolchain
    # (r3 s9): full parity 1.75 vs 3.25 caps/s, pruned prune3/B=512
    # 51.3 vs 82.4 — the per-matmul quantize/dequantize ops are fusion
    # barriers around every hot matmul (same mechanism as the six losing
    # attention reformulations; CLAUDE.md fusion-preservation lesson),
    # swamping the ~1.47x op-level int8 rate (r2 s3 isolation
    # microbench; nominal 2x). Kept as a tested opt-in for other
    # toolchains; do not re-measure blind.
    quant: str = "none"  # none | int8 | int8_all
    # opt-in speed tier: pre-select prune_k of the k candidates by the
    # bag-of-word-embeddings proxy before full CLIP scoring (0 = off,
    # full parity). Quality cells: PRUNING_MATRIX.json.
    prune_k: int = 0
    # with prune_k: run the LAST iteration with full k-candidate scoring,
    # so the committed caption is a full-parity polish sweep over the
    # pruned state (the quality-bounded fast tier)
    prune_final_exact: bool = False
    # stage-1 scorer for prune_k: "proxy" (bag-of-word-embeddings — the
    # r2/r3 tier) or "factorized" — all k candidates scored by the FIRST
    # prune_stage1_layers text-tower layers + a per-checkpoint
    # least-squares-calibrated projection, then top prune_k exact-rescored.
    # Measured ~10x lower per-step selection regret than the proxy on
    # semantic weights (FACTORIZED_FIDELITY.json); costs ~N/L of a full
    # candidate encode per candidate. Requires unrolled layers
    # (scan_layers=False).
    prune_stage1: str = "proxy"
    prune_stage1_layers: int = 2
    # cascade pre-cut for the factorized stage-1: 0 = score all k
    # candidates through the truncated tower; m > 0 = the bag-proxy first
    # cuts k -> m, the truncated tower scores only those m, then the top
    # prune_k are exact-rescored. The truncated-tower encode is the
    # factorized tier's dominant cost (k * layers/num_layers of a full
    # candidate encode), so m ~ 24-32 buys back most of it.
    prune_stage1_precut: int = 0
    # what the pre-cut stage is: "proxy" (the bag — near-free, but its
    # recall collapses on long contexts: the r4 len77 cascade cells fail
    # at +0.0514/+0.0422 while no-precut passes) or "tower" — a SHALLOWER
    # truncated tower + its own calibrated projection scores all k at
    # ~k*precut_layers/num_layers encode cost (the two-stage factorized
    # cascade, the len77 tier's lever; VERDICT r4 item 2).
    prune_stage1_precut_mode: str = "proxy"
    prune_stage1_precut_layers: int = 1
    # control-aware stage-1 ranking: rank every stage-1 cut by the full
    # combine (alpha*lm + beta*softmax(scale*surrogate_cos) +
    # gamma*ctl_probs [+ repeat penalty]) instead of the surrogate cosine
    # alone. Cosine-only ranking structurally drops the control effect —
    # measured on trained_mid (EVAL.md r5): sentiment shift +2.40 at full
    # parity collapses to +0.03 at the cosine-ranked fact50pc96 tier,
    # while its Δcos gate cell stays "under" (the gate bounds cosine, not
    # steering). "auto" (default) = on whenever a control is active and a
    # pruned tier is; "on"/"off" force. Free tiers are never affected.
    prune_stage1_ctl: str = "auto"
    # override for the factorized stage-1 deep-map guard: the no-precut
    # B=512/clip_row_chunk=800 program (a 200-deep lax.map of 512-row
    # truncated encodes) reproducibly device-faults UNAVAILABLE on the
    # axon v5e runtime (BASELINE.md r4), so sampler.run refuses stage-1
    # encode map depths beyond the measured-safe envelope
    # (sampler.MAX_STAGE1_MAP_DEPTH) with a pointed error naming the
    # knobs that shrink the depth. True runs the deep program anyway.
    allow_deep_stage1: bool = False
    # exact prefix-KV reuse: candidate sentences share their CLIP prefix up
    # to the edited word; chunking the position scan gives each chunk a
    # static prefix length whose K/V are computed once at batch width
    # instead of batch*k (see engine/gibbs.py). 0 disables. Measured: ONE
    # chunk (size >= sentence_len, prompt-only prefix) is fastest — extra
    # chunk bodies cost more in XLA scan-boundary copies than their deeper
    # prefixes save (ROADMAP r2 notes).
    kv_chunk_size: int = 16
    # candidate CLIP rows per text-tower pass: batches beyond ~2-3k rows hit
    # an XLA regime with heavy layout copies (ROADMAP #1); larger B*k
    # batches are scanned in chunks of this many rows. 0 disables chunking.
    # Sweep (ROADMAP r2 s3): ~800 rows/pass is the plateau start across
    # B=8..32 (B=32: rc 1600 -> 2.94, 800 -> 3.08, 400/200 flat; B=8:
    # 1600 -> 2.79, 800 -> 2.92); B=64 measured better at 1600 — tune
    # this flag for unusual batch sizes.
    clip_row_chunk: int = 800
    # long contexts (clip_len > 48) further cap the scoring chunk to
    # ~this many tokens per pass (0 disables the cap). Sweep at
    # clip_len=77/B=8 (r2 s3): 4000 -> 0.441, 8000 -> 0.402,
    # 16000 -> 0.469, 32000 -> 0.364, uncapped -> 0.311 caps/s.
    clip_token_budget: int = 16000
    clip_len: int = 32  # static CLIP context (<=77); 77 = reference max
    # pad candidate rows to this static length (masked PAD columns; exact,
    # test-pinned identical outputs) before the text tower. -1 = auto:
    # round clip_len up to a sublane multiple (8) when clip_len > 64 —
    # measured r3: 77 -> 80 runs +42% (0.450 -> 0.639 caps/s at B=8; the
    # odd-S suffix was the S>64 XLA copy regime). 0 disables; N pads to N
    # (128 measured WORSE than 80: the extra columns' FLOPs eat the
    # alignment win).
    clip_pad_to: int = -1
    # windowed candidate encode (r5): score candidates over only the
    # first clip_window columns whenever every assembled row fits the
    # window; a per-step lax.cond falls back to the full static width
    # otherwise, so outputs are EXACT at any value (causal tower,
    # first-EOS pooling). The clip_len=77 reference-shape lever: the
    # 80-padded static bound is ~4x the default workload's ~17-piece
    # stream. Rounded up to a sublane multiple (8) at spec build;
    # ignored when >= the effective static width. 0 disables.
    # Single-chip only (the fit check is a cross-shard reduction on a
    # batch-sharded mesh — refused with --mesh_data_axis > 1).
    clip_window: int = 0
    attn_impl: str = "xla"  # xla | twoblock | pallas | pallas_out | xla_bhsd
    # block width of the exact two-stage top-k (engages at B>=128); the
    # stage-1 batched sort is the pruned tier's largest single op.
    # Sweep at prune5/B=128 (r3): 1024 -> 51.92, 2048 -> 51.93,
    # 4096 -> 51.43, 8192 -> 50.50 caps/s
    topk_chunk: int = 2048
    # stage-1 vocab top-k mode: "exact" (parity) or "approx"
    # (jax.lax.approx_max_k, TPU PartialReduce custom call) — NON-parity,
    # only allowed together with prune_k (the proxy-pruned tier is already
    # approximate and quality-gated); the hybrid final sweep stays exact.
    topk_mode: str = "exact"
    topk_recall: float = 0.95  # approx_max_k per-call recall target
    # stop-mask lookup on the selected top-k ids: "gather" (take-along
    # from the f32[V] mask — reference-shaped default) or "compare"
    # (membership test against the static banned-id lists). EXACT — same
    # candidate ids bit-for-bit, incl. the softmax-underflow 0.0-tie
    # regime — but swaps the pruned tier's largest single scalar-core op
    # (691 us/position kCustom gather at approx/B=256) for a fused vector
    # compare-reduce. Measure before adopting (fusion-preservation lesson).
    mask_impl: str = "gather"
    # extra XLA compiler options for the engine program, "k=v,k=v" —
    # applied on TPU backends only (sampler guard). Default = the
    # tools/flag_sweep.py winner on v5e (XLA_FLAG_SWEEP.json: +3-5% full
    # parity over repeats; vmem 32768 and no-dot-strength-reduction stack).
    # NOTE the winner is parity-tier-specific: on the pruned tier
    # (prune3/approx0.9/B=512 cells) base measured 82.93 vs winner 82.25
    # — neutral-to-slightly-negative, within noise. Kept as default for
    # the full-parity headline. Set "" to fall back to toolchain defaults.
    compiler_options: str = (
        "xla_tpu_scoped_vmem_limit_kib=32768,"
        "xla_tpu_enable_dot_strength_reduction=false"
    )
    mesh_data_axis: int = 1  # chips to shard the (images x samples) batch over
    matmul_precision: str = "default"  # default | high | highest
    scan_layers: bool = False  # nn.scan layers: smaller program, but 3x slower cold compile on this toolchain (see ROADMAP)
    verbose: bool = True
    logger_dir: str = "logger"
    results_dir: str = "results"

    def validate(self) -> None:
        assert self.order in ("sequential", "shuffle", "span", "random", "parallel")
        assert self.run_type in ("caption", "controllable")
        assert self.control_type in ("sentiment", "pos")
        assert self.sentiment_type in ("positive", "negative")
        assert self.quant in ("none", "int8", "int8_all")
        assert self.mask_impl in ("gather", "compare")
        assert 1 <= self.clip_len <= 77
        assert self.clip_window >= 0
        assert self.prune_stage1 in ("proxy", "factorized")
        assert self.prune_stage1_layers >= 0  # 0 = auto-select at
        # calibration time (smallest depth clearing the measured
        # held-out-cosine pass band; sampler._ensure_stage1_calibration)
        assert self.prune_stage1_precut >= 0
        assert self.prune_stage1_precut_mode in ("proxy", "tower")
        assert self.prune_stage1_precut_layers >= 1
        assert self.prune_stage1_ctl in ("auto", "on", "off")
        if self.prune_stage1 == "factorized":
            assert self.prune_k > 0, "--prune_stage1 factorized requires --prune_k"
            assert not self.scan_layers, (
                "factorized stage-1 needs unrolled layer params "
                "(scan_layers=False)")
            if self.prune_stage1_precut:
                assert self.prune_stage1_precut > self.prune_k, (
                    "--prune_stage1_precut must exceed --prune_k "
                    "(it is the intermediate cascade width)")
                if (self.prune_stage1_precut_mode == "tower"
                        and self.prune_stage1_layers):
                    assert (self.prune_stage1_precut_layers
                            < self.prune_stage1_layers), (
                        "--prune_stage1_precut_layers must be SHALLOWER "
                        "than --prune_stage1_layers (the pre-cut exists "
                        "to be cheaper than the stage it feeds)")
        else:
            assert not self.prune_stage1_precut, (
                "--prune_stage1_precut only applies to the factorized "
                "stage-1 (the proxy IS the pre-cut scorer)")


def add_reference_args(p: argparse.ArgumentParser) -> None:
    """Flags mirroring the reference CLIs (demo.py:15-76 / run.py:15-76)."""
    d = ConzicConfig()
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--device", type=str, default="tpu",
                   choices=["tpu", "cpu", "cuda"],
                   help="cpu forces the CPU backend (functional); "
                        "tpu/cuda let jax pick the platform")
    p.add_argument("--run_type", default=d.run_type, nargs="?",
                   choices=["caption", "controllable"])
    p.add_argument("--prompt", default=d.prompt, type=str)
    p.add_argument("--order", default=d.order, nargs="?",
                   choices=["sequential", "shuffle", "span", "random", "parallel"])
    p.add_argument("--control_type", default=d.control_type, nargs="?",
                   choices=["sentiment", "pos"])
    p.add_argument("--sentiment_type", default=d.sentiment_type, nargs="?",
                   choices=["positive", "negative"])
    p.add_argument("--samples_num", default=d.samples_num, type=int)
    p.add_argument("--sentence_len", type=int, default=d.sentence_len)
    p.add_argument("--candidate_k", type=int, default=d.candidate_k)
    p.add_argument("--alpha", type=float, default=d.alpha)
    p.add_argument("--beta", type=float, default=d.beta)
    p.add_argument("--gamma", type=float, default=d.gamma)
    p.add_argument("--lm_temperature", type=float, default=d.lm_temperature)
    p.add_argument("--num_iterations", type=int, default=d.num_iterations)
    p.add_argument("--lm_model", type=str, default=d.lm_model)
    p.add_argument("--match_model", type=str, default=d.match_model)
    p.add_argument("--caption_img_path", type=str, default=d.caption_img_path)
    p.add_argument("--stop_words_path", type=str, default=None)
    p.add_argument("--add_extra_stopwords", type=str, nargs="*", default=[])
    # rebuild knobs
    p.add_argument("--dtype", type=str, default=d.dtype,
                   choices=["bfloat16", "float32"])
    p.add_argument("--param_dtype", type=str, default=d.param_dtype,
                   choices=["bfloat16", "float32"])
    p.add_argument("--quant", type=str, default=d.quant,
                   choices=["none", "int8", "int8_all"],
                   help="int8: quantized candidate scoring (non-parity "
                        "speed tier, like prune_k); int8_all: also "
                        "quantize the BERT proposal encoder")
    p.add_argument("--prune_k", type=int, default=d.prune_k,
                   help="candidate pre-selection size (0 = full parity); "
                        "speed tier, quality cells in PRUNING_MATRIX.json")
    p.add_argument("--prune_final_exact", action="store_true",
                   default=d.prune_final_exact,
                   help="with --prune_k: full-scoring final sweep (the "
                        "quality-bounded fast tier)")
    p.add_argument("--prune_stage1", type=str, default=d.prune_stage1,
                   choices=["proxy", "factorized"],
                   help="stage-1 scorer for --prune_k: bag-of-embeddings "
                        "proxy, or the truncated-tower factorized scorer "
                        "(~10x lower selection regret, costs ~N/L of a "
                        "full encode per candidate)")
    p.add_argument("--prune_stage1_layers", type=int,
                   default=d.prune_stage1_layers,
                   help="text-tower layers the factorized stage-1 runs "
                        "(0 = auto: smallest depth whose calibration "
                        "held-out cosine clears the measured pass band)")
    p.add_argument("--prune_stage1_precut", type=int,
                   default=d.prune_stage1_precut,
                   help="factorized cascade: proxy pre-cut width m "
                        "(k -> m -> prune_k); 0 scores all k through the "
                        "truncated tower")
    p.add_argument("--prune_stage1_precut_mode", type=str,
                   default=d.prune_stage1_precut_mode,
                   choices=["proxy", "tower"],
                   help="pre-cut scorer: bag proxy (near-free; collapses "
                        "at long contexts) or a shallower truncated tower "
                        "(the two-stage factorized cascade — the len77 "
                        "lever)")
    p.add_argument("--prune_stage1_precut_layers", type=int,
                   default=d.prune_stage1_precut_layers,
                   help="tower pre-cut depth (must be < "
                        "--prune_stage1_layers)")
    p.add_argument("--prune_stage1_ctl", type=str,
                   default=d.prune_stage1_ctl,
                   choices=["auto", "on", "off"],
                   help="control-aware stage-1 ranking: rank pruning cuts "
                        "by the full combine (incl. the gamma control "
                        "term) instead of surrogate cosine alone — "
                        "cosine-only cuts drop the control effect "
                        "(EVAL.md r5). auto = on for controlled pruned "
                        "runs")
    p.add_argument("--allow_deep_stage1", action="store_true",
                   default=d.allow_deep_stage1,
                   help="run factorized stage-1 programs whose candidate-"
                        "encode lax.map is deeper than the measured-safe "
                        "envelope (the 200-deep no-precut B=512/rc=800 "
                        "program reproducibly device-faults; BASELINE.md)")
    p.add_argument("--bridge_mode", type=str, default=d.bridge_mode,
                   choices=["table", "exact"],
                   help="candidate CLIP-id assembly: on-device table "
                        "(fast) or the reference's decode->re-tokenize "
                        "host callback (byte-exact, incl. '##' merging)")
    p.add_argument("--ctl_mode", type=str, default=d.ctl_mode,
                   choices=["table", "exact"],
                   help="control energies: per-token device tables (fast) "
                        "or the reference's per-candidate sentence-level "
                        "tagging on the host (exact)")
    p.add_argument("--kv_chunk_size", type=int, default=d.kv_chunk_size)
    p.add_argument("--clip_row_chunk", type=int, default=d.clip_row_chunk)
    p.add_argument("--clip_token_budget", type=int,
                   default=d.clip_token_budget)
    p.add_argument("--clip_len", type=int, default=d.clip_len)
    p.add_argument("--clip_pad_to", type=int, default=d.clip_pad_to)
    p.add_argument("--clip_window", type=int, default=d.clip_window,
                   help="windowed candidate encode: score over the first "
                        "N columns when every row fits (exact; lax.cond "
                        "full-width fallback). 0 disables")
    p.add_argument("--topk_chunk", type=int, default=d.topk_chunk)
    p.add_argument("--topk_mode", type=str, default=d.topk_mode,
                   choices=["exact", "approx"],
                   help="approx = approx_max_k stage-1 candidate top-k "
                        "(non-parity; requires --prune_k)")
    p.add_argument("--topk_recall", type=float, default=d.topk_recall)
    p.add_argument("--mask_impl", type=str, default=d.mask_impl,
                   choices=["gather", "compare"],
                   help="stop-mask lookup form for selected ids (exact "
                        "either way; compare avoids the f32[V] gather)")
    p.add_argument("--attn_impl", type=str, default=d.attn_impl,
                   choices=["xla", "twoblock", "xla_bhsd", "pallas",
                            "pallas_out"])
    p.add_argument("--mesh_data_axis", type=int, default=d.mesh_data_axis)
    p.add_argument("--compiler_options", type=str, default=d.compiler_options,
                   help="extra XLA options for the engine program, k=v,k=v")


def config_from_args(args: argparse.Namespace) -> ConzicConfig:
    if getattr(args, "device", None) == "cpu":
        # functional --device cpu for EVERY entry point that parses the
        # shared flags: the TPU platform plugin overrides JAX_PLATFORMS,
        # so forcing CPU requires jax.config before backend init
        # (CLAUDE.md). Safe here — config parsing precedes any model
        # build in all CLIs.
        import jax

        jax.config.update("jax_platforms", "cpu")
    # persistent XLA compilation cache for every CLI: full-size engine
    # programs cold-compile in ~4-6 min on the axon remote compiler;
    # with the cache a repeat invocation with the same shapes starts in
    # seconds (runtime/cache.py; $CONZIC_JAX_CACHE overrides the dir)
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = ConzicConfig()
    for f in dataclasses.fields(ConzicConfig):
        if hasattr(args, f.name):
            setattr(cfg, f.name, getattr(args, f.name))
    cfg.validate()
    return cfg
