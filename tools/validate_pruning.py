#!/usr/bin/env python
"""Quality matrix for the two-stage candidate-pruning mode.

Runs the same generations with full scoring (reference semantics) and with
``prune_k`` pre-selection across a (order x control x prune_k) matrix and
reports, per cell:
  - caption agreement (exact-match rate of final captions),
  - token agreement (fraction of committed sentence tokens equal),
  - CLIPScore delta (mean best-cosine difference, full - pruned).

With real checkpoints (``--lm_model/--match_model`` dirs) this quantifies
the speed/quality trade; with ``--random_models`` it sanity-checks proxy
ordering only (random weights carry no semantics — the committed
PRUNING_MATRIX.json records which weights produced it).

Usage:
  python tools/validate_pruning.py --random_models --prune_k 40      # one cell
  python tools/validate_pruning.py --random_models --matrix          # full matrix
  python tools/validate_pruning.py --random_models tiny --matrix     # CPU-fast
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MATRIX_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PRUNING_MATRIX.json",
)


def session_tag() -> str:
    """Provenance tag recorded per cell (ADVICE r3): absolute timings
    (the ``speedup`` field) drift up to ~12% across fresh VMs, so cells
    must carry which session measured them. Override with
    CONZIC_SESSION; defaults to host + UTC date."""
    import datetime
    import socket

    tag = os.environ.get("CONZIC_SESSION")
    if tag:
        return tag
    return (socket.gethostname() + ":"
            + datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%d"))


def cell_key(*, order="sequential", ctl=None, prune_k, topk_mode="exact",
             recall=0.95, final_exact=False, quant="none",
             n_images=4, clip_len=24, seed=0,
             stage1="proxy", stage1_pct=50, precut=0,
             precut_tower_pct=0, ctl_rank=False) -> str:
    """THE matrix cell-key grammar, in one place:
    ``order/<ctl|free>/prune<k>[+fact<pct>[pc<m>[t<pct>]]][+ctlrank]
    [+approx<recall>][+final_exact][+int8|+int8_all][@n<N>][@len<L>]
    [@s<seed>]``.
    bench.py's gate matches this order (its standalone copy is
    comment-linked here) and tests/test_bench_gate.py pins the committed
    matrix against the same regex — hand-assembled keys drift (commit
    b0b28ba: typos silently un-gate operating points), so every producer
    builds keys HERE. ``+fact<pct>`` marks the factorized stage-1
    (truncated-tower scorer) in place of the default proxy; <pct> is the
    scorer's DEPTH PERCENT (100 * layers / tower_layers), not a layer
    count — the trained evidence (4-layer tower) and full-size runs
    (12 layers) only align on relative depth, and the per-checkpoint
    calibration held-out cosine (sampler._ensure_stage1_calibration)
    checks the transfer at runtime. ``pc<m>`` marks the cascade's
    pre-cut width; a trailing ``t<pct>`` marks the TOWER pre-cut (a
    shallower truncated tower at that depth percent replacing the bag
    proxy — the two-stage cascade, r5). ``+ctlrank`` marks the
    control-aware stage-1 ranking (config.prune_stage1_ctl, the r5
    default for controlled pruned runs) — its cells are measured on a
    DIFFERENT program than the r4 cosine-ranked ctl cells, so the two
    must never share a key."""
    key = f"{order}/{ctl or 'free'}/prune{prune_k}"
    if stage1 == "factorized":
        key += f"+fact{stage1_pct:g}"
        if precut:
            key += f"pc{precut}"
            if precut_tower_pct:
                key += f"t{precut_tower_pct:g}"
    if ctl_rank:
        key += "+ctlrank"
    if topk_mode == "approx":
        key += f"+approx{recall:g}"
    if final_exact:
        key += "+final_exact"
    if quant != "none":
        key += f"+{quant}"
    if n_images != 4:
        key += f"@n{n_images}"
    if clip_len != 24:
        key += f"@len{clip_len}"
    if seed != 0:
        key += f"@s{seed}"
    return key


def build_quant_captioner(cfg, quant, recall, random_models):
    """The pruned-side captioner for quantized cells: same config (and —
    via deterministic init / checkpoint loads — identical weights) with
    the quantized compute path baked in at model construction."""
    import dataclasses

    from conzic_tpu.api.demo import build_captioner

    cap_q = build_captioner(
        dataclasses.replace(cfg, quant=quant), random_models=random_models
    )
    cap_q.cfg.verbose = False
    cap_q.cfg.topk_recall = recall
    return cap_q


def run_cell(cap, embeds, *, order, ctl, prune_k, sentence_len, iters, k,
             final_exact=False, topk_mode="exact", cap_pruned=None,
             return_runs=False):
    """One (order, ctl, prune_k) quality cell. NOTE: the ``speedup``
    column is wall-clock including any first-run compile of a cold spec —
    treat it as informational; caps/s operating points come from bench.py
    (warmed). The quality metrics are the purpose of the matrix.

    ``topk_mode="approx"`` applies to the PRUNED run only (the sampler
    refuses it without prune_k); the full-parity side always uses the
    exact stage-1 top-k, so the cell measures the combined
    approx-candidate-set + proxy-pruning quality gap.

    ``cap_pruned``: optional separate captioner for the pruned side —
    quantized cells (``--quant``) compare an fp full-parity run against a
    quantized pruned run, so the cell bounds the COMBINED
    quant+prune(+approx) gap vs reference semantics. Defaults to ``cap``
    (same models both sides)."""
    runs = {}
    for name, pk in (("full", None), ("pruned", prune_k)):
        c = cap if name == "full" else (cap_pruned or cap)
        c.cfg.topk_mode = topk_mode if pk else "exact"
        runs[name] = c.run(
            embeds, prompt="Image of a", max_len=sentence_len,
            top_k=k, temperature=0.1, max_iter=iters,
            alpha=0.02, beta=2.0, gamma=5.0 if ctl else 0.0,
            order=order, ctl=ctl, negative=False,
            rng=np.random.RandomState(42), prune_k=pk,
            prune_final_exact=final_exact and pk is not None,
        )
    cap.cfg.topk_mode = "exact"
    if cap_pruned is not None:
        cap_pruned.cfg.topk_mode = "exact"
    full, pruned = runs["full"], runs["pruned"]
    finals_f = full.gen_texts_list[-2]
    finals_p = pruned.gen_texts_list[-2]
    exact = float(np.mean([a == b for a, b in zip(finals_f, finals_p)]))
    tok_agree = float((full.iter_ids[-1] == pruned.iter_ids[-1]).mean())
    cos_delta = float(np.mean(full.best_cos - pruned.best_cos))
    cell = {
        "caption_exact": exact,
        "token_agreement": tok_agree,
        "best_cosine_delta": cos_delta,
        # wall-clock ratio on THIS session's VM only — cross-VM absolute
        # timings drift ~12% (CLAUDE.md); never compare speedups across
        # cells with different "session" tags
        "speedup": full.elapsed_s / max(pruned.elapsed_s, 1e-9),
        "session": session_tag(),
    }
    if return_runs:
        return cell, runs
    return cell


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lm_model", default="bert-base-uncased")
    p.add_argument("--match_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--random_models", nargs="?", const="full",
                   choices=["full", "tiny"], default=False)
    p.add_argument("--prune_k", type=int, default=40)
    p.add_argument("--matrix", action="store_true",
                   help="sweep orders x controls x prune_k and write "
                        "PRUNING_MATRIX.json")
    p.add_argument("--n_images", type=int, default=4)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--clip_len", type=int, default=24)
    p.add_argument("--out", default=MATRIX_PATH)
    p.add_argument("--merge", action="store_true",
                   help="keep existing cells in --out and only run the "
                        "missing ones")
    p.add_argument("--topk_mode", default="exact",
                   choices=["exact", "approx"],
                   help="stage-1 candidate top-k of the PRUNED run "
                        "(approx = approx_max_k; exact on CPU backends)")
    p.add_argument("--topk_recall", type=float, default=0.95)
    p.add_argument("--prune_stage1", default="proxy",
                   choices=["proxy", "factorized"],
                   help="stage-1 scorer (factorized = truncated tower + "
                        "calibrated projection; the r4 quality-at-speed "
                        "tier)")
    p.add_argument("--stage1_layers", type=int, default=2,
                   help="factorized depth; 0 = auto-select at the "
                        "calibration pass band (checkpoint-day mode)")
    p.add_argument("--stage1_precut", type=int, default=0,
                   help="factorized cascade pre-cut width (0 = off)")
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int8_all"],
                   help="quantize the PRUNED side (cells gain a +<tier> "
                        "key suffix; the full-parity side stays fp, so "
                        "the cell bounds the combined quant+prune gap)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon TPU plugin "
                        "overrides JAX_PLATFORMS; see CLAUDE.md)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()  # full-size programs: ~5 min cold compile
    import jax.numpy as jnp

    from conzic_tpu.api.demo import build_captioner
    from conzic_tpu.config import ConzicConfig

    cfg = ConzicConfig()
    cfg.lm_model = args.lm_model
    cfg.match_model = args.match_model
    cfg.clip_len = args.clip_len
    cfg.verbose = False
    cap = build_captioner(cfg, random_models=args.random_models)
    cap.cfg.verbose = False
    cap.cfg.prune_stage1 = args.prune_stage1
    cap.cfg.prune_stage1_layers = args.stage1_layers
    cap.cfg.prune_stage1_precut = args.stage1_precut
    if args.prune_stage1 == "factorized" and args.stage1_layers == 0:
        # resolve auto-depth NOW so the cell keys (and the printed
        # summary) carry the concrete depth the runs will use
        cap._ensure_stage1_calibration()
        print(f"factorized auto-depth: "
              f"{cap.cfg.prune_stage1_layers}/"
              f"{cap.clip_model.config.text.num_layers} layers, "
              f"calibration held-out cosine {cap.stage1_calib_cos:.4f}")
    cap_pruned = None
    if args.quant != "none":
        cap_pruned = build_quant_captioner(
            cfg, args.quant, args.topk_recall, args.random_models
        )

    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        rng.randn(args.n_images, cap.clip_model.config.projection_dim).astype(
            np.float32
        )
    )
    cap.cfg.topk_recall = args.topk_recall
    common = dict(sentence_len=args.sentence_len, iters=args.iters, k=args.k,
                  topk_mode=args.topk_mode, cap_pruned=cap_pruned)

    if args.prune_k >= args.k:
        print(f"NOTE: prune_k={args.prune_k} >= k={args.k} disables pruning "
              f"(sampler clamps it to None) — cells at this point would be "
              f"vacuously perfect; pass a smaller --prune_k or larger --k.")
    if not args.matrix:
        if args.prune_k >= args.k:
            sys.exit(2)
        cell = run_cell(cap, embeds, order="sequential", ctl=None,
                        prune_k=args.prune_k, **common)
        if args.prune_stage1 == "factorized":
            print(f"stage-1: factorized "
                  f"{cap.cfg.prune_stage1_layers} layers"
                  + (f", pre-cut {args.stage1_precut}"
                     if args.stage1_precut else "")
                  + (f", calibration held-out cosine "
                     f"{cap.stage1_calib_cos:.4f}"
                     if hasattr(cap, "stage1_calib_cos") else ""))
        print(f"caption exact-match: {cell['caption_exact']:.2%}")
        print(f"token agreement:     {cell['token_agreement']:.2%}")
        print(f"best-cosine delta (full - pruned): "
              f"{cell['best_cosine_delta']:+.4f}")
        print(f"speedup: {cell['speedup']:.2f}x")
        return

    cells = {}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            cells = json.load(f).get("cells", {})
    # prune_k sweep on the headline order, plus every order and both
    # control modes at the default prune_k (VERDICT r1 item 8)
    jobs = [("sequential", None, pk, False) for pk in (5, 10, 20, 40, 80)]
    jobs += [(o, None, args.prune_k, False)
             for o in ("shuffle", "span", "random")]
    jobs += [("sequential", c, args.prune_k, False)
             for c in ("sentiment", "pos")]
    # hybrid pruned+exact final-sweep cells (the quality-bounded tier),
    # free + both control energies
    jobs += [("sequential", None, pk, True) for pk in (5, 10, 20)]
    jobs += [("sequential", c, 5, True) for c in ("sentiment", "pos")]
    # pk >= k would silently run UN-pruned (sampler clamps prune_k to
    # None) and record vacuously-perfect cells — drop those jobs loudly
    dropped = [(o, c, pk, fe) for o, c, pk, fe in jobs if pk >= args.k]
    for o, c, pk, fe in dropped:
        print(f"SKIP {o}/{c or 'free'}/prune{pk}: prune_k >= k={args.k} "
              f"(cell would be vacuous)")
    jobs = [j for j in jobs if j[2] < args.k]
    # every producer builds keys via cell_key() — see its docstring for
    # the grammar and the drift hazard it pins down. NOTE matrix mode
    # deliberately writes UNSUFFIXED @n/@len/@s keys (its n_images etc.
    # are the matrix-wide config recorded in the artifact header), so
    # those dimensions stay at cell_key's defaults here
    def job_key(o, c, pk, fe):
        pct = round(100 * cap.cfg.prune_stage1_layers
                    / cap.clip_model.config.text.num_layers)
        return cell_key(order=o, ctl=c, prune_k=pk,
                        topk_mode=args.topk_mode, recall=args.topk_recall,
                        final_exact=fe, quant=args.quant,
                        stage1=args.prune_stage1, stage1_pct=pct,
                        precut=args.stage1_precut,
                        ctl_rank=(c is not None
                                  and cap.cfg.prune_stage1_ctl != "off"))

    if args.merge:
        jobs = [j for j in jobs if job_key(*j) not in cells]
    for order, ctl, pk, fe in jobs:
        key = job_key(order, ctl, pk, fe)
        print(f"--- {key}", flush=True)
        cell = run_cell(cap, embeds, order=order, ctl=ctl, prune_k=pk,
                        final_exact=fe, **common)
        for m, v in cell.items():
            print(f"  {m}: {v:.4f}" if isinstance(v, float) else f"  {m}: {v}")
        cells[key] = cell
    result = {
        "weights": ("random-" + args.random_models) if args.random_models
                   else f"{args.lm_model}+{args.match_model}",
        "config": {"n_images": args.n_images, **common,
                   "clip_len": args.clip_len},
        "cells": cells,
        "worst_best_cosine_delta": max(
            c["best_cosine_delta"] for c in cells.values()
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
