#!/usr/bin/env python
"""Checkpoint-day runbook: ONE command -> the full quality dossier.

The north-star quality claim ("CLIPScore within 1% of the PyTorch
reference", BASELINE.json) cannot be evaluated in the build environment
(zero egress, no real checkpoints). The moment local checkpoint
directories exist, this script runs every blocked validation in sequence
and writes a single dossier JSON (VERDICT r2 item 7):

  1. golden-activation parity vs HF torch (tools/make_goldens.py),
  2. the real-weight pruning/hybrid quality matrix
     (tools/validate_pruning.py --matrix -> PRUNING_MATRIX_REAL.json),
  3. the int8 tier quality check (tools/validate_quant.py),
  4. a real-caption demo run over the shipped example images,
  5. (optional, --images) the SketchyCOCOcaption pipeline
     (tools/sketchycoco_bench.py),
  6. the headline throughput bench (bench.py — speed is weight-independent
     but the dossier records it alongside the quality numbers).

Smoke mode (--random_models, what the build environment CAN run) drives
the same steps with random-weight stand-ins on tiny iteration counts to
keep the runbook itself verified.

Usage:
  python tools/checkpoint_runbook.py \
      --lm_model /ckpts/bert-base-uncased \
      --match_model /ckpts/clip-vit-base-patch32 \
      [--images /data/sketchycoco/images] [--out DOSSIER.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_step(name, cmd, results, timeout=7200, env=None):
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO,
            env=env,
        )
        results[name] = {
            "rc": p.returncode,
            "wall_s": round(time.time() - t0, 1),
            "tail": (p.stdout + p.stderr)[-2000:],
        }
        status = "ok" if p.returncode == 0 else f"FAILED rc={p.returncode}"
        print(f"=== {name}: {status} ({results[name]['wall_s']}s)",
              flush=True)
    except subprocess.TimeoutExpired:
        results[name] = {"rc": None, "error": f"timeout {timeout}s"}
        print(f"=== {name}: TIMEOUT", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lm_model", default="bert-base-uncased")
    p.add_argument("--match_model", default="openai/clip-vit-base-patch32")
    p.add_argument("--random_models", action="store_true",
                   help="smoke mode: random-weight stand-ins, tiny configs "
                        "(what the zero-egress build environment can run)")
    p.add_argument("--images", default=None,
                   help="SketchyCOCOcaption image dir (step 5; skipped "
                        "when absent)")
    p.add_argument("--out", default=os.path.join(REPO, "DOSSIER.json"))
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend for every step")
    args = p.parse_args()

    if not args.random_models:
        for path in (args.lm_model, args.match_model):
            if not os.path.isdir(path):
                sys.exit(
                    f"checkpoint dir not found: {path!r} — pass local HF "
                    "checkpoint dirs, or --random_models for the smoke run"
                )

    py = sys.executable
    models = ["--lm_model", args.lm_model, "--match_model", args.match_model]
    cpu = ["--cpu"] if args.cpu else []
    smoke = args.random_models
    results = {"mode": "smoke-random" if smoke else "real-checkpoints",
               "steps": {}}
    steps = results["steps"]

    # 1. conversion / activation parity (torch required; real ckpts only —
    #    random stand-ins have nothing to compare against)
    if not smoke:
        run_step("goldens", [py, "tools/make_goldens.py", *models,
                             "--image", "examples/girl.jpg",
                             "--out", os.path.join(REPO, "goldens.npz")],
                 steps)

    # 2. pruning + hybrid quality matrix on these weights
    # smoke mode must NOT overwrite the committed full-size quality matrix
    matrix_out = os.path.join(
        REPO,
        "PRUNING_MATRIX_SMOKE.json" if smoke else "PRUNING_MATRIX_REAL.json",
    )
    cmd = [py, "tools/validate_pruning.py", "--matrix", "--out", matrix_out,
           *cpu]
    # smoke: --prune_k 4 keeps the order/ctl rows genuinely pruned at
    # k=16 (the default 40 >= 16 would silently disable pruning and
    # record vacuously-perfect cells)
    cmd += (["--random_models", "tiny", "--iters", "2", "--n_images", "2",
             "--sentence_len", "5", "--k", "16", "--prune_k", "4"]
            if smoke else [*models])
    run_step("pruning_matrix", cmd, steps)

    # 2b. the factorized speed tier on these weights (the r4 flagship):
    # auto-selects the stage-1 depth at the calibration pass band and
    # prints the held-out cosine + full-vs-factorized quality deltas —
    # checkpoint day's answer to "what depth does the REAL tower need,
    # and does fact<pct>pc24 hold its gate there?"
    cmd = [py, "tools/validate_pruning.py", "--prune_stage1", "factorized",
           "--topk_mode", "approx", "--topk_recall", "0.90", *cpu]
    cmd += (["--random_models", "tiny", "--iters", "2", "--n_images", "2",
             "--sentence_len", "5", "--k", "16", "--prune_k", "4",
             "--stage1_layers", "1", "--stage1_precut", "8"]
            if smoke else
            ["--prune_k", "3", "--stage1_layers", "0",
             "--stage1_precut", "24", *models])
    run_step("factorized_tier", cmd, steps)

    # 3. int8 tier quality (both tiers: CLIP-scoring-only and +BERT)
    for tier in ("int8", "int8_all"):
        cmd = [py, "tools/validate_quant.py", "--quant", tier, *cpu]
        cmd += (["--random_models", "tiny", "--iters", "2", "--n_images",
                 "2", "--sentence_len", "5", "--k", "16"]
                if smoke else [*models])
        run_step(f"quant_quality_{tier}", cmd, steps)

    # 4. demo captions over the shipped examples (human-checkable output)
    demo_cmd = [py, "-m", "conzic_tpu.api.demo", "--run_type", "caption",
                "--caption_img_path", "examples/girl.jpg",
                "--samples_num", "1"]
    if args.cpu:
        demo_cmd += ["--device", "cpu"]
    demo_cmd += (["--random_models", "tiny", "--sentence_len", "5",
                  "--candidate_k", "16", "--num_iterations", "2"]
                 if smoke else [*models])
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if args.cpu:
        env["JAX_PLATFORMS"] = "cpu"
    run_step("demo_examples", demo_cmd, steps, env=env)

    # 5. SketchyCOCOcaption pipeline (needs the dataset)
    if args.images:
        cmd = [py, "tools/sketchycoco_bench.py", "--images", args.images,
               *cpu]
        cmd += (["--random_models", "--iters", "2", "--k", "16",
                 "--sentence_len", "5", "--samples", "1"]
                if smoke else [*models])
        run_step("sketchycoco", cmd, steps)
    else:
        steps["sketchycoco"] = {"skipped": "no --images dir provided"}

    # 6. headline throughput (weight-independent; recorded for the dossier)
    env = dict(os.environ)
    env["CONZIC_BENCH_SKIP_TORCH"] = "1"
    if args.cpu:
        env["CONZIC_BENCH_CPU"] = "1"  # env var alone is plugin-overridden
    if smoke:
        env["CONZIC_BENCH_BATCH"] = "2"
        env["CONZIC_BENCH_ITERS"] = "2"
        env["CONZIC_BENCH_K"] = "16"
        env["CONZIC_BENCH_SMALL_MODELS"] = "1"
    run_step("bench", [py, "bench.py"], steps, env=env)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    # a step failed unless it exited 0 or was explicitly skipped —
    # timeouts record rc=None and MUST count as failures
    failed = [n for n, r in steps.items()
              if isinstance(r, dict) and "skipped" not in r
              and r.get("rc") != 0]
    print(f"dossier written to {args.out}; "
          f"{'ALL STEPS OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
