#!/usr/bin/env python
"""XLA compiler-option sweep on the headline engine program.

VERDICT r2 item 2a: the full-parity engine sits at ~58% of its exact-FLOP
ceiling with the residual in attention-neighborhood fusions; compiler-level
tuning was the untried cheap lever. This tool runs ``bench.py`` in a fresh
subprocess per option set (CONZIC_BENCH_XLA_OPTIONS -> ConzicConfig
.compiler_options -> jax.jit(compiler_options=...)) and merges results into
``XLA_FLAG_SWEEP.json`` as they land, so a partial sweep is still useful.

Serialize on the one TPU: never run this concurrently with other TPU work
(CLAUDE.md). Invalid option names fail the subprocess; the failure is
recorded and the sweep continues.

Usage: python tools/flag_sweep.py [--only name1,name2] [--batch 32]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "XLA_FLAG_SWEEP.json")

# Option sets to try. Targets, per the trace-attributed budget (ROADMAP):
# fusion sizing (scoped vmem), scheduling (latency hiding), dot/layout
# choices (strength reduction, dot-dot fusion), and the memory-bound-loop
# optimizer (the engine is a scan over positions).
CONFIGS = {
    "base": "",
    "vmem32": "xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem64": "xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96": "xla_tpu_scoped_vmem_limit_kib=98304",
    "lhs": "xla_tpu_enable_latency_hiding_scheduler=true",
    "mbl_off": "xla_tpu_memory_bound_loop_optimizer_options=enabled:false",
    "no_dsr": "xla_tpu_enable_dot_strength_reduction=false",
    "dot_dot": "xla_tpu_dot_dot_fusion=true",
    "licm2": "xla_tpu_licm_size_inflation_ratio=2.0",
    "fusion_cost": "xla_tpu_use_lp_fusion_metrics=true",
    "async_scale": "xla_tpu_async_copy_bandwidth_scaling_factor=2.0",
    "vmem64_lhs": (
        "xla_tpu_scoped_vmem_limit_kib=65536,"
        "xla_tpu_enable_latency_hiding_scheduler=true"
    ),
    # phase 2: combos / neighborhoods of the phase-1 winners
    # (vmem32 +2.6%, no_dsr +3.3%)
    "vmem32_no_dsr": (
        "xla_tpu_scoped_vmem_limit_kib=32768,"
        "xla_tpu_enable_dot_strength_reduction=false"
    ),
    "vmem24": "xla_tpu_scoped_vmem_limit_kib=24576",
    "vmem40": "xla_tpu_scoped_vmem_limit_kib=40960",
    "vmem24_no_dsr": (
        "xla_tpu_scoped_vmem_limit_kib=24576,"
        "xla_tpu_enable_dot_strength_reduction=false"
    ),
    "vmem40_no_dsr": (
        "xla_tpu_scoped_vmem_limit_kib=40960,"
        "xla_tpu_enable_dot_strength_reduction=false"
    ),
    # phase 3: stack the adopted winner with the only other
    # positive-leaning phase-1 option
    "winner_async": (
        "xla_tpu_scoped_vmem_limit_kib=32768,"
        "xla_tpu_enable_dot_strength_reduction=false,"
        "xla_tpu_async_copy_bandwidth_scaling_factor=2.0"
    ),
    # phase 4 (pruned tier): the adopted full-tier winner (= the config
    # default, named so the pruned operating point gets an explicit row)
    # and copy-oriented variants — the prune3/B=512 trace shows copies at
    # 13.4% of device time, a regime the B=32 full-tier sweep never saw.
    # "winner" is an ALIAS of vmem32_no_dsr (same option string); the
    # default no---only sweep dedupes by option value so the alias never
    # re-measures the same set.
    "winner": (
        "xla_tpu_scoped_vmem_limit_kib=32768,"
        "xla_tpu_enable_dot_strength_reduction=false"
    ),
    "winner_lhs": (
        "xla_tpu_scoped_vmem_limit_kib=32768,"
        "xla_tpu_enable_dot_strength_reduction=false,"
        "xla_tpu_enable_latency_hiding_scheduler=true"
    ),
    "vmem64_no_dsr": (
        "xla_tpu_scoped_vmem_limit_kib=65536,"
        "xla_tpu_enable_dot_strength_reduction=false"
    ),
}


def load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"configs": {}, "batch": None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--rerun", action="store_true",
                    help="re-measure configs already in the output file")
    # pruned-tier operating point: sweep the same option sets on the
    # quality-bounded tier (results keyed with an @prune… suffix so the
    # full-tier rows are untouched)
    ap.add_argument("--prune", type=int, default=0)
    ap.add_argument("--topk_mode", choices=["exact", "approx"],
                    default="exact")
    ap.add_argument("--recall", type=float, default=0.95)
    args = ap.parse_args()

    suffix = ""
    if args.prune:
        suffix = f"@prune{args.prune}"
        if args.topk_mode == "approx":
            suffix += f"+approx{args.recall:g}"
        suffix += f"b{args.batch}"

    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    else:
        # dedupe aliases (identical option strings) so a full sweep
        # measures each option set once; first-named entry wins
        seen_opts = set()
        names = [n for n in CONFIGS
                 if not (CONFIGS[n] in seen_opts or seen_opts.add(CONFIGS[n]))]
    results = load()
    # legacy entries lack a per-entry "batch" key; their operating point is
    # the FILE-level batch at the time — capture it before overwriting, or
    # the cache check would treat them as measured at args.batch
    legacy_batch = results.get("batch")
    results["batch"] = args.batch

    for name in names:
        if name not in CONFIGS:
            print(f"unknown config {name!r}; have {sorted(CONFIGS)}")
            continue
        key = name + suffix
        cached = results["configs"].get(key)
        if not args.rerun and cached and \
                cached.get("caps_per_s") is not None and \
                cached.get("batch", legacy_batch) == args.batch:
            # a cached number measured at a DIFFERENT batch is a
            # different operating point: re-measure instead of reusing
            print(f"[{key}] cached: {cached}")
            continue
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/.axon_site:" + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "axon"
        env["CONZIC_BENCH_SKIP_TORCH"] = "1"
        env["CONZIC_BENCH_BATCH"] = str(args.batch)
        env["CONZIC_BENCH_XLA_OPTIONS"] = CONFIGS[name]
        if args.prune:
            env["CONZIC_BENCH_PRUNE"] = str(args.prune)
            env["CONZIC_BENCH_TOPK_MODE"] = args.topk_mode
            env["CONZIC_BENCH_TOPK_RECALL"] = str(args.recall)
        t0 = time.time()
        print(f"[{key}] options={CONFIGS[name]!r} ...", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True,
                timeout=args.timeout, cwd=REPO,
            )
            line = [
                ln for ln in p.stdout.strip().splitlines()
                if ln.startswith("{")
            ]
            if p.returncode == 0 and line:
                val = json.loads(line[-1])["value"]
                results["configs"][key] = {
                    "options": CONFIGS[name],
                    "caps_per_s": val,
                    "batch": args.batch,
                    "wall_s": round(time.time() - t0, 1),
                }
                print(f"[{key}] {val} caps/s "
                      f"({time.time() - t0:.0f}s)", flush=True)
            else:
                tail = (p.stderr or p.stdout or "")[-400:]
                results["configs"][key] = {
                    "options": CONFIGS[name],
                    "caps_per_s": None,
                    "error": tail,
                }
                print(f"[{key}] FAILED rc={p.returncode}: {tail[-200:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            results["configs"][key] = {
                "options": CONFIGS[name],
                "caps_per_s": None,
                "error": f"timeout {args.timeout}s",
            }
            print(f"[{key}] TIMEOUT", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    best = max(
        (c for c in results["configs"].values() if c.get("caps_per_s")),
        key=lambda c: c["caps_per_s"],
        default=None,
    )
    print("best:", best)


if __name__ == "__main__":
    main()
