#!/usr/bin/env python
"""Capture + summarize a device trace of the Gibbs engine.

Runs the headline config once (warm), traces a second run with
``jax.profiler``, then aggregates device-op durations straight from the
trace JSON (the tensorboard profile plugin's protobuf bindings are broken
in this environment, so we parse ``*.trace.json.gz`` directly).

Usage:
  python tools/profile_engine.py --batch 8 --clip_len 24 [--prune_k 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time


def summarize(trace_dir: str, top: int = 20) -> None:
    files = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not files:
        sys.exit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(files)[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dur = collections.Counter()
    cnt = collections.Counter()
    kinds = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in names.get(e.get("pid", -1), ""):
            n = e.get("name", "")
            if n.startswith("jit_") or n.startswith("while") or "(" in n:
                continue
            dur[n] += e.get("dur", 0)
            cnt[n] += 1
            kinds[re.sub(r"\.\d+$", "", n)] += e.get("dur", 0)
    total = sum(dur.values())
    print(f"device total: {total / 1e6:.2f}s")
    print("--- by op kind:")
    for n, d in kinds.most_common(top):
        print(f"  {d / 1e6:7.3f}s {100 * d / total:5.1f}%  {n}")
    print("--- top individual fusions:")
    for n, d in dur.most_common(top):
        print(f"  {d / 1e6:7.3f}s x{cnt[n]:6d} {d / cnt[n]:8.1f}us/call  {n[:60]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--clip_len", type=int, default=24)
    p.add_argument("--sentence_len", type=int, default=10)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--prune_k", type=int, default=None)
    p.add_argument("--topk_mode", choices=["exact", "approx"], default="exact",
                   help="stage-1 candidate top-k (approx requires --prune_k)")
    p.add_argument("--topk_recall", type=float, default=0.95)
    p.add_argument("--prune_stage1", choices=["proxy", "factorized"],
                   default="proxy")
    p.add_argument("--stage1_layers", type=int, default=2)
    p.add_argument("--stage1_precut", type=int, default=0)
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--dump_hlo", default=None,
                   help="write the engine program's optimized HLO text here "
                        "(input for tools/trace_attrib.py --hlo); relies on "
                        "the persistent compile cache to avoid a recompile")
    p.add_argument("--summarize_only", default=None,
                   help="skip running; summarize an existing trace dir")
    args = p.parse_args()

    if args.summarize_only:
        summarize(args.summarize_only)
        return

    import numpy as np

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_captioner

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="conzic_trace_")
    cap = build_captioner()
    cap.cfg.verbose = False
    cap.cfg.clip_len = args.clip_len
    if args.prune_k:  # the sampler refuses approx without prune_k
        cap.cfg.topk_mode = args.topk_mode
        cap.cfg.topk_recall = args.topk_recall
        cap.cfg.prune_stage1 = args.prune_stage1
        cap.cfg.prune_stage1_layers = args.stage1_layers
        cap.cfg.prune_stage1_precut = args.stage1_precut
    image_embeds = jnp.asarray(
        np.random.RandomState(0)
        .randn(args.batch, cap.clip_model.config.projection_dim)
        .astype(np.float32)
    )

    captured = {}
    if args.dump_hlo:
        # intercept the engine's jitted call so the SAME (fn, args) pair
        # can be lowered to optimized-HLO text after the run
        orig_compiled = cap._compiled

        def capturing_compiled(spec):
            fn = orig_compiled(spec)

            def call(*a, **k):
                captured["fn"], captured["a"], captured["k"] = fn, a, k
                return fn(*a, **k)

            return call

        cap._compiled = capturing_compiled

    def run():
        return cap.run(
            image_embeds, prompt="Image of a", max_len=args.sentence_len,
            top_k=args.k, temperature=0.1, max_iter=args.iters,
            alpha=0.02, beta=2.0, order="sequential",
            rng=np.random.RandomState(42), prune_k=args.prune_k,
        )

    t0 = time.time()
    run()
    print(f"warm (compile) {time.time() - t0:.1f}s", flush=True)
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    run()
    jax.profiler.stop_trace()
    print(f"traced run {time.time() - t0:.2f}s -> {trace_dir}")
    if args.dump_hlo and captured:
        t0 = time.time()
        txt = (
            captured["fn"]
            .lower(*captured["a"], **captured["k"])
            .compile()
            .as_text()
        )
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"optimized HLO ({len(txt)} bytes) -> {args.dump_hlo} "
              f"in {time.time() - t0:.1f}s")
    summarize(trace_dir)


if __name__ == "__main__":
    main()
