#!/usr/bin/env python
"""Join a jax.profiler device trace with the program's optimized HLO:
per-op durations attributed to HLO shapes + source ``op_name`` metadata.

The tensorboard profile plugin's protobuf bindings are broken in this
environment (see tools/profile_engine.py), and raw trace op names
(``fusion.4602``) are meaningless without the HLO. This tool maps every
device op to its output shape and JAX source operation, then aggregates.

Usage:
  python tools/trace_attrib.py --trace_dir DIR --hlo engine_hlo.txt [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace(trace_dir: str):
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(files)[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in names.get(e.get("pid", -1), ""):
            n = e.get("name", "")
            if n.startswith("jit_") or n.startswith("while") or "(" in n:
                continue
            dur[n] += e.get("dur", 0)
            cnt[n] += 1
    return dur, cnt


HLO_RE = re.compile(
    r"%(?P<name>[\w.\-]+) = (?P<shape>\S+) (?P<op>[\w\-]+)\("
)
META_RE = re.compile(r'op_name="(?P<op_name>[^"]*)"')


def load_hlo(path: str):
    """name -> (shape, op kind, op_name metadata)."""
    info = {}
    with open(path) as f:
        for line in f:
            m = HLO_RE.search(line)
            if not m:
                continue
            meta = META_RE.search(line)
            info[m.group("name")] = (
                m.group("shape"),
                m.group("op"),
                meta.group("op_name") if meta else "",
            )
    return info


def short_op_name(op_name: str) -> str:
    """Strip jit/while wrappers, keep the meaningful module path tail."""
    parts = [
        p
        for p in op_name.split("/")
        if p and not p.startswith("jit(") and p not in ("while", "body",
                                                        "closed_call", "cond")
    ]
    return "/".join(parts[-4:]) if parts else op_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", required=True)
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument(
        "--group", action="store_true",
        help="aggregate by source op_name instead of per-HLO-op",
    )
    args = ap.parse_args()

    dur, cnt = load_trace(args.trace_dir)
    info = load_hlo(args.hlo)
    total = sum(dur.values())
    print(f"device total: {total / 1e6:.3f}s over {sum(cnt.values())} op calls")

    if args.group:
        g = collections.Counter()
        for n, d in dur.items():
            shape, kind, op_name = info.get(n, ("?", "?", ""))
            g[short_op_name(op_name) or kind] += d
        for name, d in g.most_common(args.top):
            print(f"  {d/1e6:8.3f}s {100*d/total:5.1f}%  {name}")
        return

    matched = sum(d for n, d in dur.items() if n in info)
    print(f"matched to HLO: {matched/1e6:.3f}s ({100*matched/total:.1f}%)")
    for n, d in dur.most_common(args.top):
        shape, kind, op_name = info.get(n, ("?", "?", "<unmatched>"))
        per = d / cnt[n]
        print(
            f"  {d/1e6:7.3f}s {100*d/total:5.1f}% x{cnt[n]:6d} {per:8.1f}us "
            f" {n[:28]:28s} {shape[:40]:40s} {short_op_name(op_name)[:70]}"
        )


if __name__ == "__main__":
    main()
