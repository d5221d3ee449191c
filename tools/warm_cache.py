#!/usr/bin/env python
"""Pre-compile common engine configurations into the persistent XLA cache.

Cold compiles on the axon remote compiler run 2-6 minutes per shape; this
warms the cache for the default demo/run/bench configs so first real runs
start in seconds. Run it once per checkout (or after engine changes).

Usage: python tools/warm_cache.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="only the benchmark config")
    args = p.parse_args()

    import numpy as np

    import jax.numpy as jnp

    from bench import build_captioner

    cap = build_captioner()
    cap.cfg.verbose = False
    cap.cfg.clip_len = 24
    D = cap.clip_model.config.projection_dim

    configs = [
        # (order, B, k, iters, max_len, ctl)
        ("sequential", 32, 200, 15, 10, None),  # bench headline
    ]
    if not args.quick:
        # demo default: shuffle, samples_num=2 FUSED -> a B=2 program
        # (api/demo.py fuse_samples; the same compiled shape also covers
        # run.py's default batch_size=2 shuffle run); B=1 would warm a
        # shape no default CLI compiles
        configs += [
            ("shuffle", 2, 200, 10, 10, None),       # demo/run default
            ("shuffle", 2, 200, 10, 10, "sentiment"),  # demo default ctl
        ]
    for order, B, k, iters, L, ctl in configs:
        emb = jnp.asarray(np.zeros((B, D), np.float32))
        t0 = time.time()
        cap.run(emb, prompt="Image of a", max_len=L, top_k=k,
                temperature=0.1, max_iter=iters, alpha=0.02, beta=2.0,
                gamma=5.0, order=order, ctl=ctl,
                rng=np.random.RandomState(0))
        print(f"warmed {order} B={B} k={k} iters={iters} ctl={ctl}: "
              f"{time.time() - t0:.0f}s", flush=True)
    if not args.quick:
        # speed-tier + long-context operating points (BASELINE.md r3;
        # (prune_k, final_exact, B, topk_mode, recall) — the published
        # ladder: prune3+approx0.9 fastest under-gate, prune3 hybrid,
        # plus the exact-stage-1 prune5 pair)
        tiers = [
            (5, False, 128, "exact", 0.95),
            (5, True, 128, "exact", 0.95),
            (3, False, 256, "approx", 0.90),
            (3, True, 256, "approx", 0.90),
        ]
        for pk, fe, B, mode, recall in tiers:
            emb = jnp.asarray(np.zeros((B, D), np.float32))
            cap.cfg.topk_mode = mode
            cap.cfg.topk_recall = recall
            t0 = time.time()
            cap.run(emb, prompt="Image of a", max_len=10, top_k=200,
                    temperature=0.1, max_iter=15, alpha=0.02, beta=2.0,
                    order="sequential", prune_k=pk, prune_final_exact=fe,
                    rng=np.random.RandomState(0))
            print(f"warmed prune{pk}{'+final_exact' if fe else ''}"
                  f"{'+approx' + str(recall) if mode == 'approx' else ''}"
                  f" B={B}: {time.time() - t0:.0f}s", flush=True)
        cap.cfg.topk_mode = "exact"
        cap.cfg.clip_len = 77  # auto-pads to 80 (clip_pad_to=-1)
        emb = jnp.asarray(np.zeros((8, D), np.float32))
        t0 = time.time()
        cap.run(emb, prompt="Image of a", max_len=10, top_k=200,
                temperature=0.1, max_iter=15, alpha=0.02, beta=2.0,
                order="sequential", rng=np.random.RandomState(0))
        print(f"warmed clip_len=77/pad80 B=8: {time.time() - t0:.0f}s",
              flush=True)
        cap.cfg.clip_len = 24


if __name__ == "__main__":
    main()
