#!/usr/bin/env python
"""TPU-mode smoke test: exercises the bf16 + fused-LayerNorm path that the
(CPU-forced) pytest suite cannot reach. Asserts determinism and output
sanity across orders and control modes on small shapes.

Run on a machine with the TPU available: python tools/tpu_smoke.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "smoke test needs the TPU"
    from conzic_tpu.runtime.cache import enable_persistent_cache

    enable_persistent_cache()  # shared helper: min-compile-time, env
    # override and unwritable-checkout fallback included (CLAUDE.md)

    from conzic_tpu.engine.sampler import Captioner

    cap = Captioner.from_random(dtype=jnp.bfloat16, init_mode="proper")
    cap.cfg.verbose = False
    cap.cfg.clip_len = 24
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(
        rng.randn(2, cap.clip_model.config.projection_dim).astype(np.float32)
    )
    failures = []
    for order, ctl in (("sequential", None), ("shuffle", None),
                       ("span", None), ("parallel", None),
                       ("sequential", "sentiment"), ("sequential", "pos")):
        t0 = time.time()
        outs = []
        for _ in range(2):
            r = cap.run(
                embeds, prompt="Image of a", max_len=5, top_k=8,
                temperature=0.1, max_iter=2, alpha=0.02, beta=2.0, gamma=5.0,
                order=order, ctl=ctl, rng=np.random.RandomState(42),
            )
            outs.append(r)
        det = outs[0].gen_texts_list == outs[1].gen_texts_list
        sane = all(
            t.startswith("image of a") for t in outs[0].gen_texts_list[-2]
        )
        cos_ok = bool(np.all(np.abs(outs[0].best_cos) <= 1.0 + 1e-3))
        status = "OK" if (det and sane and cos_ok) else "FAIL"
        if status == "FAIL":
            failures.append((order, ctl, det, sane, cos_ok))
        print(f"{order}/{ctl}: {status} "
              f"(det={det} sane={sane} cos_ok={cos_ok}, "
              f"{time.time() - t0:.1f}s incl compile)", flush=True)
    if failures:
        sys.exit(f"TPU smoke failures: {failures}")
    print("TPU smoke: all orders/controls deterministic and sane in bf16")


if __name__ == "__main__":
    main()
