#!/usr/bin/env python
"""Isolated MXU-rate microbench: contraction width vs achievable TFLOPS.

Purpose (VERDICT r2 item 2 writeup): the engine's attention neighborhood
runs at ~34-54% MXU while its MLPs run at ~98%. The hypothesis this bench
pins down is STRUCTURAL, not a missed optimization: per-head attention
contracts over head_dim D=64 (logits) or S<=24 (AV), i.e. less than the
128-lane MXU width, so any per-head formulation — XLA fusion or a
hand-written Mosaic/Pallas kernel — wastes the padded lanes. The MLP
contracts over E=512/2048 and fills the array.

Method per CLAUDE.md: a data-dependent `lax.fori_loop` chain inside ONE
jit (the axon backend dedupes repeated identical dispatches; naive
dispatch loops report impossible rates). v5e bf16 peak ≈ 197 TFLOPS.

Usage: python tools/lane_microbench.py  (TPU; serialize with other runs)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_matmul(M, K, N, iters=50):
    import jax
    import jax.numpy as jnp

    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)

    def body(i, carry):
        x, acc = carry
        y = jax.lax.dot(x, b, precision=None,
                        preferred_element_type=jnp.float32)
        # fold the result back into the lhs so iterations are
        # data-dependent (no dedupe/pipelining shortcuts)
        x = (y[:, :K] * 1e-6).astype(jnp.bfloat16) + a
        return x, acc + y[0, 0]

    @jax.jit
    def run(a):
        x, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
        return acc

    run(a).block_until_ready()  # compile
    t0 = time.time()
    run(a).block_until_ready()
    dt = time.time() - t0
    flops = 2 * M * K * N * iters
    return flops / dt / 1e12


def main():
    # Part 1: contraction width K at fixed (M, N) — the lane-filling
    # effect in isolation. The attention logits/AV contractions live at
    # K=64 (head_dim) and K<=24 (keys); the MLPs at K=512/2048.
    M, N = 25600, 2048
    print(f"fixed M={M}, N={N}; sweep contraction width K:")
    print(f"{'K':>6s} {'TFLOPS':>8s} {'%peak':>6s}")
    for K in (24, 64, 128, 256, 512):
        tflops = bench_matmul(M, K, N)
        print(f"{K:6d} {tflops:8.1f} {100 * tflops / 197:5.1f}%")
    # Part 2: the engine's actual attention shapes (tiny N — the key axis
    # is the padded key count), dominated by issue overhead at any K.
    print("engine attention shapes (per-head batched matmuls):")
    shapes = [
        ("logits: (rows*S) x D=64 x 128-padded keys", 1600 * 16, 64, 128),
        ("same at K=128 (full lanes)", 1600 * 16, 128, 128),
        ("AV: K=24 keys, N=D=64", 1600 * 16, 24, 64),
    ]
    print(f"{'shape':46s} {'TFLOPS':>8s} {'%peak':>6s}")
    for label, M, K, N in shapes:
        tflops = bench_matmul(M, K, N)
        print(f"{label:46s} {tflops:8.1f} {100 * tflops / 197:5.1f}%")


if __name__ == "__main__":
    main()
