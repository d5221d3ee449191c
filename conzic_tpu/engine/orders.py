"""Generation-order schedules as data.

The reference implements five orders as five near-duplicate Python loops
(``/root/reference/gen_utils.py:51-287``). Here an order is a precomputed
position schedule; one compiled sweep kernel consumes any of them:

  - ``single`` kind: (num_iterations, steps) position array, one fresh BERT
    forward per position — covers sequential (arange), shuffle (one seeded
    permutation reused every iteration, gen_utils.py:110-111), random
    (max_len uniform draws per iteration, gen_utils.py:209-210 with
    ``max_iter *= max_len`` and ``print_every = max_len``,
    gen_utils.py:308-310).
  - ``span`` kind: (num_iterations, n_spans) span-start array; the whole
    span is masked and polished from ONE stale BERT forward
    (gen_utils.py:162-169 — quirk preserved).
  - ``parallel`` kind: every position updated from one unmasked forward
    (gen_utils.py:256-273). The reference's parallel loop is unreachable
    from its CLIs and carries an out-of-range index bug (``ii + seed_len``
    with the iteration counter, gen_utils.py:265); we implement the evident
    intent (``kk + seed_len``) — divergence documented in PARITY.md.
"""

from __future__ import annotations

import dataclasses

import numpy as np

SPAN_LEN = 2  # gen_utils.py:153


@dataclasses.dataclass
class Schedule:
    kind: str  # "single" | "span" | "parallel"
    # single: (iters, steps) positions; span: (iters, n_spans) starts;
    # parallel: (iters, 1) dummy
    positions: np.ndarray
    # span only: (n_spans,) number of valid slots in each span
    span_sizes: np.ndarray | None = None


def build_schedule(
    order: str,
    sentence_len: int,
    num_iterations: int,
    rng: np.random.RandomState,
) -> Schedule:
    L, I = sentence_len, num_iterations
    if order == "sequential":
        pos = np.tile(np.arange(L, dtype=np.int32), (I, 1))
        return Schedule("single", pos)
    if order == "shuffle":
        perm = np.arange(L, dtype=np.int32)
        rng.shuffle(perm)  # one permutation, reused every iteration
        return Schedule("single", np.tile(perm, (I, 1)))
    if order == "random":
        pos = rng.randint(0, L, size=(I, L)).astype(np.int32)
        return Schedule("single", pos)
    if order == "span":
        starts = np.arange(0, L, SPAN_LEN, dtype=np.int32)
        sizes = np.minimum(L - starts, SPAN_LEN).astype(np.int32)
        return Schedule("span", np.tile(starts, (I, 1)), np.tile(sizes, (I, 1)))
    if order == "parallel":
        return Schedule("parallel", np.zeros((I, 1), np.int32))
    raise ValueError(f"unknown order {order!r}")
