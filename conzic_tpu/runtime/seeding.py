"""Determinism (reference /root/reference/utils.py:37-44).

JAX is functionally deterministic; the stateful randomness the reference
seeds (python/numpy/torch RNG + cudnn flags) reduces here to numpy-based
schedule generation, so one RandomState per run reproduces byte-identical
generation orders.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> np.random.RandomState:
    random.seed(seed)
    np.random.seed(seed)
    return np.random.RandomState(seed)
