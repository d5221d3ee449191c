"""Multi-host scale-out entry point (SURVEY.md §2.3/§5: the TPU-native
equivalent of a distributed comm backend is DCN multi-host batch
fan-out over a global device mesh).

The reference is strictly single-device (``/root/reference/demo.py:20-21``)
and the rebuild's Gibbs program is collective-free on the pure-DP mesh
(``__graft_entry__.dryrun_fullsize_collectives``), so multi-host is pure
SPMD bookkeeping — no NCCL/MPI translation:

  1. every process calls :func:`initialize` (``jax.distributed``; Gloo/
     DCN coordination — JAX inserts no cross-host collectives into the
     engine program itself),
  2. the mesh is built over GLOBAL devices (``parallel.mesh.make_mesh``
     uses ``jax.devices()``, which is global after initialize),
  3. each process feeds ITS contiguous slice of every global batch
     (:func:`local_slice` + ``Captioner.encode_images(..., local=True)``),
  4. host-replicated arrays (token ids, schedules, tables) enter via
     :func:`put_global`, per-process blocks via :func:`put_local_shard`,
     and results come back to every host via :func:`gather_to_host`.

Single-process behavior is the exact degenerate case: every helper
reduces to ``jax.device_put`` / ``np.asarray`` (test-pinned by the mesh
suite; the 2-process engine parity test lives in
tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """``jax.distributed.initialize`` wrapper. With no arguments JAX
    auto-detects cluster environments (TPU pods, SLURM, GKE); explicit
    values come from the CLI flags (``--coordinator_address`` etc.).
    Must run before any other JAX call (backend init pins the topology).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write artifacts/logs (the batch
    runner writes results once; every process holds the full outputs
    after :func:`gather_to_host`)."""
    return jax.process_index() == 0


def local_slice(n_global: int, pid: Optional[int] = None,
                cnt: Optional[int] = None) -> slice:
    """The contiguous block of a global batch this process feeds.

    Contiguous blocks (not striding) so the process->rows mapping matches
    ``jax.make_array_from_process_local_data``'s default layout for a
    1-D batch sharding over globally-ordered devices."""
    pid = jax.process_index() if pid is None else pid
    cnt = jax.process_count() if cnt is None else cnt
    if n_global % cnt:
        raise ValueError(
            f"global batch {n_global} does not divide over {cnt} "
            f"processes — pick a --batch_size that is a multiple of the "
            f"process count (drop_last batching keeps sizes uniform)")
    per = n_global // cnt
    return slice(pid * per, (pid + 1) * per)


def put_global(x, sharding):
    """Host-replicated array -> global device array under ``sharding``.

    Every process passes the SAME full array (token ids, schedules,
    params, tables — all deterministically recomputed per host);
    single-process this is exactly ``jax.device_put``."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # already a global array (e.g. run() re-sharding encode_images'
        # output): pass through, or let XLA reshard device-to-device —
        # np.asarray on a non-addressable array would raise
        if x.sharding == sharding:
            return x
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def put_local_shard(x_local, sharding, global_batch: int):
    """Per-process batch block -> global batch-sharded device array.

    ``x_local`` is THIS process's :func:`local_slice` rows of a global
    batch of ``global_batch`` rows (the per-process feeding path in
    ``api/run.py``); single-process it degenerates to ``device_put``."""
    x_local = np.asarray(x_local)
    if jax.process_count() == 1:
        if x_local.shape[0] != global_batch:
            raise ValueError(
                f"single-process put_local_shard got {x_local.shape[0]} "
                f"rows for a global batch of {global_batch}")
        return jax.device_put(x_local, sharding)
    global_shape = (global_batch,) + x_local.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, x_local, global_shape)


def gather_to_host(x) -> np.ndarray:
    """Global device array -> full numpy array on EVERY host (the
    result-decode path; single-process / fully-addressable arrays skip
    the allgather)."""
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def env_requested() -> bool:
    """True when a cluster environment requests auto-initialize
    (explicit opt-in via CONZIC_MULTIHOST=1 — auto-detection is left to
    jax.distributed.initialize itself once the CLI flag opts in)."""
    return os.environ.get("CONZIC_MULTIHOST") == "1"
