"""Host-side pipeline prefetch.

The batched runner's host work (JPEG decode + bicubic resize + normalize)
costs ~1-3 s per 128-image batch — comparable to an entire pruned-tier
generation on device. A one-ahead background thread overlaps batch i+1's
host pipeline with batch i's device generation; while the main thread
blocks on device results it holds no GIL, so the overlap is effective
even on a single-core host (this VM). The reference loads images inline
on the main thread (run.py:156-178).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_SENTINEL = object()


def prefetch_map(fn: Callable[[T], U], iterable: Iterable[T],
                 depth: int = 1, workers: int = 1) -> Iterator[U]:
    """``map(fn, iterable)`` computed ``depth`` items ahead on worker
    thread(s). Order-preserving; exceptions from ``fn`` (or the iterable)
    re-raise at the consuming site.

    ``workers > 1`` decodes that many items concurrently (a thread pool;
    PIL decode and numpy resize release the GIL) — the host-feed ceiling
    lever on multi-core hosts: the measured single-core pipeline feeds
    ~90 images/s (HOST_FEED.json), ~1 chip at the fast pruned tiers, so
    production v5e hosts (dozens of cores per 8 chips) need the pool to
    keep a mesh fed."""
    if workers > 1:
        return _pool_map(fn, iterable, depth, workers)
    return _thread_map(fn, iterable, depth)


def _thread_map(fn, iterable, depth):
    """The single-worker one-ahead form (the measured r3 pipeline)."""
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def put(entry) -> bool:
        # bounded put that gives up when the consumer abandoned the
        # generator — otherwise the worker blocks on the full queue
        # forever, leaking the thread plus a decoded image batch
        while not stop.is_set():
            try:
                q.put(entry, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put((True, fn(item))):
                    return
        except BaseException as e:  # propagate to the consumer
            put((False, e))
            return
        put((True, _SENTINEL))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            ok, item = q.get()
            if not ok:
                raise item
            if item is _SENTINEL:
                return
            yield item
    finally:
        # runs on exhaustion, consumer exception, or generator.close()
        stop.set()


def _pool_map(fn, iterable, depth, workers):
    """Ordered thread-pool map with bounded in-flight work
    (``workers + depth`` items); exceptions re-raise in order at the
    consuming site, and abandoning the generator cancels/drains the
    pool without leaking threads."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    def gen():
        with ThreadPoolExecutor(max_workers=workers) as ex:
            pending = collections.deque()
            it = iter(iterable)
            exhausted = False
            try:
                while True:
                    while not exhausted and len(pending) < workers + depth:
                        try:
                            item = next(it)
                        except StopIteration:
                            exhausted = True
                            break
                        pending.append(ex.submit(fn, item))
                    if not pending:
                        return
                    yield pending.popleft().result()
            finally:
                for f in pending:  # abandoned consumer: stop new work
                    f.cancel()

    return gen()
