"""Host -> device input pipeline with background prefetch.

The reference leans on 16 DataLoader worker processes plus a blocking
H2D copy every step (``main.py:227-230``, ``train.py:144-145``).  Here:

* a background thread stages the next batches onto the device (with
  the batch sharding when a mesh is given) while the current step runs
  -- the JAX-idiomatic double-buffering that keeps the TPU fed;
* ``workers > 1`` additionally runs the host-side ``transform`` on a
  bounded, order-preserving thread pool (the 16-worker DataLoader
  equivalent for CPU-bound transforms; numpy releases the GIL for the
  slicing/augment work that dominates).  Memory stays bounded at
  ``size + workers`` in-flight batches.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional

import jax

from ..parallel.mesh import batch_sharding

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def _bounded_ordered_map(fn: Callable, it: Iterable, pool, ahead: int):
    """``map(fn, it)`` on a pool, yielding IN ORDER with at most
    ``ahead`` batches in flight (Executor.map would drain the whole
    iterable eagerly)."""
    futs: deque = deque()
    src = iter(it)

    def refill():
        nonlocal src
        while src is not None and len(futs) < ahead:
            try:
                futs.append(pool.submit(fn, next(src)))
            except StopIteration:
                src = None

    refill()
    while futs:
        f = futs.popleft()
        refill()
        yield f.result()


def prefetch_to_device(
    batches: Iterable,
    size: int = 2,
    mesh=None,
    transform: Optional[Callable] = None,
    workers: int = 1,
) -> Iterator:
    """Yield device-resident batches, staged ``size`` ahead on a thread.

    Args:
        batches: iterable of host batches (numpy tuples).
        size: prefetch depth (2 = classic double buffering).
        mesh: optional mesh; the leading axis is sharded over "data".
        transform: optional host-side fn applied before the device put.
        workers: thread-pool width for ``transform`` (order-preserving;
            1 = transform inline on the stager thread, the round-2
            behavior).
    """
    sharding = batch_sharding(mesh) if mesh is not None else None

    def stage(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []
    stop = threading.Event()  # consumer gone (break / exception / close)

    def _put(item) -> bool:
        """Blocking put that gives up once the consumer has gone away
        (otherwise an early ``break`` out of the epoch loop would leave
        the stager thread pinned on a full queue forever, leaking the
        thread plus ``size`` staged device batches per abandoned epoch)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        pool = None
        try:
            if workers > 1 and transform is not None:
                pool = ThreadPoolExecutor(workers)
                stream: Iterable = _bounded_ordered_map(
                    transform, batches, pool, size + workers
                )
            elif transform is not None:
                stream = (transform(b) for b in batches)
            else:
                stream = batches
            for b in stream:
                if stop.is_set() or not _put(stage(b)):
                    return
        except Exception as e:  # surface pipeline errors to the consumer
            err.append(e)
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:  # unblock a put in flight so the thread exits promptly
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
