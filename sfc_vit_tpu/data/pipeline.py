"""Host -> device input pipeline with background prefetch.

The reference leans on 16 DataLoader worker processes plus a blocking
H2D copy every step (``main.py:227-230``, ``train.py:144-145``).  Here a
single background thread stages the next batches onto the device (with
the batch sharding when a mesh is given) while the current step runs --
the JAX-idiomatic double-buffering that keeps the TPU fed.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax

from ..parallel.mesh import batch_sharding

__all__ = ["prefetch_to_device"]

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable,
    size: int = 2,
    mesh=None,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Yield device-resident batches, staged ``size`` ahead on a thread.

    Args:
        batches: iterable of host batches (numpy tuples).
        size: prefetch depth (2 = classic double buffering).
        mesh: optional mesh; the leading axis is sharded over "data".
        transform: optional host-side fn applied before the device put.
    """
    sharding = batch_sharding(mesh) if mesh is not None else None
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        if sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), batch
            )
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        return batch

    def worker():
        try:
            for b in batches:
                q.put(put(b))
        except Exception as e:  # surface pipeline errors to the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
