"""Grain-backed input pipeline (optional loader backend).

The portable default (:func:`..datasets.epoch_batches` + the
``prefetch_to_device`` thread) has no external dependency; when
``grain`` is installed this adapter provides the same epoch stream
through Google's production input-pipeline machinery instead —
``grain.MapDataset`` over a random-access batch source, with thread
read-ahead (``ReadOptions``) and optional multi-process workers
(``mp_prefetch``), the TPU-native equivalent of the reference's
16-worker torch ``DataLoader`` (``main.py:227-230``).

Determinism is shared, not reimplemented: the permutation, multi-host
strided shard, remainder truncation, and eval label padding all come
from :func:`..datasets.epoch_index_plan` — the SAME code path the
numpy loader uses — so the two backends yield bit-identical batch
streams for any (seed, epoch, sharding) and can never drift
(``tests/test_grain_adapter.py`` pins this).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from .datasets import Dataset, batch_at, epoch_index_plan

__all__ = ["have_grain", "grain_epoch_batches", "GrainBatchSource"]


def have_grain() -> bool:
    """True when the optional ``grain`` dependency is importable."""
    try:
        import grain  # noqa: F401

        return True
    except ImportError:
        return False


class GrainBatchSource:
    """Random-access source of whole batches for one epoch.

    grain's unit of work is the *record*; serving batch-sized records
    keeps the per-record overhead off the hot path and lets the numpy
    fancy-index slice (which releases the GIL) parallelize across
    grain's read threads.
    """

    def __init__(self, ds: Dataset, batch_size: int, order: np.ndarray,
                 pad_from: Optional[int], end: int):
        self._ds = ds
        self._bs = batch_size
        self._order = order
        self._pad_from = pad_from
        self._end = end
        self._len = -(-end // batch_size) if end else 0

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        if not 0 <= i < self._len:
            raise IndexError(i)
        return batch_at(self._ds, self._order, self._pad_from, self._bs,
                        i * self._bs, self._end)


def grain_epoch_batches(
    ds: Dataset,
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    transform: Optional[Callable] = None,
    num_threads: int = 4,
    prefetch: int = 8,
    num_workers: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """:func:`..datasets.epoch_batches` semantics on the grain engine.

    Args beyond the shared loader signature:
        transform: host-side fn applied to each (images, labels) batch
            inside grain's worker pool (CPU-bound decode/augment work).
        num_threads: grain read threads (in-process; numpy slicing and
            most transforms release the GIL).
        prefetch: read-ahead depth in batches.
        num_workers: >0 adds ``mp_prefetch`` worker *processes* (heavy:
            the in-memory dataset is sent to each worker; only worth it
            for expensive transforms on large hosts).
    """
    import grain

    order, pad_from, end = epoch_index_plan(
        len(ds), batch_size, seed=seed, epoch=epoch, shuffle=shuffle,
        drop_last=drop_last, process_index=process_index,
        process_count=process_count,
    )
    src = GrainBatchSource(ds, batch_size, order, pad_from, end)
    mds = grain.MapDataset.source(src)
    if transform is not None:
        mds = mds.map(transform)
    ids = mds.to_iter_dataset(
        grain.ReadOptions(num_threads=max(1, num_threads),
                          prefetch_buffer_size=max(1, prefetch))
    )
    if num_workers > 0:
        ids = ids.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers)
        )
    return iter(ids)
