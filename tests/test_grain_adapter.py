"""Grain loader backend: bit-identical to the numpy loader by shared
index plan (``epoch_index_plan``), plus the grain-only features
(in-worker transform, thread read-ahead)."""

import numpy as np
import pytest

from sfc_vit_tpu.data import (
    Dataset,
    epoch_batches,
    grain_epoch_batches,
    have_grain,
    synthetic_dataset,
)

pytestmark = pytest.mark.skipif(
    not have_grain(), reason="grain not installed"
)


def _collect(it):
    return [(np.asarray(x), np.asarray(y)) for x, y in it]


@pytest.mark.parametrize("shuffle,drop_last", [(True, True),
                                               (False, False)])
def test_bit_identical_to_numpy_loader(shuffle, drop_last):
    ds = synthetic_dataset(n=53, hw=8, seed=3)
    kw = dict(batch_size=8, seed=11, epoch=2, shuffle=shuffle,
              drop_last=drop_last)
    a = _collect(epoch_batches(ds, **kw))
    b = _collect(grain_epoch_batches(ds, **kw))
    assert len(a) == len(b) and len(a) > 0
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_multihost_eval_padding_matches():
    """The padded eval shard (label -1 on padding) survives the grain
    path exactly — both backends read the same epoch_index_plan."""
    ds = synthetic_dataset(n=29, hw=8, seed=0)
    for pi in range(3):
        kw = dict(batch_size=4, shuffle=False, drop_last=False,
                  process_index=pi, process_count=3)
        a = _collect(epoch_batches(ds, **kw))
        b = _collect(grain_epoch_batches(ds, **kw))
        assert len(a) == len(b)
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
    # padding actually present on the short shards
    last_labels = b[-1][1]
    assert (last_labels == -1).any()


def test_transform_runs_in_grain_and_order_holds():
    ds = synthetic_dataset(n=64, hw=8, seed=1)

    def tf(batch):
        x, y = batch
        return x.astype(np.float32) / 255.0, y

    got = _collect(grain_epoch_batches(
        ds, batch_size=8, seed=5, transform=tf, num_threads=4))
    want = [(x.astype(np.float32) / 255.0, y)
            for x, y in epoch_batches(ds, batch_size=8, seed=5)]
    assert len(got) == len(want) == 8
    for (xa, ya), (xb, yb) in zip(got, want):
        assert xa.dtype == np.float32
        np.testing.assert_allclose(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_epochs_reshuffle_and_are_deterministic():
    ds = synthetic_dataset(n=32, hw=8, seed=2)
    e0 = _collect(grain_epoch_batches(ds, batch_size=32, seed=9, epoch=0))
    e0b = _collect(grain_epoch_batches(ds, batch_size=32, seed=9, epoch=0))
    e1 = _collect(grain_epoch_batches(ds, batch_size=32, seed=9, epoch=1))
    np.testing.assert_array_equal(e0[0][1], e0b[0][1])
    assert not np.array_equal(e0[0][1], e1[0][1])


def test_source_len_and_bounds():
    from sfc_vit_tpu.data.grain_adapter import GrainBatchSource
    from sfc_vit_tpu.data import epoch_index_plan

    ds = synthetic_dataset(n=20, hw=8)
    order, pad_from, end = epoch_index_plan(20, 8, drop_last=False,
                                            shuffle=False)
    src = GrainBatchSource(ds, 8, order, pad_from, end)
    assert len(src) == 3  # 8 + 8 + 4
    assert src[2][0].shape[0] == 4
    with pytest.raises(IndexError):
        src[3]
