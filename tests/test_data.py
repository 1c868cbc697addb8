"""Data pipeline tests: datasets, batching, on-device augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfc_vit_tpu.data import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    epoch_batches,
    filter_by_class,
    make_eval_transform,
    make_train_augment,
    normalize,
    synthetic_dataset,
)


def test_synthetic_dataset_deterministic():
    a = synthetic_dataset(n=32, seed=3)
    b = synthetic_dataset(n=32, seed=3)
    np.testing.assert_array_equal(a.images, b.images)
    assert a.images.shape == (32, 32, 32, 3) and a.images.dtype == np.uint8


def test_epoch_batches_shuffles_per_epoch():
    ds = synthetic_dataset(n=64)
    b0 = [y for _, y in epoch_batches(ds, 16, seed=1, epoch=0)]
    b1 = [y for _, y in epoch_batches(ds, 16, seed=1, epoch=1)]
    b0_again = [y for _, y in epoch_batches(ds, 16, seed=1, epoch=0)]
    assert not all((x == y).all() for x, y in zip(b0, b1))
    assert all((x == y).all() for x, y in zip(b0, b0_again))


def test_filter_by_class_relabels():
    ds = synthetic_dataset(n=128, num_classes=10)
    sub = filter_by_class(ds, [3, 7])
    assert sub.num_classes == 2
    assert set(np.unique(sub.labels)) <= {0, 1}
    assert len(sub) == int(np.isin(ds.labels, [3, 7]).sum())


def test_eval_transform_normalizes():
    tf = make_eval_transform(CIFAR10_MEAN, CIFAR10_STD)
    imgs = np.full((2, 32, 32, 3), 128, np.uint8)
    out = np.asarray(tf(imgs))
    want = (128 / 255.0 - np.asarray(CIFAR10_MEAN)) / np.asarray(CIFAR10_STD)
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_train_augment_shapes_and_determinism():
    aug = make_train_augment(32, CIFAR10_MEAN, CIFAR10_STD)
    imgs = synthetic_dataset(n=8).images
    k = jax.random.key(0)
    a = np.asarray(aug(k, imgs))
    b = np.asarray(aug(k, imgs))
    c = np.asarray(aug(jax.random.key(1), imgs))
    assert a.shape == (8, 32, 32, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)  # same key -> same augmentation
    assert not np.allclose(a, c)  # different key -> different
    assert np.isfinite(a).all()


def test_train_augment_resizes():
    # 64x64 input cropped+resized to 32
    aug = make_train_augment(32, (0, 0, 0), (1, 1, 1))
    imgs = synthetic_dataset(n=4, hw=64).images
    out = np.asarray(aug(jax.random.key(0), imgs))
    assert out.shape == (4, 32, 32, 3)
    assert out.min() >= -0.01 and out.max() <= 1.01  # still in [0,1]


def test_epoch_batches_multihost_shards_disjoint():
    ds = synthetic_dataset(n=64)
    all_idx = []
    for p in range(4):
        for xb, yb in epoch_batches(
            ds, 4, seed=1, epoch=0, process_index=p, process_count=4
        ):
            all_idx.extend(yb.tolist())
    # 4 hosts x 16 samples each = whole epoch, no overlap in positions
    assert len(all_idx) == 64
    # same seed+epoch across hosts -> deterministic global coverage
    again = []
    for p in range(4):
        for xb, yb in epoch_batches(
            ds, 4, seed=1, epoch=0, process_index=p, process_count=4
        ):
            again.extend(yb.tolist())
    assert all_idx == again
