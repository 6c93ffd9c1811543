"""Identity-folder dataset tests."""

import os

import numpy as np
import pytest

from facerecognizeonnx_tpu.train.data import IdentityFolderDataset


@pytest.fixture()
def dataset_dir(tmp_path, rng):
    import cv2

    for person in ("alice", "bob", "carol"):
        d = tmp_path / person
        d.mkdir()
        for i in range(3):
            cv2.imwrite(
                str(d / f"{i}.jpg"),
                rng.integers(0, 256, (160, 160, 3), dtype=np.uint8),
            )
    return str(tmp_path)


def test_dataset_enumeration(dataset_dir):
    ds = IdentityFolderDataset(dataset_dir)
    assert ds.num_classes == 3
    assert len(ds) == 9
    assert ds.classes == ["alice", "bob", "carol"]


def test_batches_shapes_and_range(dataset_dir):
    ds = IdentityFolderDataset(dataset_dir)
    x, y = next(ds.batches(batch_size=4, seed=1))
    assert x.shape == (4, 112, 112, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert y.dtype == np.int32 and set(y) <= {0, 1, 2}


def test_epoch_bounded(dataset_dir):
    ds = IdentityFolderDataset(dataset_dir)
    batches = list(ds.batches(batch_size=4, epochs=2))
    assert len(batches) == 4  # floor(9/4)=2 per epoch × 2


def test_augmented_batches_differ_eval_deterministic(dataset_dir):
    """augment=True (the cli train default) must actually perturb the
    batch; augment=False (every eval path) must stay bit-deterministic
    across iterators."""
    ds = IdentityFolderDataset(dataset_dir)
    x_plain, y_plain = next(ds.batches(batch_size=8, seed=3))
    x_plain2, y_plain2 = next(ds.batches(batch_size=8, seed=3))
    np.testing.assert_array_equal(x_plain, x_plain2)
    np.testing.assert_array_equal(y_plain, y_plain2)

    x_aug, y_aug = next(ds.batches(batch_size=8, seed=3, augment=True))
    np.testing.assert_array_equal(y_aug, y_plain)  # labels untouched
    assert x_aug.shape == x_plain.shape
    assert x_aug.min() >= -1.0 and x_aug.max() <= 1.0
    assert not np.array_equal(x_aug, x_plain)


def test_augment_flip_only_is_involution(dataset_dir):
    """With jitter=0 every augmented sample is either the original or
    its exact horizontal mirror — nothing else changes."""
    ds = IdentityFolderDataset(dataset_dir)
    x_plain, _ = next(ds.batches(batch_size=8, seed=5))
    x_aug, _ = next(ds.batches(batch_size=8, seed=5, augment=True, jitter=0))
    flipped = 0
    for a, p in zip(x_aug, x_plain):
        if np.array_equal(a, p):
            continue
        np.testing.assert_array_equal(a, p[:, ::-1])
        flipped += 1
    assert flipped > 0  # p=0.5 over 8 samples: all-unflipped would be 1/256


def test_min_images_filter(dataset_dir, rng):
    import cv2

    lone = os.path.join(dataset_dir, "dave")
    os.makedirs(lone)
    cv2.imwrite(
        os.path.join(lone, "only.jpg"),
        rng.integers(0, 256, (60, 60, 3), dtype=np.uint8),
    )
    ds = IdentityFolderDataset(dataset_dir, min_images_per_id=2)
    assert "dave" not in ds.classes
    assert ds.num_classes == 3
