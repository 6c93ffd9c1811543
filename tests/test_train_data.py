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
