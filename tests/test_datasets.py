"""CelebAMask-HQ dataset loading (synthetic on-disk tree; the real data is
not present in this image). ref: src/datasets/dataset.py:258-338."""

import os

import numpy as np
import pytest


@pytest.fixture()
def celebahq_tree(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    (tmp_path / "CelebA-HQ-img").mkdir()
    (tmp_path / "CelebA-HQ-mask").mkdir()
    (tmp_path / "vis").mkdir()
    # test split indices are 28000..29999 (ref: dataset.py:277-279)
    for i in range(28000, 28002):
        Image.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)
        ).save(tmp_path / "CelebA-HQ-img" / f"{i}.jpg")
        Image.fromarray(
            rng.randint(0, 19, (32, 32), np.uint8), mode="L"
        ).save(tmp_path / "CelebA-HQ-mask" / f"{i}.png")
        Image.fromarray(
            rng.randint(0, 255, (32, 32, 3), np.uint8)
        ).save(tmp_path / "vis" / f"{i}.png")
    return tmp_path


def test_celebahq_dataset_basic(celebahq_tree):
    from e4s_tpu.datasets.dataset import CelebAHQDataset

    ds = CelebAHQDataset(str(celebahq_tree), mode="test")
    img, label, vis = ds[0]
    assert img.shape == (3, 32, 32) and img.dtype == np.float32
    assert label.shape == (1, 32, 32) and label.dtype == np.int32
    assert label.max() < 12  # 19-cls -> 12-cls conversion applied
    assert vis == -1  # unified interface (ref: dataset.py:325)


def test_celebahq_dataset_vis_img(celebahq_tree):
    from e4s_tpu.datasets.dataset import CelebAHQDataset

    ds = CelebAHQDataset(str(celebahq_tree), mode="test", load_vis_img=True)
    # path lists cover the full split range whether or not files exist
    # (reference behaviour); only the first two indices are materialised here
    assert len(ds) == 2000
    img, label, vis = ds[0]
    assert vis.shape == (3, 32, 32) and vis.dtype == np.float32
    # TO_TENSOR-only path: [0,1], no normalisation (ref: dataset.py:320-323)
    assert 0.0 <= vis.min() and vis.max() <= 1.0


def test_celebahq_dataset_synchronized_flip(celebahq_tree):
    import random

    from e4s_tpu.datasets.dataset import CelebAHQDataset

    ds = CelebAHQDataset(
        str(celebahq_tree), mode="test", load_vis_img=True, flip_p=2.0
    )
    ds_noflip = CelebAHQDataset(str(celebahq_tree), mode="test",
                                load_vis_img=True)
    random.seed(0)
    img_f, label_f, vis_f = ds[0]
    img, label, vis = ds_noflip[0]
    np.testing.assert_array_equal(img_f, img[:, :, ::-1])
    np.testing.assert_array_equal(label_f, label[:, :, ::-1])
    np.testing.assert_array_equal(vis_f, vis[:, :, ::-1])
