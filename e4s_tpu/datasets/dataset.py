"""Datasets + label taxonomies (CelebAMask-HQ / FFHQ).

Parity target: src/datasets/dataset.py. The 19->12 / 19->9 class converters
reproduce the reference mappings exactly (they differ between the CelebA and
face-parsing.PyTorch taxonomies — note the permutation!). Host-side loading is
plain PIL/numpy; batches are assembled NCHW float32 and sharded onto the mesh
by the training loop.
"""

from __future__ import annotations

import os
import os.path as osp
import random
import threading
import queue as queue_mod
from typing import Callable, Optional

import numpy as np

# ref: src/datasets/dataset.py:14-32
CELEBA_LABEL_LIST = [
    "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow", "l_ear",
    "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r", "neck_l",
    "neck", "cloth",
]
FACE_PARSING_LABEL_LIST = [
    "skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g", "l_ear", "r_ear",
    "ear_r", "nose", "mouth", "u_lip", "l_lip", "neck", "neck_l", "cloth",
    "hair", "hat",
]
FACEPARSER_LABEL_LIST = [
    "background", "mouth", "eyebrows", "eyes", "hair", "nose", "skin", "ears",
    "belowface",
]
FACEPARSER_LABEL_LIST_DETAILED = [
    "background", "lip", "eyebrows", "eyes", "hair", "nose", "skin", "ears",
    "belowface", "mouth", "eye_glass", "ear_rings",
]


def _remap(mask: np.ndarray, pairs) -> np.ndarray:
    out = np.zeros_like(mask)
    for sources, target in pairs:
        sel = np.isin(mask, sources)
        out[sel] = target
    return out


def ffhq_mask_to_faceparser_mask_detailed(mask: np.ndarray) -> np.ndarray:
    """face-parsing.PyTorch 19-cls -> detailed 12-cls.
    ref: src/datasets/dataset.py:60-108"""
    return _remap(
        np.asarray(mask),
        [
            ([12, 13], 1), ([2, 3], 2), ([4, 5], 3), ([17], 4), ([10], 5),
            ([1], 6), ([7, 8], 7), ([14], 8), ([11], 9), ([6], 10), ([9], 11),
        ],
    )


def ffhq_mask_to_faceparser_mask(mask: np.ndarray) -> np.ndarray:
    """face-parsing.PyTorch 19-cls -> 9-cls. ref: dataset.py:110-151"""
    return _remap(
        np.asarray(mask),
        [
            ([11, 12, 13], 1), ([2, 3], 2), ([4, 5], 3), ([17], 4), ([10], 5),
            ([1], 6), ([7, 8], 7), ([14], 8),
        ],
    )


def celebahq_mask_to_faceparser_mask_detailed(mask: np.ndarray) -> np.ndarray:
    """CelebAMask-HQ 19-cls -> detailed 12-cls. ref: dataset.py:153-209"""
    return _remap(
        np.asarray(mask),
        [
            ([11, 12], 1), ([6, 7], 2), ([4, 5], 3), ([13], 4), ([2], 5),
            ([1], 6), ([8, 9], 7), ([17], 8), ([10], 9), ([3], 10), ([15], 11),
        ],
    )


def celebahq_mask_to_faceparser_mask(mask: np.ndarray) -> np.ndarray:
    """CelebAMask-HQ 19-cls -> 9-cls. ref: dataset.py:211-255"""
    return _remap(
        np.asarray(mask),
        [
            ([10, 11, 12], 1), ([6, 7], 2), ([4, 5], 3), ([13], 4), ([2], 5),
            ([1], 6), ([8, 9], 7), ([17], 8),
        ],
    )


def to_tensor(img) -> np.ndarray:
    """PIL/uint8 HWC -> float32 CHW in [0,1] (torchvision ToTensor parity).

    Routes through the native C++ kernel (native/preprocess.cpp) when built.
    """
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        from e4s_tpu.datasets import native

        if native.available():
            return native.to_tensor_normalize(arr, normalize=False)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = arr.astype(np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1))


def normalize_img(x: np.ndarray) -> np.ndarray:
    """Normalize((0.5,)*3, (0.5,)*3): [0,1] -> [-1,1]."""
    return x * 2.0 - 1.0


def label_map_to_onehot(label: np.ndarray, num_cls: int = 12) -> np.ndarray:
    """[B,1,H,W] int -> [B,num_cls,H,W] one-hot float32.
    ref: src/utils/torch_utils.py:166-172"""
    label = np.asarray(label)
    B, _, H, W = label.shape
    onehot = np.zeros((B, num_cls, H, W), dtype=np.float32)
    for c in range(num_cls):
        onehot[:, c] = (label[:, 0] == c).astype(np.float32)
    return onehot


class CelebAHQDataset:
    """28000 train / 2000 test split by index. ref: dataset.py:258-338"""

    def __init__(
        self,
        dataset_root: str,
        mode: str = "test",
        load_vis_img: bool = False,
        fraction: float = 1.0,
        flip_p: float = -1.0,
        label_converter: Callable = celebahq_mask_to_faceparser_mask_detailed,
        normalize: bool = True,
    ):
        self.root = dataset_root
        self.mode = mode
        self.load_vis_img = load_vis_img
        self.flip_p = flip_p
        self.label_converter = label_converter
        self.normalize = normalize
        rng = range(28000) if mode == "train" else range(28000, 30000)
        self.imgs = sorted(
            osp.join(self.root, "CelebA-HQ-img", "%d.jpg" % i) for i in rng
        )
        self.labels = sorted(
            osp.join(self.root, "CelebA-HQ-mask", "%d.png" % i) for i in rng
        )
        # mask visualisations (ref: dataset.py:275-286)
        self.labels_vis = (
            sorted(osp.join(self.root, "vis", "%d.png" % i) for i in rng)
            if load_vis_img else None
        )
        n = int(len(self.imgs) * fraction)
        self.imgs, self.labels = self.imgs[:n], self.labels[:n]
        if load_vis_img:
            self.labels_vis = self.labels_vis[:n]
            assert len(self.imgs) == len(self.labels) == len(self.labels_vis)

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        from PIL import Image

        img = Image.open(self.imgs[idx]).convert("RGB")
        label = Image.open(self.labels[idx]).convert("L")
        img = _load_pair_fast(img, self.normalize)
        label_np = self.label_converter(np.asarray(label))
        label_t = label_np[None].astype(np.int32)  # [1,H,W]
        if self.load_vis_img:
            # un-normalised [0,1] CHW, like the reference's TO_TENSOR-only
            # path (ref: dataset.py:320-323)
            vis = Image.open(self.labels_vis[idx]).convert("RGB")
            label_vis = _load_pair_fast(vis, normalize=False)
        else:
            label_vis = -1  # unified interface (ref: dataset.py:325)
        if self.flip_p > 0 and random.random() < self.flip_p:
            img = img[:, :, ::-1].copy()
            label_t = label_t[:, :, ::-1].copy()
            if self.load_vis_img:
                label_vis = label_vis[:, :, ::-1].copy()
        return img, label_t, label_vis


def _load_pair_fast(img, normalize: bool) -> np.ndarray:
    """Fused uint8 HWC -> normalized float32 CHW via the native kernel."""
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        from e4s_tpu.datasets import native

        if native.available():
            return native.to_tensor_normalize(arr, normalize=normalize)
    out = to_tensor(arr)
    return normalize_img(out) if normalize else out


class FFHQDataset:
    """ref: dataset.py:341-413"""

    def __init__(
        self,
        dataset_root: str,
        fraction: float = 1.0,
        flip_p: float = -1.0,
        label_converter: Callable = ffhq_mask_to_faceparser_mask_detailed,
        normalize: bool = True,
    ):
        self.root = dataset_root
        self.flip_p = flip_p
        self.label_converter = label_converter
        self.normalize = normalize
        with open(osp.join(self.root, "images_1024", "ffhq_list.txt")) as f:
            lines = [l.strip() for l in f if l.strip()]
        self.imgs = sorted(osp.join(self.root, "images_1024", l) for l in lines)
        self.imgs = self.imgs[: int(len(self.imgs) * fraction)]
        self.labels = [p.replace("images_1024", "BiSeNet_mask") for p in self.imgs]

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        from PIL import Image

        img = Image.open(self.imgs[idx]).convert("RGB")
        label = Image.open(self.labels[idx]).convert("L")
        img = _load_pair_fast(img, self.normalize)
        label_np = self.label_converter(np.asarray(label))
        label_t = label_np[None].astype(np.int32)
        if self.flip_p > 0 and random.random() < self.flip_p:
            img = img[:, :, ::-1].copy()
            label_t = label_t[:, :, ::-1].copy()
        return img, label_t, -1


class SyntheticFaceDataset:
    """Deterministic synthetic (image, mask) pairs for tests/benchmarks —
    stands in when no CelebAMask-HQ tree is mounted."""

    def __init__(self, size: int = 1024, num_seg_cls: int = 12, length: int = 64):
        self.size = size
        self.num_seg_cls = num_seg_cls
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        img = rng.rand(3, self.size, self.size).astype(np.float32) * 2 - 1
        yy, xx = np.mgrid[0 : self.size, 0 : self.size]
        cx = self.size / 2 + (idx % 7 - 3) * self.size / 32
        r = np.hypot(yy - self.size / 2, xx - cx)
        label = np.zeros((self.size, self.size), dtype=np.int32)
        label[r < self.size * 0.38] = 6  # skin
        label[r < self.size * 0.1] = 5  # nose
        label[(yy < self.size * 0.35) & (r < self.size * 0.45)] = 4  # hair
        label[(np.abs(yy - self.size * 0.62) < self.size * 0.02) & (r < self.size * 0.2)] = 1
        return img, label[None], -1


class DataLoader:
    """Minimal shuffling batch loader with background prefetch.

    ``num_shards``/``shard_index`` give each process a disjoint slice of
    every (synchronised-seed) shuffled epoch — the torch DistributedSampler
    equivalent (ref: src/training/coach.py:171-177): the index list is
    padded by wrapping to a multiple of num_shards, then strided, so all
    processes see the same number of batches per epoch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_prefetch: int = 2,
        num_seg_cls: int = 12,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_prefetch = num_prefetch
        self.num_seg_cls = num_seg_cls
        assert 0 <= shard_index < num_shards
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def _shard_len(self):
        n = len(self.dataset)
        return -(-n // self.num_shards)  # ceil: padded by wrapping

    def __len__(self):
        n = self._shard_len() // self.batch_size
        if not self.drop_last and self._shard_len() % self.batch_size:
            n += 1
        return n

    def _assemble(self, indices):
        imgs, labels = [], []
        for i in indices:
            img, label, _ = self.dataset[i]
            imgs.append(img)
            labels.append(label)
        img = np.stack(imgs)
        label = np.stack(labels)
        onehot = label_map_to_onehot(label, self.num_cls)
        return img, label, onehot

    @property
    def num_cls(self):
        return self.num_seg_cls

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # seed depends only on (seed, epoch), NOT the shard: every
            # process draws the same permutation, then takes its stride
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        if self.num_shards > 1:
            pad = self._shard_len() * self.num_shards - len(order)
            if pad:
                order = np.concatenate([order, order[:pad]])
            order = order[self.shard_index :: self.num_shards]
        self.epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - (self.batch_size - 1 if self.drop_last else 0), self.batch_size)
        ]
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.num_prefetch)
        stop = object()

        def worker():
            for b in batches:
                q.put(self._assemble(b))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
