"""RetinaFace (ResNet50 backbone) face detector + prior-box decoding.

Parity targets:
- src/pretrained/gpen/face_detect/facemodels/retinaface.py (cfg_re50: FPN over
  torchvision resnet50 layer2/3/4, SSH heads, 2 anchors x 3 scales)
- face_detect/layers/functions/prior_box.py, utils/box_utils.py (decode),
  utils/nms/py_cpu_nms.py (host-side NMS).

The network runs jitted on device; prior decoding + NMS stay host numpy (tiny,
data-dependent shapes).
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.models.bisenet import _max_pool_3_2_pad1
from e4s_tpu.ops.resize import nearest_resize

CFG_RE50 = {
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "in_channel": 256,
    "out_channel": 256,
}


class Bottleneck(nn.Module):
    """torchvision resnet50 bottleneck."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv(self.planes, 1, use_bias=False, name="conv1")(x)
        out = jax.nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = Conv(self.planes, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(out)
        out = jax.nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        out = Conv(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            sc = Conv(self.planes * 4, 1, stride=self.stride, use_bias=False, name="downsample_conv")(x)
            sc = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class ResNet50Trunk(nn.Module):
    """torchvision resnet50 up to layer4; returns (layer2, layer3, layer4)."""

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        x = _max_pool_3_2_pad1(x)
        feats = []
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0),
                    name=f"layer{li + 1}_{b}",
                )(x)
            feats.append(x)
        return feats[1], feats[2], feats[3]


class ConvBN(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        pad = 1 if self.kernel_size == 3 else 0
        x = Conv(self.out_channels, self.kernel_size, stride=self.stride,
                 padding=pad, use_bias=False, name="conv")(x)
        x = FrozenBatchNorm(self.out_channels, name="bn")(x)
        if self.relu:
            x = jax.nn.leaky_relu(x, self.leaky) if self.leaky > 0 else jax.nn.relu(x)
        return x


class SSH(nn.Module):
    """ref: facemodels/net.py:40-66"""

    out_channel: int = 256

    @nn.compact
    def __call__(self, x):
        oc = self.out_channel
        c3 = ConvBN(oc // 2, relu=False, name="conv3X3")(x)
        c5_1 = ConvBN(oc // 4, name="conv5X5_1")(x)
        c5 = ConvBN(oc // 4, relu=False, name="conv5X5_2")(c5_1)
        c7_2 = ConvBN(oc // 4, name="conv7X7_2")(c5_1)
        c7 = ConvBN(oc // 4, relu=False, name="conv7x7_3")(c7_2)
        return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=1))


class FPN(nn.Module):
    """ref: facemodels/net.py:68-98"""

    out_channels: int = 256

    @nn.compact
    def __call__(self, f1, f2, f3):
        o1 = ConvBN(self.out_channels, 1, name="output1")(f1)
        o2 = ConvBN(self.out_channels, 1, name="output2")(f2)
        o3 = ConvBN(self.out_channels, 1, name="output3")(f3)
        o2 = o2 + nearest_resize(o3, o2.shape[-2:])
        o2 = ConvBN(self.out_channels, name="merge2")(o2)
        o1 = o1 + nearest_resize(o2, o1.shape[-2:])
        o1 = ConvBN(self.out_channels, name="merge1")(o1)
        return o1, o2, o3


class RetinaFace(nn.Module):
    """ref: facemodels/retinaface.py:49-127 (test phase)."""

    out_channel: int = 256
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        f1, f2, f3 = ResNet50Trunk(name="body")(x)
        p1, p2, p3 = FPN(self.out_channel, name="fpn")(f1, f2, f3)
        feats = [
            SSH(self.out_channel, name="ssh1")(p1),
            SSH(self.out_channel, name="ssh2")(p2),
            SSH(self.out_channel, name="ssh3")(p3),
        ]

        def head(feat, i, n_out, prefix):
            out = Conv(self.num_anchors * n_out, 1, name=f"{prefix}_{i}")(feat)
            out = jnp.transpose(out, (0, 2, 3, 1))
            return out.reshape(out.shape[0], -1, n_out)

        bbox = jnp.concatenate(
            [head(f, i, 4, "BboxHead") for i, f in enumerate(feats)], axis=1
        )
        cls = jnp.concatenate(
            [head(f, i, 2, "ClassHead") for i, f in enumerate(feats)], axis=1
        )
        ldm = jnp.concatenate(
            [head(f, i, 10, "LandmarkHead") for i, f in enumerate(feats)], axis=1
        )
        return bbox, jax.nn.softmax(cls, axis=-1), ldm


# ---------------------------------------------------------------------------
# Prior boxes + decoding + NMS (host numpy)
# ---------------------------------------------------------------------------


def prior_boxes(image_size, cfg=CFG_RE50) -> np.ndarray:
    """ref: layers/functions/prior_box.py"""
    h, w = image_size
    feature_maps = [
        (int(math.ceil(h / s)), int(math.ceil(w / s))) for s in cfg["steps"]
    ]
    anchors = []
    for k, (fh, fw) in enumerate(feature_maps):
        min_sizes = cfg["min_sizes"][k]
        for i, j in itertools.product(range(fh), range(fw)):
            for min_size in min_sizes:
                s_kx = min_size / w
                s_ky = min_size / h
                cx = (j + 0.5) * cfg["steps"][k] / w
                cy = (i + 0.5) * cfg["steps"][k] / h
                anchors.append([cx, cy, s_kx, s_ky])
    out = np.array(anchors, dtype=np.float32)
    if cfg["clip"]:
        out = np.clip(out, 0, 1)
    return out


def decode_boxes(loc, priors, variances=(0.1, 0.2)) -> np.ndarray:
    """ref: utils/box_utils.py decode()"""
    boxes = np.concatenate(
        [
            priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
        ],
        axis=1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def decode_landms(pre, priors, variances=(0.1, 0.2)) -> np.ndarray:
    """ref: utils/box_utils.py decode_landm()"""
    parts = []
    for i in range(5):
        parts.append(
            priors[:, :2] + pre[:, 2 * i : 2 * i + 2] * variances[0] * priors[:, 2:]
        )
    return np.concatenate(parts, axis=1)


def py_cpu_nms(dets, thresh):
    """ref: utils/nms/py_cpu_nms.py"""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = (w * h) / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep


class RetinaFaceDetector:
    """Host wrapper: preprocess -> jitted net -> decode + NMS.

    ref: face_detect/retinaface_detection.py:61-131
    """

    MEAN = np.array([104.0, 117.0, 123.0], dtype=np.float32)

    def __init__(self, variables=None, seed: int = 0, input_size=(512, 512)):
        self.net = RetinaFace()
        if variables is None:
            x0 = jnp.zeros((1, 3) + tuple(input_size), jnp.float32)
            variables = jax.jit(self.net.init)(jax.random.PRNGKey(seed), x0)
        self.variables = variables
        self._jit_net = jax.jit(lambda v, x: self.net.apply(v, x))

    def detect(
        self, img_bgr: np.ndarray, confidence_threshold=0.9, nms_threshold=0.4,
        top_k=5000, keep_top_k=750,
    ):
        """img_bgr: [H,W,3] float/uint8 BGR. Returns (dets [N,5], landms [N,10])."""
        img = np.float32(img_bgr)
        im_h, im_w = img.shape[:2]
        scale = np.array([im_w, im_h, im_w, im_h], dtype=np.float32)
        x = (img - self.MEAN).transpose(2, 0, 1)[None]
        loc, conf, landms = self._jit_net(self.variables, jnp.asarray(x))
        loc = np.asarray(loc)[0]
        conf = np.asarray(conf)[0]
        landms = np.asarray(landms)[0]

        priors = prior_boxes((im_h, im_w))
        boxes = decode_boxes(loc, priors) * scale
        scores = conf[:, 1]
        lm_scale = np.array([im_w, im_h] * 5, dtype=np.float32)
        lms = decode_landms(landms, priors) * lm_scale

        inds = np.where(scores > confidence_threshold)[0]
        boxes, lms, scores = boxes[inds], lms[inds], scores[inds]
        order = scores.argsort()[::-1][:top_k]
        boxes, lms, scores = boxes[order], lms[order], scores[order]
        dets = np.hstack((boxes, scores[:, None])).astype(np.float32)
        keep = py_cpu_nms(dets, nms_threshold)
        dets, lms = dets[keep], lms[keep]
        return dets[:keep_top_k], lms[:keep_top_k]
