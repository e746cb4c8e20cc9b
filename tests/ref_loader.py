"""Import the reference PyTorch repo (/root/reference) on CPU for parity tests.

The reference's StyleGAN2 op package JIT-compiles CUDA extensions at import
(src/models/stylegan2/op/upfirdn2d.py:8-15, fused_act.py:9-16), which cannot
work in this CUDA-less image. We install a pure-torch stub package into
``sys.modules`` BEFORE importing any reference module; the stubs implement the
documented op semantics (upfirdn2d = zero-stuff upsample -> pad -> FIR ->
subsample; fused_leaky_relu = biased leaky-relu * scale; conv2d_gradfix =
plain torch convs), written from the op contracts — no reference code is
copied.

Everything else in the reference (encoders, Net3, U-Net, BiSeNet,
FaceVid2Vid, GPEN's CPU-fallback ops) imports and runs on torch-CPU as-is.
"""

from __future__ import annotations

import contextlib
import sys
import types

REF_ROOT = "/root/reference"

_installed = False


def _make_op_stub():
    import torch
    import torch.nn.functional as F
    from torch import nn

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        """Pure-torch upfirdn2d on NCHW input with a [kh,kw] FIR kernel.

        Contract (ref op/upfirdn2d.py docstring-free, semantics per the
        rosinality op): zero-stuff upsample by ``up``, pad by ``pad`` (may be
        negative = crop), correlate with the (flipped) kernel, subsample by
        ``down``.
        """
        B, C, H, W = input.shape
        kh, kw = kernel.shape
        x = input.reshape(B * C, 1, H, W)
        if up > 1:
            # interleave zeros: (N,1,H,W) -> (N,1,H*up,W*up)
            z = x.new_zeros(B * C, 1, H, up, W, up)
            z[:, :, :, 0, :, 0] = x.reshape(B * C, 1, H, W)
            x = z.reshape(B * C, 1, H * up, W * up)
        p0, p1 = int(pad[0]), int(pad[1])
        x = F.pad(x, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
        if p0 < 0 or p1 < 0:
            x = x[
                :, :,
                max(-p0, 0): x.shape[2] - max(-p1, 0),
                max(-p0, 0): x.shape[3] - max(-p1, 0),
            ]
        w = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw).to(x.dtype)
        x = F.conv2d(x, w)
        x = x[:, :, ::down, ::down]
        return x.reshape(B, C, x.shape[2], x.shape[3])

    def fused_leaky_relu(input, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            rest = [1] * (input.ndim - 2)
            input = input + bias.reshape(1, bias.shape[0], *rest)
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(nn.Module):
        def __init__(self, channel, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = nn.Parameter(torch.zeros(channel))
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(
                input, self.bias, self.negative_slope, self.scale
            )

    gradfix = types.ModuleType("src.models.stylegan2.op.conv2d_gradfix")
    gradfix.conv2d = F.conv2d
    gradfix.conv_transpose2d = F.conv_transpose2d

    @contextlib.contextmanager
    def no_weight_gradients():
        yield

    gradfix.no_weight_gradients = no_weight_gradients

    fused_mod = types.ModuleType("src.models.stylegan2.op.fused_act")
    fused_mod.FusedLeakyReLU = FusedLeakyReLU
    fused_mod.fused_leaky_relu = fused_leaky_relu

    up_mod = types.ModuleType("src.models.stylegan2.op.upfirdn2d")
    up_mod.upfirdn2d = upfirdn2d

    op = types.ModuleType("src.models.stylegan2.op")
    op.FusedLeakyReLU = FusedLeakyReLU
    op.fused_leaky_relu = fused_leaky_relu
    op.upfirdn2d = upfirdn2d
    op.conv2d_gradfix = gradfix
    op.fused_act = fused_mod
    op.upfirdn2d_mod = up_mod
    return op, fused_mod, up_mod, gradfix


def _make_torchvision_stub():
    """Minimal ``torchvision`` for the reference's imports: BiSeNet's
    model.py:8 only imports the name; LPIPS's networks.py needs
    ``models.alexnet(...)``/``models.vgg16(...)`` objects exposing
    ``.features`` with torchvision's exact Sequential layout (the layer
    schedule is public and also documented in e4s_tpu/models/lpips_nets.py).
    Weights are random — parity tests randomize weights anyway.
    """
    import torch.nn as nn

    def alexnet(*a, **k):
        feats = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2),
        )
        m = nn.Module()
        m.features = feats
        return m

    def vgg16(*a, **k):
        cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M")
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, int(v), 3, padding=1),
                           nn.ReLU(inplace=True)]
                in_ch = int(v)
        m = nn.Module()
        m.features = nn.Sequential(*layers)
        return m

    models = types.ModuleType("torchvision.models")
    models.alexnet = alexnet
    models.vgg16 = vgg16

    def _unavailable(*a, **k):
        raise NotImplementedError("squeezenet stub not provided")

    models.squeezenet1_1 = _unavailable
    tv = types.ModuleType("torchvision")
    tv.models = models
    tv.__version__ = "0.0-stub"
    return tv, models


def install():
    """Put /root/reference on sys.path with the CUDA-op stub pre-installed."""
    global _installed
    if _installed:
        return
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    op, fused_mod, up_mod, gradfix = _make_op_stub()
    sys.modules["src.models.stylegan2.op"] = op
    sys.modules["src.models.stylegan2.op.fused_act"] = fused_mod
    sys.modules["src.models.stylegan2.op.upfirdn2d"] = up_mod
    sys.modules["src.models.stylegan2.op.conv2d_gradfix"] = gradfix
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401  (real one, if present)
        except ImportError:
            tv, models = _make_torchvision_stub()
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = models
    _installed = True
