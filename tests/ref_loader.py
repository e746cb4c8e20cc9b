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


def _make_transforms_stub():
    """``torchvision.transforms`` for the reference pipeline scripts:
    Compose / ToTensor / Normalize with torchvision's documented semantics
    (ToTensor: PIL/ndarray HWC uint8 -> float CHW in [0,1])."""
    import numpy as np
    import torch

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if t.dtype == torch.uint8:
                return t.float().div(255.0)
            return t.float()

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean, dtype=torch.float32)
            self.std = torch.tensor(std, dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    # datasets/dataset.py:8 imports torchvision.transforms.functional as TF
    # and uses TF.hflip on PIL images (dataset.py:335)
    functional = types.ModuleType("torchvision.transforms.functional")

    def hflip(img):
        from PIL import Image

        if isinstance(img, torch.Tensor):
            return torch.flip(img, dims=[-1])
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    functional.hflip = hflip

    mod = types.ModuleType("torchvision.transforms")
    mod.__path__ = []  # package: 'import torchvision.transforms.functional'
    mod.ToTensor = ToTensor
    mod.Normalize = Normalize
    mod.Compose = Compose
    mod.Lambda = Lambda
    mod.functional = functional
    return mod, functional


def _make_skimage_stub():
    """``skimage`` subset used by the reference pipeline scripts.

    ``transform.resize`` follows skimage's actual algorithm (which wraps the
    same scipy.ndimage available here): optional gaussian anti-aliasing with
    sigma = (downscale_factor - 1) / 2, then ``ndi.zoom`` with
    ``grid_mode=True`` and skimage's 'reflect'->ndimage 'mirror' boundary
    mapping. Written from the public skimage docs/semantics.
    """
    import numpy as np
    import scipy.ndimage as ndi

    def resize(image, output_shape, order=None, mode="reflect", cval=0.0,
               clip=True, preserve_range=False, anti_aliasing=None,
               anti_aliasing_sigma=None):
        image = np.asarray(image, dtype=np.float64)
        output_shape = tuple(output_shape)
        if len(output_shape) < image.ndim:
            output_shape = output_shape + image.shape[len(output_shape):]
        in_shape = image.shape
        factors = np.array(
            [i / o for i, o in zip(in_shape, output_shape)], np.float64
        )
        if order is None:
            order = 1
        if anti_aliasing is None:
            anti_aliasing = np.any(factors > 1)
        ndi_mode = {"reflect": "mirror", "symmetric": "reflect",
                    "edge": "nearest", "constant": "constant",
                    "wrap": "wrap"}.get(mode, mode)
        lo, hi = float(image.min()), float(image.max())
        if anti_aliasing:
            if anti_aliasing_sigma is None:
                anti_aliasing_sigma = np.maximum(0.0, (factors - 1) / 2)
            image = ndi.gaussian_filter(
                image, anti_aliasing_sigma, cval=cval, mode=ndi_mode
            )
        zoom_factors = [1 / f for f in factors]
        out = ndi.zoom(image, zoom_factors, order=order, mode=ndi_mode,
                       cval=cval, grid_mode=True)
        if clip:
            out = np.clip(out, lo, hi)
        return out

    def img_as_ubyte(image):
        image = np.asarray(image)
        if image.dtype == np.uint8:
            return image
        return np.clip(np.round(image * 255.0), 0, 255).astype(np.uint8)

    transform = types.ModuleType("skimage.transform")
    transform.resize = resize
    io_mod = types.ModuleType("skimage.io")

    def imread(path):
        import imageio

        return np.asarray(imageio.imread(path))

    io_mod.imread = imread
    sk = types.ModuleType("skimage")
    sk.transform = transform
    sk.io = io_mod
    sk.img_as_ubyte = img_as_ubyte
    sk.__version__ = "0.0-stub"
    return sk, transform, io_mod


@contextlib.contextmanager
def no_pretrained_weights():
    """Run reference model constructors without checkpoint files.

    ``torch.load`` returns an empty self-indexing sentinel and
    ``nn.Module.load_state_dict`` becomes a no-op, so every reference
    wrapper keeps its seeded random init while its loading glue runs
    unchanged. RetinaFaceDetection.check_keys (which asserts >=1 matching
    key) is bypassed too.
    """
    import torch
    from torch import nn

    class _FakeStateDict(dict):
        def __getitem__(self, k):
            return self

        def keys(self):
            return {}.keys()

    fake = _FakeStateDict()
    orig_load = torch.load
    orig_lsd = nn.Module.load_state_dict
    torch.load = lambda *a, **k: fake

    def _noop_lsd(self, state_dict, strict=True, **kw):
        return types.SimpleNamespace(missing_keys=[], unexpected_keys=[])

    nn.Module.load_state_dict = _noop_lsd
    patched_ck = None
    try:
        from src.pretrained.gpen.face_detect.retinaface_detection import (
            RetinaFaceDetection,
        )

        patched_ck = RetinaFaceDetection.check_keys
        RetinaFaceDetection.check_keys = lambda self, sd: True
    except Exception:
        RetinaFaceDetection = None
    try:
        yield
    finally:
        torch.load = orig_load
        nn.Module.load_state_dict = orig_lsd
        if patched_ck is not None:
            RetinaFaceDetection.check_keys = patched_ck


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

    def resnet50(pretrained=False, **kw):
        """Canonical ResNet-50 (Bottleneck 3-4-6-3, v1.5: stride on conv2),
        written from the public torchvision architecture/naming so the
        reference's RetinaFace (facemodels/retinaface.py:68-72) can tap
        layer2/3/4 via IntermediateLayerGetter. Random init only."""
        assert not pretrained, "no egress: pretrained weights unavailable"

        class Bottleneck(nn.Module):
            def __init__(self, inplanes, planes, stride=1, downsample=None):
                super().__init__()
                self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
                self.bn1 = nn.BatchNorm2d(planes)
                self.conv2 = nn.Conv2d(
                    planes, planes, 3, stride, 1, bias=False
                )
                self.bn2 = nn.BatchNorm2d(planes)
                self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
                self.bn3 = nn.BatchNorm2d(planes * 4)
                self.relu = nn.ReLU(inplace=True)
                self.downsample = downsample

            def forward(self, x):
                idn = x
                out = self.relu(self.bn1(self.conv1(x)))
                out = self.relu(self.bn2(self.conv2(out)))
                out = self.bn3(self.conv3(out))
                if self.downsample is not None:
                    idn = self.downsample(x)
                return self.relu(out + idn)

        class ResNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.inplanes = 64
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.relu = nn.ReLU(inplace=True)
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                self.layer1 = self._make_layer(64, 3, 1)
                self.layer2 = self._make_layer(128, 4, 2)
                self.layer3 = self._make_layer(256, 6, 2)
                self.layer4 = self._make_layer(512, 3, 2)
                self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
                self.fc = nn.Linear(512 * 4, 1000)

            def _make_layer(self, planes, blocks, stride):
                downsample = nn.Sequential(
                    nn.Conv2d(
                        self.inplanes, planes * 4, 1, stride, bias=False
                    ),
                    nn.BatchNorm2d(planes * 4),
                )
                layers = [
                    Bottleneck(self.inplanes, planes, stride, downsample)
                ]
                self.inplanes = planes * 4
                layers += [
                    Bottleneck(self.inplanes, planes)
                    for _ in range(1, blocks)
                ]
                return nn.Sequential(*layers)

            def forward(self, x):
                x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
                x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
                return self.fc(self.avgpool(x).flatten(1))

        return ResNet()

    models = types.ModuleType("torchvision.models")
    models.__path__ = []  # mark as package: retinaface.py imports submodules
    models.alexnet = alexnet
    models.vgg16 = vgg16
    models.resnet50 = resnet50

    def _unavailable(*a, **k):
        raise NotImplementedError("squeezenet stub not provided")

    models.squeezenet1_1 = _unavailable

    # GPEN's RetinaFace (face_detect/facemodels/retinaface.py:3-4) imports
    # models.detection.backbone_utils (name only for the mobilenet config)
    # and models._utils.IntermediateLayerGetter (used to tap backbone
    # stages). IntermediateLayerGetter implemented from its public
    # documented contract: run children in order, collect renamed outputs.
    from collections import OrderedDict

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            orig = {str(k): str(v) for k, v in return_layers.items()}
            remaining = dict(orig)
            layers = OrderedDict()
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = OrderedDict()
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    m_utils = types.ModuleType("torchvision.models._utils")
    m_utils.IntermediateLayerGetter = IntermediateLayerGetter
    detection = types.ModuleType("torchvision.models.detection")
    detection.__path__ = []
    backbone_utils = types.ModuleType(
        "torchvision.models.detection.backbone_utils"
    )
    models._utils = m_utils
    models.detection = detection
    detection.backbone_utils = backbone_utils

    tv = types.ModuleType("torchvision")
    tv.models = models
    tv.__version__ = "0.0-stub"
    tv._submodules = {
        "torchvision.models._utils": m_utils,
        "torchvision.models.detection": detection,
        "torchvision.models.detection.backbone_utils": backbone_utils,
    }
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
            transforms, tf_functional = _make_transforms_stub()
            tv.transforms = transforms
            tv.utils = types.ModuleType("torchvision.utils")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = models
            sys.modules["torchvision.transforms"] = transforms
            sys.modules["torchvision.transforms.functional"] = tf_functional
            sys.modules["torchvision.utils"] = tv.utils
            sys.modules.update(tv._submodules)
    if "skimage" not in sys.modules:
        try:
            import skimage  # noqa: F401  (real one, if present)
        except ImportError:
            sk, sk_transform, sk_io = _make_skimage_stub()
            sys.modules["skimage"] = sk
            sys.modules["skimage.transform"] = sk_transform
            sys.modules["skimage.io"] = sk_io
    _installed = True
