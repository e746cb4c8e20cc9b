"""Generate exact torch state-dict key/shape fixtures for every pretrained
checkpoint family the framework converts (VERDICT r1 item 10).

Instantiates the REFERENCE torch modules (/root/reference, CPU, random init —
the released checkpoints' state_dicts have exactly these keys/shapes because
torch state-dict naming is determined by the module tree) with the CUDA
extension loader and model-zoo downloads stubbed out, and dumps
{key: shape} JSON fixtures under tests/fixtures/torch_keymaps/.

Run in a FRESH process (torch-only, no jax — OpenMP/XLA:CPU clash):
    python scripts/gen_key_fixtures.py

The fixtures are committed; tests/test_convert_keymaps.py replays synthetic
state dicts against our converters so naming drift is caught long before real
weights are available.
"""

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "fixtures", "torch_keymaps")


def stub_native():
    """Stub CUDA-extension JIT compilation and weight downloads."""
    import torch.utils.cpp_extension as ce

    class _FakeOp:
        def __getattr__(self, name):
            def fn(*a, **k):
                raise RuntimeError("stubbed native op called")

            return fn

    ce.load = lambda *a, **k: _FakeOp()

    # some reference modules call .cuda() at import time
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import torch.utils.model_zoo as mz

    mz.load_url = lambda *a, **k: {}
    try:
        import torch.hub

        torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    except Exception:
        pass

    # torchvision is absent from this image; reference modules import it
    # only for transforms/save_image utilities that key dumping never calls
    fake_tv = types.ModuleType("torchvision")
    for sub in ("transforms", "utils", "models"):
        m = types.ModuleType(f"torchvision.{sub}")
        setattr(fake_tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    fake_tv.utils.save_image = lambda *a, **k: None
    fake_tv.transforms.functional = types.ModuleType(
        "torchvision.transforms.functional"
    )
    sys.modules["torchvision.transforms.functional"] = (
        fake_tv.transforms.functional
    )

    # RetinaFace needs functional pieces: resnet50 (standard torchvision
    # naming: conv1/bn1/layerN.M.convK|bnK|downsample.{0,1}) and
    # IntermediateLayerGetter (keeps the named children up to the last
    # return layer, preserving state-dict names).
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class ResNet50(nn.Module):
        def __init__(self, **kw):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, 3)
            self.layer2 = self._make_layer(128, 4, 2)
            self.layer3 = self._make_layer(256, 6, 2)
            self.layer4 = self._make_layer(512, 3, 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(2048, 1000)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
            return nn.Sequential(*layers)

    class IntermediateLayerGetter(nn.ModuleDict):
        def __init__(self, model, return_layers):
            remaining = dict(return_layers)
            layers = {}
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = dict(return_layers)

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    fake_tv.models.resnet50 = lambda **kw: ResNet50(**kw)
    mu = types.ModuleType("torchvision.models._utils")
    mu.IntermediateLayerGetter = IntermediateLayerGetter
    sys.modules["torchvision.models._utils"] = mu
    fake_tv.models._utils = mu
    det = types.ModuleType("torchvision.models.detection")
    bbu = types.ModuleType("torchvision.models.detection.backbone_utils")
    det.backbone_utils = bbu
    sys.modules["torchvision.models.detection"] = det
    sys.modules["torchvision.models.detection.backbone_utils"] = bbu
    fake_tv.models.detection = det
    # make `torchvision.models` importable as a pseudo-package
    fake_tv.models.__path__ = []
    sys.modules["torchvision"] = fake_tv


def shapes(module):
    return {k: list(v.shape) for k, v in module.state_dict().items()}


def dump(name, d):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.json")
    with open(path, "w") as f:
        json.dump(d, f, indent=0, sort_keys=True)
    print(f"{name}: {len(d)} keys -> {path}")


def main():
    sys.path.insert(0, REF)
    stub_native()
    import torch

    torch.manual_seed(0)

    # --- E4S core: Net3 (iteration_300000.pt 'state_dict'), G, D ---------
    from src.models.networks import Net3
    from src.models.stylegan2.model import Discriminator, Generator

    opts = types.SimpleNamespace(
        num_seg_cls=12, out_size=1024, remaining_layer_idx=13, n_styles=18,
        fsencoder_type="psp", extra_encoder_input=None, train_G=False,
        device="cpu",
    )
    with torch.device("meta"):
        # meta device: shapes only, no 1024^2 allocations
        net3 = Net3(opts)
        dump("net3_state_dict", shapes(net3))
        g = Generator(1024, 512, 8)
        dump("stylegan2_generator", shapes(g))
        d = Discriminator(1024)
        dump("stylegan2_discriminator", shapes(d))

    # --- IR-SE50 (model_ir_se50.pth) --------------------------------------
    from src.models.encoders.model_irse import Backbone

    with torch.device("meta"):
        irse = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
        dump("ir_se50", shapes(irse))

    # --- BiSeNet face parser (79999_iter.pth) ------------------------------
    from src.pretrained.face_parsing.model import BiSeNet

    with torch.device("meta"):
        bisenet = BiSeNet(n_classes=19)
        dump("bisenet", shapes(bisenet))

    # --- parsing-loss U-Net (face_parsing/model.pth) ------------------------
    from src.criteria.face_parsing.unet import unet

    with torch.device("meta"):
        dump("parsing_unet", shapes(unet()))

    # --- LPIPS trunks -------------------------------------------------------
    # torchvision is not installed here; the trunks' state-dict keys are the
    # fixed public torchvision `features` Sequential indices (alexnet conv
    # layers at 0/3/6/8/10; vgg16 convs at 0,2,5,7,10,12,14,17,19,21,24,26,28)
    # with OIHW conv shapes.
    alex_convs = {0: (64, 3, 11, 11), 3: (192, 64, 5, 5), 6: (384, 192, 3, 3),
                  8: (256, 384, 3, 3), 10: (256, 256, 3, 3)}
    dump("alexnet_features", {
        f"{i}.{p}": (list(s) if p == "weight" else [s[0]])
        for i, s in alex_convs.items() for p in ("weight", "bias")
    })
    vgg_dims = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg = {}
    prev = 3
    for i, c in zip(vgg_idx, vgg_dims):
        vgg[f"{i}.weight"] = [c, prev, 3, 3]
        vgg[f"{i}.bias"] = [c]
        prev = c
    dump("vgg16_features", vgg)

    # --- FaceVid2Vid (00000189-checkpoint.pth.tar) --------------------------
    import yaml

    from src.pretrained.face_vid2vid.modules.generator import (
        OcclusionAwareSPADEGenerator,
    )
    from src.pretrained.face_vid2vid.modules.keypoint_detector import (
        HEEstimator,
        KPDetector,
    )

    with open(os.path.join(REF, "pretrained_ckpts/facevid2vid/vox-256.yaml")) as f:
        cfg = yaml.safe_load(f)
    mp = cfg["model_params"]
    with torch.device("meta"):
        fv_gen = OcclusionAwareSPADEGenerator(
            **mp["generator_params"], **mp["common_params"]
        )
        dump("facevid2vid_generator", shapes(fv_gen))
        fv_kp = KPDetector(**mp["kp_detector_params"], **mp["common_params"])
        dump("facevid2vid_kp_detector", shapes(fv_kp))
        fv_he = HEEstimator(**mp["he_estimator_params"], **mp["common_params"])
        dump("facevid2vid_he_estimator", shapes(fv_he))

    # --- GPEN family (GPEN-BFR-512, RetinaFace-R50, ParseNet, RealESRNet) --
    from src.pretrained.gpen.face_model.gpen_model import FullGenerator

    with torch.device("meta"):
        gpen = FullGenerator(512, 512, 8, channel_multiplier=2, narrow=1,
                             device="cpu")
        dump("gpen_bfr_512", shapes(gpen))

    from src.pretrained.gpen.face_detect.facemodels.retinaface import RetinaFace
    from src.pretrained.gpen.face_detect.data import cfg_re50

    cfg = dict(cfg_re50)
    cfg["pretrain"] = False
    retina = RetinaFace(cfg=cfg, phase="test")
    dump("gpen_retinaface_r50", shapes(retina))

    from src.pretrained.gpen.face_parse.parse_model import ParseNet

    with torch.device("meta"):
        parsenet = ParseNet(512, 512, 32, 64, 19, norm_type="bn",
                            relu_type="LeakyReLU", ch_range=[32, 256])
        dump("gpen_parsenet", shapes(parsenet))

    from src.pretrained.gpen.sr_model.rrdbnet_arch import RRDBNet

    with torch.device("meta"):
        rrdb = RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=32, num_block=23,
                       num_grow_ch=32, scale=2)
        dump("gpen_realesrnet", shapes(rrdb))


if __name__ == "__main__":
    main()
