"""FULL-PIPELINE glue parity vs the actual reference on torch-CPU.

Every module is already numerically parity-tested (test_torch_parity*.py);
this file tests the COMPOSITION: resize kernels (skimage vs jnp), the
BicubicDownSample parser preprocessing, uint8 rounding, mask-swap ordering,
feather/stitch, and the fv2v->GPEN->Net3 data flow of
``/root/reference/scripts/face_swap.py:149-331`` (faceSwapping_pipeline,
default no-crop path) against ``e4s_tpu.pipelines.face_swap.FaceSwapper``
with SHARED converted random weights.

Determinism notes:
- StyleGAN2-style noise injections have zero strength at random init (both
  Net3's generator and GPEN), so randomize_noise has no effect on either
  side.
- The RetinaFace ClassHead weights are zeroed so both sides deterministically
  detect no face (softmax == 0.5 < 0.9 threshold) and GPEN takes the SR-only
  path. The per-face warp/composite glue is covered separately in
  test_gpen_process_glue_parity with an injected detection.

Runtime: the 1024^2 torch reference on one CPU core takes several minutes;
the whole file is marked slow.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ref_loader  # noqa: E402

ref_loader.install()

from e4s_tpu.utils import torch_convert as tc  # noqa: E402

pytestmark = pytest.mark.slow

REF_ROOT = "/root/reference"
VOX_YAML = os.path.join(REF_ROOT, "pretrained_ckpts/facevid2vid/vox-256.yaml")
EXAMPLE = "/root/repo/example/input/faceswap"


def psnr(a, b, data_range=255.0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(data_range**2 / mse)


def _load_ref_face_swap():
    """Load the reference pipeline script, fixing ONE broken line.

    ``face_swap.py:283`` does ``is_foreground[hole_index[None]] = True``
    with ``hole_index`` already [1,1,H,W] — a 5-D boolean mask on a 4-D
    tensor, which every torch in memory rejects (verified: IndexError on
    torch 2.13 for numpy and tensor masks alike, any values). The evident
    intent is "holes are foreground"; we drop the stray ``[None]`` so the
    reference path can run at all. Our pipeline implements the same
    semantics (``fg = ~bg | (hole == 255)``, pipelines/face_swap.py:306).
    """
    path = os.path.join(REF_ROOT, "scripts", "face_swap.py")
    with open(path) as f:
        src = f.read()
    broken = "is_foreground[hole_index[None]] = True"
    assert src.count(broken) == 1, "reference changed; revisit the patch"
    src = src.replace(broken, "is_foreground[hole_index] = True")
    mod = types.ModuleType("ref_face_swap")
    mod.__file__ = path
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def _zero_classhead(retina_net):
    """Zero every ClassHead conv so conf softmax == 0.5 exactly -> no
    detections on BOTH sides regardless of float noise."""
    with torch.no_grad():
        for m in retina_net.ClassHead:
            m.conv1x1.weight.zero_()
            m.conv1x1.bias.zero_()


def _convert_gpen_variables(gpen):
    """Reference FaceEnhancement -> variables dict for our build_restorer."""
    fg_params = tc.convert_gpen_full_generator(gpen.facegan.model.state_dict())
    sr_params = tc.convert_rrdbnet(gpen.srmodel.srmodel.state_dict())
    pn_params, pn_stats = tc.convert_parsenet(
        gpen.faceparser.faceparse.state_dict()
    )
    rf_params, rf_stats = tc.convert_retinaface(
        gpen.facedetector.net.state_dict()
    )
    return {
        "facegan": {"params": fg_params},
        "srmodel": {"params": sr_params},
        "parsenet": {"params": pn_params, "batch_stats": pn_stats},
        "retinaface": {"params": rf_params, "batch_stats": rf_stats},
    }


@pytest.fixture(scope="module")
def ref_models():
    """All reference models, seeded random init, no checkpoint files."""
    # face_parsing/model.py:15-16 builds module-level .cuda() constants;
    # route them to CPU for the whole module (same patch as
    # test_torch_parity.py:312-315, but module-scoped)
    mp = pytest.MonkeyPatch()
    mp.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    # BiSeNet downloads ImageNet resnet18 in __init__ (resnet.py:83); no
    # egress in this image -> keep random init (same as test_bisenet_parity)
    import torch.utils.model_zoo as modelzoo

    mp.setattr(modelzoo, "load_url", lambda url, **kw: {})

    from src.models.networks import Net3 as TNet3
    from src.pretrained.face_vid2vid.driven_demo import load_checkpoints
    from src.pretrained.gpen.face_enhancement import FaceEnhancement

    ref_fs = _load_ref_face_swap()

    with ref_loader.no_pretrained_weights():
        torch.manual_seed(0)
        topts = types.SimpleNamespace(
            fsencoder_type="psp", num_seg_cls=12, remaining_layer_idx=13,
            out_size=1024, train_G=False, start_from_latent_avg=True,
            learn_in_w=False, device="cpu", faceParser_name="default",
            lap_bld=False, num_seg_cls_tmp=None,
        )
        tnet = TNet3(topts).eval()
        g = np.random.RandomState(1)
        latent_avg = g.randn(18, 512).astype(np.float32) * 0.1
        tnet.latent_avg = torch.tensor(latent_avg)

        from src.pretrained.face_parsing.face_parsing_demo import FaceParser

        torch.manual_seed(1)
        fp_model = FaceParser(seg_ckpt="unused.pth", device="cpu")
        # BicubicDownSample hard-codes .cuda tensor types
        # (face_parsing_demo.py:29-54); route to the CPU FloatTensor
        fp_model.downsample.cuda = ""
        fp_model.downsample_256.cuda = ""

        torch.manual_seed(2)
        generator, kp_detector, he_estimator = load_checkpoints(
            config_path=VOX_YAML, checkpoint_path="unused.pth.tar",
            gen="spade", cpu=True,
        )

        torch.manual_seed(3)
        gpen = FaceEnhancement(
            base_dir="unused", in_size=512, model="GPEN-BFR-512",
            use_sr=True, sr_model="realesrnet", sr_scale=4,
            channel_multiplier=2, narrow=1, device="cpu",
        )
        _zero_classhead(gpen.facedetector.net)

    # wire the globals faceSwapping_pipeline reads
    ref_fs.net = tnet
    ref_fs.faceParsing_model = fp_model
    ref_fs.generator = generator
    ref_fs.kp_detector = kp_detector
    ref_fs.he_estimator = he_estimator
    ref_fs.estimate_jacobian = False
    ref_fs.GPEN_model = gpen

    # the stock drive_source_demo hard-codes cuda; same call, cpu=True
    from src.pretrained.face_vid2vid.driven_demo import make_animation

    ref_fs.drive_source_demo = (
        lambda s, ts, gen_, kp, he, ej: make_animation(
            s, ts, gen_, kp, he, relative=True, adapt_movement_scale=True,
            estimate_jacobian=ej, cpu=True,
        )
    )
    yield {
        "ref_fs": ref_fs,
        "tnet": tnet,
        "latent_avg": latent_avg,
        "fp_model": fp_model,
        "fv2v": (kp_detector, he_estimator, generator),
        "gpen": gpen,
        "topts": topts,
    }
    mp.undo()


def _our_swapper(ref):
    """Build FaceSwapper with all weights converted from the ref models."""
    from e4s_tpu.models.bisenet import FaceParser as JFaceParser
    from e4s_tpu.models.facevid2vid.driver import FaceVid2Vid
    from e4s_tpu.models.gpen.face_enhancement import build_restorer
    from e4s_tpu.pipelines.face_swap import FaceSwapper

    kp_detector, he_estimator, generator = ref["fv2v"]
    kp_p, kp_s = tc.convert_kp_detector(kp_detector.state_dict())
    he_p, he_s = tc.convert_he_estimator(he_estimator.state_dict())
    gen_p, gen_s = tc.convert_fv_generator(generator.state_dict())
    fv = FaceVid2Vid(
        variables={
            "kp_detector": {"params": kp_p, "batch_stats": kp_s},
            "he_estimator": {"params": he_p, "batch_stats": he_s},
            "generator": {"params": gen_p, "batch_stats": gen_s},
        }
    )
    reenact = lambda S01, T01: np.asarray(fv.drive(S01, T01))  # noqa: E731

    restorer = build_restorer(
        {"in_size": 512, "use_sr": True, "sr_scale": 4},
        variables=_convert_gpen_variables(ref["gpen"]),
    )

    bn_p, bn_s = tc.convert_bisenet(ref["fp_model"].seg.state_dict())
    parser = JFaceParser(
        variables={"params": bn_p, "batch_stats": bn_s}, size=1024
    )

    opts = types.SimpleNamespace(
        num_seg_cls=12, out_size=1024, remaining_layer_idx=13, n_styles=18,
        start_from_latent_avg=True, learn_in_w=False, bf16=False,
        lap_bld=False, checkpoint_path=None,
    )
    swapper = FaceSwapper(
        opts, reenactor=reenact, restorer=restorer, parser=parser
    )
    swapper.variables = tc.convert_net3_state_dict(
        ref["tnet"].state_dict(), num_seg_cls=12
    )
    swapper.latent_avg = jnp.asarray(ref["latent_avg"])
    return swapper


def test_full_pipeline_parity(ref_models, tmp_path):
    """ref faceSwapping_pipeline vs our FaceSwapper.swap on the example pair:
    same converted random weights, default no-crop path, final image PSNR."""
    ref_fs = ref_models["ref_fs"]
    src = os.path.join(EXAMPLE, "source.jpg")
    tgt = os.path.join(EXAMPLE, "target.jpg")

    ref_dir = tmp_path / "ref"
    with torch.no_grad():
        ref_fs.faceSwapping_pipeline(
            src, tgt, ref_models["topts"], save_dir=str(ref_dir),
            target_mask=None, need_crop=False, verbose=False,
        )
    ref_out = np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            ref_dir / "swap_source_to_target.png"
        ).convert("RGB")
    )

    swapper = _our_swapper(ref_models)
    our_img = swapper.swap(src, tgt, save_dir=str(tmp_path / "ours"))
    our_out = np.asarray(our_img.convert("RGB"))

    # stage check: target parsing must agree almost everywhere (argmax over
    # shared weights; tiny float noise can flip boundary pixels)
    from src.pretrained.face_parsing.face_parsing_demo import faceParsing_demo
    from PIL import Image

    T = Image.open(tgt).convert("RGB").resize((1024, 1024))
    t_mask_ref = faceParsing_demo(
        ref_models["fp_model"], T, convert_to_seg12=True, model_name="default"
    )
    t01 = np.transpose(np.asarray(T, np.float32) / 255.0, (2, 0, 1))[None]
    t_mask_ours = swapper._parse12(t01)[0]
    agree = float(np.mean(t_mask_ref == t_mask_ours))
    assert agree > 0.995, f"T_mask agreement {agree:.4f}"

    p = psnr(ref_out, our_out)
    assert p >= 30.0, f"final swap PSNR {p:.2f} dB < 30"


def test_gpen_process_glue_parity(ref_models):
    """GPEN FaceEnhancement.process per-face glue (warp_and_crop, FaceGAN,
    ParseNet mask, double-GaussianBlur postprocess, inverse warpAffine,
    composite) with one injected detection, shared weights, no SR.
    ref: src/pretrained/gpen/face_enhancement.py:51-110."""
    from src.pretrained.gpen.face_enhancement import FaceEnhancement

    with ref_loader.no_pretrained_weights():
        torch.manual_seed(3)
        ref_gpen = FaceEnhancement(
            base_dir="unused", in_size=512, model="GPEN-BFR-512",
            use_sr=False, sr_model="realesrnet", sr_scale=4,
            channel_multiplier=2, narrow=1, device="cpu",
        )

    from e4s_tpu.models.gpen.face_enhancement import (
        FaceEnhancement as JFaceEnhancement,
    )

    ours = JFaceEnhancement(
        in_size=512, use_sr=False, sr_scale=4,
        variables=_convert_gpen_variables(ref_gpen),
    )

    # one synthetic centered detection, identical on both sides
    h = w = 512
    box = np.array([[w * 0.2, h * 0.2, w * 0.8, h * 0.8, 0.99]], np.float32)
    pts = np.array(
        [[0.38, 0.62, 0.50, 0.40, 0.60], [0.42, 0.42, 0.55, 0.70, 0.70]]
    )
    landms = np.stack(
        [w * (0.2 + 0.6 * pts[0]), h * (0.2 + 0.6 * pts[1])]
    ).reshape(1, 10)

    class FixedDetector:
        def detect(self, img, *a, **k):
            return box.copy(), landms.copy()

    ref_gpen.facedetector = FixedDetector()
    ours.facedetector = FixedDetector()

    g = np.random.RandomState(11)
    img_bgr = (g.rand(h, w, 3) * 255).astype(np.uint8)

    with torch.no_grad():
        ref_out, _, _ = ref_gpen.process(img_bgr.copy())
    our_out, _, _ = ours.process(img_bgr.copy())

    p = psnr(ref_out, our_out)
    assert p >= 35.0, f"GPEN process PSNR {p:.2f} dB < 35"
