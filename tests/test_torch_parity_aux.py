"""Numerical parity vs the reference's aux PyTorch models on CPU.

Same method as test_torch_parity.py: instantiate the reference torch module
(random init + randomized BN running stats), convert its ``state_dict()`` with
our converters, load into the flax port, compare outputs.

Covered: FaceVid2Vid KPDetector / HEEstimator / OcclusionAwareSPADEGenerator
(vox-256 config from the reference's own yaml), GPEN FullGenerator, RRDBNet,
ParseNet. The FaceVid2Vid modules run the reference's sync_batchnorm in eval
mode (plain BN semantics) on CPU unmodified; GPEN's op package CPU-falls-back
by itself (src/pretrained/gpen/face_model/op/upfirdn2d.py:10-18).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

import jax.numpy as jnp  # noqa: E402

import ref_loader  # noqa: E402

from e4s_tpu.utils import torch_convert as tc  # noqa: E402

ref_loader.install()

VOX_YAML = "/root/reference/pretrained_ckpts/facevid2vid/vox-256.yaml"


def vox_config():
    with open(VOX_YAML) as f:
        return yaml.load(f, Loader=yaml.FullLoader)["model_params"]


def randomize_bn_stats(module, seed=1):
    g = np.random.RandomState(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.tensor(g.randn(*v.shape).astype(np.float32) * 0.1)
        elif k.endswith("running_var"):
            sd[k] = torch.tensor(
                np.abs(g.randn(*v.shape).astype(np.float32)) + 0.5
            )
    module.load_state_dict(sd)
    return module


def assert_close(t_out, j_out, tol, name=""):
    t_out = np.asarray(t_out)
    j_out = np.asarray(j_out, np.float32)
    assert t_out.shape == j_out.shape, (name, t_out.shape, j_out.shape)
    scale = max(np.abs(t_out).max(), 1e-3)
    diff = np.abs(t_out - j_out).max() / scale
    assert diff < tol, f"{name}: relative max diff {diff:.3e} >= {tol}"


# --------------------------------------------------------------------------
# FaceVid2Vid
# --------------------------------------------------------------------------


def test_kp_detector_parity():
    """ref: face_vid2vid/modules/keypoint_detector.py:9-82 with the vox-256
    kp_detector_params (driven_demo.py:36-38)."""
    from src.pretrained.face_vid2vid.modules.keypoint_detector import (
        KPDetector as TKP,
    )

    from e4s_tpu.models.facevid2vid.keypoint_detector import KPDetector

    cfg = vox_config()
    torch.manual_seed(0)
    tkp = TKP(**cfg["kp_detector_params"], **cfg["common_params"]).eval()
    randomize_bn_stats(tkp)
    sd = tkp.state_dict()

    g = np.random.RandomState(2)
    x = g.rand(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        t_out = tkp(torch.tensor(x))["value"].numpy()

    params, stats = tc.convert_kp_detector(sd)
    jkp = KPDetector()
    j_out = jkp.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )["value"]
    assert_close(t_out, j_out, 1e-3, "kp_detector")


def test_he_estimator_parity():
    """ref: keypoint_detector.py:85-178 (incl. the yaw/roll head-name swap at
    :172-174) with vox-256 he_estimator_params."""
    from src.pretrained.face_vid2vid.modules.keypoint_detector import (
        HEEstimator as THE,
    )

    from e4s_tpu.models.facevid2vid.keypoint_detector import HEEstimator

    cfg = vox_config()
    torch.manual_seed(0)
    the = THE(**cfg["he_estimator_params"], **cfg["common_params"]).eval()
    randomize_bn_stats(the)
    sd = the.state_dict()

    g = np.random.RandomState(3)
    x = g.rand(1, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        t_out = the(torch.tensor(x))

    params, stats = tc.convert_he_estimator(sd)
    jhe = HEEstimator()
    j_out = jhe.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    for key in ("yaw", "pitch", "roll", "t", "exp"):
        assert_close(t_out[key].numpy(), j_out[key], 1e-3, f"he.{key}")


def test_fv_generator_parity():
    """ref: face_vid2vid/modules/generator.py OcclusionAwareSPADEGenerator +
    dense_motion.py, vox-256 generator_params; keypoints fed as {'value'}
    dicts exactly as animate.py does."""
    from src.pretrained.face_vid2vid.modules.generator import (
        OcclusionAwareSPADEGenerator as TGen,
    )

    from e4s_tpu.models.facevid2vid.generator import (
        OcclusionAwareSPADEGenerator as JGen,
    )

    cfg = vox_config()
    torch.manual_seed(0)
    tg = TGen(**cfg["generator_params"], **cfg["common_params"]).eval()
    randomize_bn_stats(tg)
    sd = tg.state_dict()

    g = np.random.RandomState(4)
    src = g.rand(1, 3, 256, 256).astype(np.float32)
    kp_s = g.rand(1, 15, 3).astype(np.float32) * 2 - 1
    kp_d = g.rand(1, 15, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out = tg(
            torch.tensor(src),
            kp_source={"value": torch.tensor(kp_s)},
            kp_driving={"value": torch.tensor(kp_d)},
        )["prediction"].numpy()

    params, stats = tc.convert_fv_generator(sd)
    jg = JGen()
    j_out = jg.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(src),
        kp_driving={"value": jnp.asarray(kp_d)},
        kp_source={"value": jnp.asarray(kp_s)},
    )
    if isinstance(j_out, dict):
        j_out = j_out["prediction"]
    assert_close(t_out, j_out, 1e-3, "fv_generator")


# --------------------------------------------------------------------------
# GPEN
# --------------------------------------------------------------------------


def test_gpen_full_generator_parity():
    """ref: gpen/face_model/gpen_model.py:628-692 (FullGenerator; the op
    package CPU-falls-back natively)."""
    from src.pretrained.gpen.face_model.gpen_model import FullGenerator as TFG

    from e4s_tpu.models.gpen.gpen_model import GPENFullGenerator

    SIZE = 64
    torch.manual_seed(0)
    tfg = TFG(SIZE, 512, 8, channel_multiplier=2, narrow=1, device="cpu").eval()
    sd = tfg.state_dict()

    g = np.random.RandomState(5)
    x = g.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out, _ = tfg(torch.tensor(x))

    params = tc.convert_gpen_full_generator(sd)
    jfg = GPENFullGenerator(size=SIZE)
    j_out = jfg.apply({"params": params}, jnp.asarray(x))
    if isinstance(j_out, tuple):
        j_out = j_out[0]
    assert_close(t_out.numpy(), j_out, 1e-4, "gpen_full_generator")


def test_rrdbnet_parity():
    """ref: gpen/sr_model/rrdbnet_arch.py:64-116 (RealESRNet trunk)."""
    from src.pretrained.gpen.sr_model.rrdbnet_arch import RRDBNet as TRRDB

    from e4s_tpu.models.gpen.rrdbnet import RRDBNet

    torch.manual_seed(0)
    tr = TRRDB(3, 3, scale=4, num_feat=16, num_block=2, num_grow_ch=8).eval()
    sd = tr.state_dict()
    g = np.random.RandomState(6)
    x = g.rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        t_out = tr(torch.tensor(x))
    params = tc.convert_rrdbnet(sd)
    jr = RRDBNet(scale=4, num_feat=16, num_block=2, num_grow_ch=8)
    j_out = jr.apply({"params": params}, jnp.asarray(x))
    assert_close(t_out.numpy(), j_out, 1e-4, "rrdbnet")


def test_parsenet_parity():
    """ref: gpen/face_parse/parse_model.py:21-77 as instantiated by
    face_parsing.py:34 (in=out=512, ch_range=[32,256], LeakyReLU, bn)."""
    from src.pretrained.gpen.face_parse.parse_model import ParseNet as TPN

    from e4s_tpu.models.gpen.parsenet import ParseNet

    SIZE = 128
    torch.manual_seed(0)
    tp = TPN(SIZE, SIZE, 32, 64, 19, norm_type="bn", relu_type="LeakyReLU",
             ch_range=[32, 256]).eval()
    randomize_bn_stats(tp)
    sd = tp.state_dict()
    g = np.random.RandomState(7)
    x = g.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_mask, t_img = tp(torch.tensor(x))
    params, stats = tc.convert_parsenet(sd)
    jp = ParseNet(in_size=SIZE, out_size=SIZE)
    j_mask, j_img = jp.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    assert_close(t_mask.numpy(), j_mask, 1e-3, "parsenet mask")
    assert_close(t_img.numpy(), j_img, 1e-3, "parsenet img")
