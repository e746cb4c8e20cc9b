"""Numerical parity vs the ACTUAL reference PyTorch modules on CPU.

The strongest converter/model evidence available without pretrained weights:
instantiate the reference torch module (random init, randomized BN running
stats), convert its ``state_dict()`` with our converters
(e4s_tpu/utils/torch_convert.py), load into the flax port, and assert the two
frameworks produce the same outputs on the same inputs.

The reference imports come from /root/reference via tests/ref_loader.py, which
stubs only the CUDA-extension op package (src/models/stylegan2/op) with
pure-torch equivalents; everything else runs the reference's own code on
torch-CPU.

Covered here: StyleGAN2 Generator (mask-op) + Discriminator, full Net3
(FSEncoder_PSP + LocalMLPs + Generator + latent_avg), IR-SE50 Backbone,
parsing U-Net, BiSeNet, LPIPS (alex + vgg). Aux-model parity (FaceVid2Vid,
GPEN, RRDBNet, ParseNet) lives in test_torch_parity_aux.py.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import ref_loader  # noqa: E402  (tests/ dir is on sys.path under pytest)

from e4s_tpu.utils import torch_convert as tc  # noqa: E402

ref_loader.install()


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def randomize_bn_stats(module, seed=1):
    """Replace BN running stats with random values so frozen-BN parity is a
    real test (fresh torch modules have mean=0/var=1, which would mask
    conversion bugs)."""
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


def region_onehot(batch, R, S, seed=2):
    g = np.random.RandomState(seed)
    lab = (g.rand(batch, S, S) * R).astype(np.int32)
    oh = np.zeros((batch, R, S, S), np.float32)
    for c in range(R):
        oh[:, c] = lab == c
    return oh


def assert_close(t_out, j_out, tol, name=""):
    t_out = np.asarray(t_out)
    j_out = np.asarray(j_out, np.float32)
    assert t_out.shape == j_out.shape, (name, t_out.shape, j_out.shape)
    scale = max(np.abs(t_out).max(), 1e-3)
    diff = np.abs(t_out - j_out).max() / scale
    assert diff < tol, f"{name}: relative max diff {diff:.3e} >= {tol}"


# --------------------------------------------------------------------------
# op stub self-check: the stub vs our JAX op (two independent rewrites of the
# documented upfirdn2d contract agreeing is evidence both are right)
# --------------------------------------------------------------------------


def test_stub_upfirdn2d_matches_jax_op():
    from e4s_tpu.ops.upfirdn2d import upfirdn2d as jax_upfirdn2d

    op = sys.modules["src.models.stylegan2.op"]
    g = np.random.RandomState(0)
    x = g.randn(2, 3, 16, 16).astype(np.float32)
    k = g.randn(4, 4).astype(np.float32)
    for up, down, pad in ((1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (2, 2))):
        t = op.upfirdn2d(
            torch.tensor(x), torch.tensor(k), up=up, down=down, pad=pad
        ).numpy()
        j = np.asarray(
            jax_upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
        )
        assert_close(t, j, 1e-5, f"upfirdn2d up={up} down={down} pad={pad}")


# --------------------------------------------------------------------------
# StyleGAN2 generator / discriminator
# --------------------------------------------------------------------------


def test_generator_parity():
    """ref: src/models/stylegan2/model.py:451-667 (mask-op Generator)."""
    from src.models.stylegan2.model import Generator as TG

    from e4s_tpu.models.stylegan2 import Generator as JG

    SIZE, R, K = 64, 12, 5
    torch.manual_seed(0)
    tg = TG(
        size=SIZE, style_dim=512, n_mlp=8,
        split_layer_idx=5, remaining_layer_idx=K,
    ).eval()
    sd = tg.state_dict()

    n_latent = 2 * int(np.log2(SIZE)) - 2
    g = np.random.RandomState(0)
    lat = g.randn(1, R, n_latent, 512).astype(np.float32) * 0.5
    mask = region_onehot(1, R, SIZE)
    sf = np.zeros((1, 512, 16, 16), np.float32)

    with torch.no_grad():
        t_out, _, _ = tg(
            [torch.tensor(lat)], torch.tensor(sf), torch.tensor(mask),
            input_is_latent=True, randomize_noise=False,
            return_latents=False, use_structure_code=False,
        )

    variables = {
        "params": tc.convert_generator(sd),
        "noises": tc.extract_generator_noises(sd),
    }
    jg = JG(size=SIZE, remaining_layer_idx=K)
    j_out = jg.apply(
        variables, [jnp.asarray(lat)], jnp.asarray(sf), jnp.asarray(mask),
        input_is_latent=True, randomize_noise=False, use_structure_code=False,
    )[0]
    assert_close(t_out.numpy(), j_out, 1e-4, "generator")


def test_style_mlp_parity():
    """z -> 8-layer style MLP (the mean-latent estimation path, the only
    z-space path the reference exercises with the mask-op generator —
    ref: model.py:470-479 PixelNorm+EqualLinear stack, coach.py:106-136
    latent_avg bootstrap). Full z-space synthesis is unreachable in the
    reference: its masked StyledConv requires regional styles
    (model.py:386-400 indexes style[:, comp_i, :])."""
    from src.models.stylegan2.model import Generator as TG

    from e4s_tpu.models.stylegan2 import Generator as JG

    SIZE, K = 32, 5
    torch.manual_seed(0)
    tg = TG(
        size=SIZE, style_dim=512, n_mlp=8,
        split_layer_idx=5, remaining_layer_idx=K,
    ).eval()
    sd = tg.state_dict()
    g = np.random.RandomState(3)
    z = g.randn(4, 512).astype(np.float32)
    with torch.no_grad():
        t_w = tg.style(torch.tensor(z)).numpy()
    variables = {
        "params": tc.convert_generator(sd),
        "noises": tc.extract_generator_noises(sd),
    }
    jg = JG(size=SIZE, remaining_layer_idx=K)
    j_w = jg.apply(variables, jnp.asarray(z), method=JG.run_style_mlp)
    assert_close(t_w, j_w, 1e-4, "style mlp")


def test_discriminator_parity():
    """ref: src/models/stylegan2/model.py:740-796 (incl. minibatch stddev)."""
    from src.models.stylegan2.model import Discriminator as TD

    from e4s_tpu.models.stylegan2 import Discriminator as JD

    SIZE = 64
    torch.manual_seed(0)
    td = TD(size=SIZE).eval()
    sd = td.state_dict()
    g = np.random.RandomState(4)
    x = g.randn(4, 3, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        t_out = td(torch.tensor(x))
    jd = JD(size=SIZE)
    j_out = jd.apply({"params": tc.convert_discriminator(sd)}, jnp.asarray(x))
    assert_close(t_out.numpy(), j_out, 1e-4, "discriminator")


# --------------------------------------------------------------------------
# Net3 (the full flagship stack)
# --------------------------------------------------------------------------


def test_net3_parity():
    """ref: src/models/networks.py:41-120 — encoder + 12 LocalMLPs +
    latent_avg normalisation + mask-guided synthesis, one forward."""
    from src.models.networks import Net3 as TNet3

    from e4s_tpu.models.net3 import Net3 as JNet3

    SIZE, R, K = 64, 12, 5
    topts = types.SimpleNamespace(
        fsencoder_type="psp", num_seg_cls=R, remaining_layer_idx=K,
        out_size=SIZE, train_G=False, start_from_latent_avg=True,
        learn_in_w=False,
    )
    torch.manual_seed(0)
    tnet = TNet3(topts).eval()
    n_latent = 2 * int(np.log2(SIZE)) - 2
    g = np.random.RandomState(1)
    latent_avg = g.randn(n_latent, 512).astype(np.float32) * 0.1
    tnet.latent_avg = torch.tensor(latent_avg)
    sd = tnet.state_dict()

    img = g.rand(1, 3, SIZE, SIZE).astype(np.float32) * 2 - 1
    mask = region_onehot(1, R, SIZE)
    with torch.no_grad():
        t_out, _ = tnet(
            torch.tensor(img), torch.tensor(mask), randomize_noise=False
        )

    variables = tc.convert_net3_state_dict(sd, num_seg_cls=R)
    jnet = JNet3(
        out_size=SIZE, num_seg_cls=R, remaining_layer_idx=K, n_styles=n_latent
    )
    j_out, _ = jnet.apply(
        variables, jnp.asarray(img), jnp.asarray(mask),
        latent_avg=jnp.asarray(latent_avg), randomize_noise=False,
    )
    assert_close(t_out.numpy(), j_out, 1e-4, "net3")


# --------------------------------------------------------------------------
# IR-SE50 (ID loss backbone)
# --------------------------------------------------------------------------


def test_irse50_parity():
    """ref: src/models/encoders/model_irse.py:9-69 (multi-scale forward as
    used by the ID loss, id_loss.py)."""
    from src.models.encoders.model_irse import Backbone

    from e4s_tpu.models.encoders import IRSE50Backbone

    torch.manual_seed(0)
    tb = Backbone(
        input_size=112, num_layers=50, mode="ir_se",
        drop_ratio=0.6, affine=False,
    ).eval()
    randomize_bn_stats(tb)
    sd = tb.state_dict()
    g = np.random.RandomState(2)
    x = g.randn(2, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        t_feats = tb(torch.tensor(x), multi_scale=True)

    params, stats = tc.split_batch_stats(tc.convert_irse50(sd))
    jb = IRSE50Backbone()
    j_feats = jb.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        multi_scale=True,
    )
    assert len(t_feats) == len(j_feats) == 5
    for i, (a, b) in enumerate(zip(t_feats, j_feats)):
        assert_close(a.numpy(), b, 1e-4, f"irse50 feat{i}")


# --------------------------------------------------------------------------
# parsing U-Net (face-parsing loss trunk)
# --------------------------------------------------------------------------


def test_unet_parity():
    """ref: src/criteria/face_parsing/unet.py (feature_scale=4, 19 classes,
    deconv + BN as instantiated by face_parsing_loss.py:28)."""
    from src.criteria.face_parsing.unet import unet as TUnet

    from e4s_tpu.models.unet import ParsingUNet

    torch.manual_seed(0)
    tu = TUnet().eval()
    randomize_bn_stats(tu)
    sd = tu.state_dict()
    g = np.random.RandomState(5)
    x = g.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tu(torch.tensor(x))
    params, stats = tc.convert_unet(sd)
    ju = ParsingUNet()
    j_out = ju.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    assert_close(t_out.numpy(), j_out, 1e-4, "unet")


# --------------------------------------------------------------------------
# BiSeNet face parser
# --------------------------------------------------------------------------


def test_bisenet_parity(monkeypatch):
    """ref: src/pretrained/face_parsing/model.py:236-280. The torch module
    downloads ImageNet resnet18 weights in __init__ (resnet.py:83); this image
    has no egress, so load_url is patched to a no-op ({} keeps random init)."""
    import torch.utils.model_zoo as modelzoo

    monkeypatch.setattr(modelzoo, "load_url", lambda url, **kw: {})
    # model.py:15-16 builds module-level .cuda() constants (demo-path
    # normalisation, unused by BiSeNet.forward) — keep them on CPU
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    from src.pretrained.face_parsing.model import BiSeNet as TBiSeNet

    from e4s_tpu.models.bisenet import BiSeNet as JBiSeNet

    torch.manual_seed(0)
    tb = TBiSeNet(n_classes=19).eval()
    randomize_bn_stats(tb)
    sd = tb.state_dict()
    g = np.random.RandomState(6)
    x = g.randn(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        t_out = tb(torch.tensor(x))[0]
    params, stats = tc.convert_bisenet(sd)
    jb = JBiSeNet(n_classes=19)
    j_out = jb.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    if isinstance(j_out, (tuple, list)):
        j_out = j_out[0]
    assert_close(t_out.numpy(), j_out, 1e-4, "bisenet")


# --------------------------------------------------------------------------
# LPIPS
# --------------------------------------------------------------------------


@pytest.mark.parametrize("net_type", ["alex", "vgg"])
def test_lpips_parity(net_type, monkeypatch):
    """ref: src/criteria/lpips/{lpips.py, networks.py}. torchvision trunk
    builders are patched to weights=None (no egress) and get_state_dict to a
    random lin head — parity of the computation, not of the released weights
    (those convert through the same keymaps, tested in test_convert.py)."""
    import torchvision.models as tvm

    orig_alexnet, orig_vgg16 = tvm.alexnet, tvm.vgg16
    monkeypatch.setattr(tvm, "alexnet", lambda *a, **k: orig_alexnet(weights=None))
    monkeypatch.setattr(tvm, "vgg16", lambda *a, **k: orig_vgg16(weights=None))

    import src.criteria.lpips.lpips as ref_lpips_mod
    from src.criteria.lpips.networks import LinLayers

    n_ch = {"alex": (64, 192, 384, 256, 256),
            "vgg": (64, 128, 256, 512, 512)}[net_type]
    torch.manual_seed(0)
    lin = LinLayers(n_ch)
    for p in lin.parameters():
        p.data = torch.rand_like(p.data)
    monkeypatch.setattr(
        ref_lpips_mod, "get_state_dict", lambda *a, **k: lin.state_dict()
    )
    tl = ref_lpips_mod.LPIPS(net_type=net_type).eval()
    sd = tl.state_dict()

    from e4s_tpu.models.lpips_nets import LPIPS as JLPIPS

    g = np.random.RandomState(7)
    x = (g.rand(2, 3, 64, 64).astype(np.float32)) * 2 - 1
    y = (g.rand(2, 3, 64, 64).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        t_out = tl(torch.tensor(x), torch.tensor(y))

    if net_type == "alex":
        feats = tc.convert_alexnet_features(sd, prefix="net.layers")
    else:
        feats = tc.convert_vgg16_features(sd, prefix="net.layers")
    lin_params = tc.convert_lpips_lin(
        {f"{i}.1.weight": sd[f"lin.{i}.1.weight"] for i in range(5)}
    )
    params = {"net": feats}
    params.update(lin_params)
    jl = JLPIPS(net_type=net_type)
    j_out = jl.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    assert_close(t_out.numpy(), j_out, 1e-3, f"lpips-{net_type}")
