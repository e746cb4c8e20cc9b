"""PyTorch checkpoint -> e4s_tpu param-tree converters.

Maps the reference checkpoints onto our flax trees:
- E4S ``iteration_300000.pt`` dict with ``state_dict`` / ``state_dict_ema`` /
  ``latent_avg`` / ``D_state_dict`` (ref: src/training/coach.py:505-517).
- rosinality StyleGAN2 ``stylegan2-ffhq-config-f.pt`` (keys ``g_ema``, ``d``,
  ``latent_avg``) used to bootstrap training (ref: coach.py:106-136).
- IR-SE50 ``model_ir_se50.pth``, parsing U-Net ``model.pth``, torchvision
  AlexNet/VGG16 features + LPIPS lin weights.

All convs stay OIHW (our native layout), so conversion is pure key renaming +
a few squeezes. torch is only imported inside entry points (host-side tool,
never on the compute path).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def remove_module_prefix(state_dict, prefix="module."):
    """ref: src/utils/torch_utils.py:175-182"""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


# ---------------------------------------------------------------------------
# IR-SE trunk pieces (shared by the RGI encoder and the ID-loss backbone)
# ---------------------------------------------------------------------------


def _convert_bottleneck(sd, torch_prefix, out, out_prefix, norm: str):
    """bottleneck_IR_SE(_Ours): res_layer indices
    0=norm 1=conv 2=prelu 3=conv 4=norm 5=SE; shortcut 0=conv 1=norm.
    With InstanceNorm (affine=False) the norms carry no params."""
    p, q = torch_prefix, out_prefix
    if f"{p}.shortcut_layer.0.weight" in sd:
        _set(out, q + ("shortcut_conv", "weight"), _np(sd[f"{p}.shortcut_layer.0.weight"]))
        if norm == "bn":
            _bn(sd, f"{p}.shortcut_layer.1", out, q + ("shortcut_norm",))
    if norm == "bn":
        _bn(sd, f"{p}.res_layer.0", out, q + ("res_norm1",))
    _set(out, q + ("res_conv1", "weight"), _np(sd[f"{p}.res_layer.1.weight"]))
    _set(out, q + ("res_prelu", "weight"), _np(sd[f"{p}.res_layer.2.weight"]))
    _set(out, q + ("res_conv2", "weight"), _np(sd[f"{p}.res_layer.3.weight"]))
    if norm == "bn":
        _bn(sd, f"{p}.res_layer.4", out, q + ("res_norm2",))
    _set(out, q + ("res_se", "fc1", "weight"), _np(sd[f"{p}.res_layer.5.fc1.weight"]))
    _set(out, q + ("res_se", "fc2", "weight"), _np(sd[f"{p}.res_layer.5.fc2.weight"]))


def _bn(sd, torch_prefix, out, out_path, stats_out=None):
    """BatchNorm: weight/bias -> params; running stats -> batch_stats tree."""
    if f"{torch_prefix}.weight" in sd:
        _set(out, out_path + ("weight",), _np(sd[f"{torch_prefix}.weight"]))
        _set(out, out_path + ("bias",), _np(sd[f"{torch_prefix}.bias"]))
    tgt = stats_out if stats_out is not None else out
    _set(tgt, out_path + ("running_mean",), _np(sd[f"{torch_prefix}.running_mean"]))
    _set(tgt, out_path + ("running_var",), _np(sd[f"{torch_prefix}.running_var"]))


def split_batch_stats(tree):
    """Split a converted tree into (params, batch_stats) collections: any
    leaf named running_mean/running_var moves to batch_stats."""
    params: Dict = {}
    stats: Dict = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k in ("running_mean", "running_var"):
                _set(stats, path + (k,), v)
            else:
                _set(params, path + (k,), v)

    walk(tree, ())
    return params, stats


# ---------------------------------------------------------------------------
# Encoder / Net3
# ---------------------------------------------------------------------------


def convert_fsencoder(sd, prefix="encoder"):
    out: Dict = {}
    _set(out, ("input_conv", "weight"), _np(sd[f"{prefix}.input_layer.0.weight"]))
    _set(out, ("input_prelu", "weight"), _np(sd[f"{prefix}.input_layer.2.weight"]))
    i = 0
    while f"{prefix}.body.{i}.res_layer.1.weight" in sd:
        _convert_bottleneck(sd, f"{prefix}.body.{i}", out, (f"body_{i}",), norm="in")
        i += 1
    return out


def convert_irse50(sd):
    """model_ir_se50.pth (keys like input_layer.0.weight, body.0..., output_layer...)."""
    out: Dict = {}
    _set(out, ("input_conv", "weight"), _np(sd["input_layer.0.weight"]))
    _bn(sd, "input_layer.1", out, ("input_bn",))
    _set(out, ("input_prelu", "weight"), _np(sd["input_layer.2.weight"]))
    i = 0
    while f"body.{i}.res_layer.1.weight" in sd:
        _convert_bottleneck(sd, f"body.{i}", out, (f"body_{i}",), norm="bn")
        i += 1
    _bn(sd, "output_layer.0", out, ("output_bn",))
    _set(out, ("output_linear_weight",), _np(sd["output_layer.3.weight"]))
    _set(out, ("output_linear_bias",), _np(sd["output_layer.3.bias"]))
    _bn(sd, "output_layer.4", out, ("output_bn1d",))
    return out


def convert_local_mlps(sd, num_seg_cls=12):
    out: Dict = {}
    for i in range(num_seg_cls):
        _set(out, (f"MLPs_{i}", "fc1", "weight"), _np(sd[f"MLPs.{i}.mlp.0.weight"]))
        _set(out, (f"MLPs_{i}", "fc1", "bias"), _np(sd[f"MLPs.{i}.mlp.0.bias"]))
        _set(out, (f"MLPs_{i}", "fc2", "weight"), _np(sd[f"MLPs.{i}.mlp.2.weight"]))
        _set(out, (f"MLPs_{i}", "fc2", "bias"), _np(sd[f"MLPs.{i}.mlp.2.bias"]))
    return out


# ---------------------------------------------------------------------------
# StyleGAN2 generator / discriminator
# ---------------------------------------------------------------------------


def _convert_modconv(sd, p, out, q):
    _set(out, q + ("weight",), _np(sd[f"{p}.weight"]).squeeze(0))  # [1,O,I,k,k]->OIHW
    _set(out, q + ("modulation", "weight"), _np(sd[f"{p}.modulation.weight"]))
    _set(out, q + ("modulation", "bias"), _np(sd[f"{p}.modulation.bias"]))


def _convert_styled_conv(sd, p, out, q):
    _convert_modconv(sd, f"{p}.conv", out, q + ("conv",))
    _set(out, q + ("noise", "weight"), _np(sd[f"{p}.noise.weight"]))
    _set(out, q + ("activate", "bias"), _np(sd[f"{p}.activate.bias"]))


def _convert_to_rgb(sd, p, out, q):
    _convert_modconv(sd, f"{p}.conv", out, q + ("conv",))
    _set(out, q + ("bias",), _np(sd[f"{p}.bias"]))


def convert_generator(sd, prefix=""):
    """g_ema / G state dict -> params tree (+ 'noises' via extract_noises)."""
    pre = prefix + "." if prefix else ""
    out: Dict = {}
    for i in range(1, 9):
        _set(out, (f"style_{i}", "weight"), _np(sd[f"{pre}style.{i}.weight"]))
        _set(out, (f"style_{i}", "bias"), _np(sd[f"{pre}style.{i}.bias"]))
    _set(out, ("input",), _np(sd[f"{pre}input.input"]))
    _convert_styled_conv(sd, f"{pre}conv1", out, ("conv1",))
    _convert_to_rgb(sd, f"{pre}to_rgb1", out, ("to_rgb1",))
    j = 0
    while f"{pre}convs.{j}.conv.weight" in sd:
        _convert_styled_conv(sd, f"{pre}convs.{j}", out, (f"convs_{j}",))
        j += 1
    j = 0
    while f"{pre}to_rgbs.{j}.conv.weight" in sd:
        _convert_to_rgb(sd, f"{pre}to_rgbs.{j}", out, (f"to_rgbs_{j}",))
        j += 1
    return out


def extract_generator_noises(sd, prefix=""):
    pre = prefix + "." if prefix else ""
    noises = {}
    i = 0
    while f"{pre}noises.noise_{i}" in sd:
        noises[f"noise_{i}"] = _np(sd[f"{pre}noises.noise_{i}"])
        i += 1
    return noises


def _convert_conv_layer(sd, p, out, q, downsample: bool, activate: bool = True):
    """ConvLayer Sequential indices: [Blur?] conv [activate?]."""
    idx = 1 if downsample else 0
    _set(out, q + ("conv", "weight"), _np(sd[f"{p}.{idx}.weight"]))
    if f"{p}.{idx}.bias" in sd:
        _set(out, q + ("conv", "bias"), _np(sd[f"{p}.{idx}.bias"]))
    if activate and f"{p}.{idx + 1}.bias" in sd:
        _set(out, q + ("activate", "bias"), _np(sd[f"{p}.{idx + 1}.bias"]))


def convert_discriminator(sd, prefix=""):
    pre = prefix + "." if prefix else ""
    out: Dict = {}
    _convert_conv_layer(sd, f"{pre}convs.0", out, ("convs_0",), downsample=False)
    j = 1
    while f"{pre}convs.{j}.conv1.0.weight" in sd:
        q = (f"convs_{j}",)
        _convert_conv_layer(sd, f"{pre}convs.{j}.conv1", out, q + ("conv1",), False)
        _convert_conv_layer(sd, f"{pre}convs.{j}.conv2", out, q + ("conv2",), True)
        _convert_conv_layer(
            sd, f"{pre}convs.{j}.skip", out, q + ("skip",), True, activate=False
        )
        j += 1
    _convert_conv_layer(sd, f"{pre}final_conv", out, ("final_conv",), False)
    _set(out, ("final_linear_0", "weight"), _np(sd[f"{pre}final_linear.0.weight"]))
    _set(out, ("final_linear_0", "bias"), _np(sd[f"{pre}final_linear.0.bias"]))
    _set(out, ("final_linear_1", "weight"), _np(sd[f"{pre}final_linear.1.weight"]))
    _set(out, ("final_linear_1", "bias"), _np(sd[f"{pre}final_linear.1.bias"]))
    return out


# ---------------------------------------------------------------------------
# Net3 checkpoint (iteration_300000.pt style)
# ---------------------------------------------------------------------------


def convert_net3_state_dict(sd, num_seg_cls=12):
    """Full Net3 state dict -> ({'params':..., 'noises':...}, latent_avg=None).

    The caller handles the checkpoint dict wrapper (state_dict / latent_avg).
    """
    if any(k.startswith("module.") for k in sd):
        sd = remove_module_prefix(sd)
    params: Dict = {}
    params["encoder"] = convert_fsencoder(sd, prefix="encoder")
    params.update(convert_local_mlps(sd, num_seg_cls))
    params["G"] = convert_generator(sd, prefix="G")
    noises = {"G": extract_generator_noises(sd, prefix="G")}
    return {"params": params, "noises": noises}


def load_e4s_checkpoint(path, num_seg_cls=12):
    """Load iteration_300000.pt -> (variables, ema_params, latent_avg, d_params).

    ref: scripts/face_swap.py:374-376, src/training/coach.py:88-103.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    variables = convert_net3_state_dict(ckpt["state_dict"], num_seg_cls)
    ema = None
    if "state_dict_ema" in ckpt:
        ema = convert_net3_state_dict(ckpt["state_dict_ema"], num_seg_cls)
    latent_avg = _np(ckpt["latent_avg"]) if "latent_avg" in ckpt else None
    d_params = None
    if "D_state_dict" in ckpt:
        d_params = convert_discriminator(remove_module_prefix(ckpt["D_state_dict"]))
    return variables, ema, latent_avg, d_params


def load_stylegan2_checkpoint(path):
    """rosinality stylegan2-ffhq-config-f.pt -> (g_params, g_noises, d_params,
    latent_avg). ref: src/training/coach.py:106-136."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    g = convert_generator(ckpt["g_ema"])
    noises = extract_generator_noises(ckpt["g_ema"])
    d = convert_discriminator(ckpt["d"]) if "d" in ckpt else None
    latent_avg = _np(ckpt["latent_avg"]) if "latent_avg" in ckpt else None
    return g, noises, d, latent_avg


# ---------------------------------------------------------------------------
# Aux nets
# ---------------------------------------------------------------------------


def convert_unet(sd):
    """Parsing U-Net model.pth -> (params, batch_stats)."""
    out: Dict = {}

    def conv_bn_block(p, q):
        # unetConv2: conv1/conv2 = Sequential(Conv, BN, ReLU)
        for idx in (1, 2):
            _set(out, q + (f"conv{idx}", "weight"), _np(sd[f"{p}.conv{idx}.0.weight"]))
            _set(out, q + (f"conv{idx}", "bias"), _np(sd[f"{p}.conv{idx}.0.bias"]))
            _bn(sd, f"{p}.conv{idx}.1", out, q + (f"bn{idx}",))

    for name in ("conv1", "conv2", "conv3", "conv4", "center"):
        conv_bn_block(name, (name,))
    for name in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        _set(out, (name, "up_weight"), _np(sd[f"{name}.up.weight"]))
        _set(out, (name, "up_bias"), _np(sd[f"{name}.up.bias"]))
        conv_bn_block(f"{name}.conv", (name, "conv"))
    _set(out, ("final", "weight"), _np(sd["final.weight"]))
    _set(out, ("final", "bias"), _np(sd["final.bias"]))
    return split_batch_stats(out)


def convert_alexnet_features(sd, prefix="features"):
    """torchvision alexnet state dict -> AlexNetFeatures params."""
    out: Dict = {}
    torch_ids = (0, 3, 6, 8, 10)
    for i, tid in enumerate(torch_ids):
        _set(out, (f"conv{i}", "weight"), _np(sd[f"{prefix}.{tid}.weight"]))
        _set(out, (f"conv{i}", "bias"), _np(sd[f"{prefix}.{tid}.bias"]))
    return out


def convert_vgg16_features(sd, prefix="features"):
    out: Dict = {}
    torch_ids = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    for i, tid in enumerate(torch_ids):
        _set(out, (f"conv{i}", "weight"), _np(sd[f"{prefix}.{tid}.weight"]))
        _set(out, (f"conv{i}", "bias"), _np(sd[f"{prefix}.{tid}.bias"]))
    return out


def convert_bisenet(sd):
    """face-parsing.PyTorch 79999_iter.pth -> (params, batch_stats).

    torch names: cp.resnet.conv1..., cp.arm16/arm32..., cp.conv_head16/32,
    cp.conv_avg, ffm.convblk/conv1/conv2, conv_out/conv_out16/conv_out32.
    """
    out: Dict = {}

    def conv(p, q, bias=False):
        _set(out, q + ("weight",), _np(sd[f"{p}.weight"]))
        if bias and f"{p}.bias" in sd:
            _set(out, q + ("bias",), _np(sd[f"{p}.bias"]))

    def cbr(p, q):  # ConvBNReLU
        conv(f"{p}.conv", q + ("conv",))
        _bn(sd, f"{p}.bn", out, q + ("bn",))

    def arm(p, q):
        cbr(f"{p}.conv", q + ("conv",))
        conv(f"{p}.conv_atten", q + ("conv_atten",))
        _bn(sd, f"{p}.bn_atten", out, q + ("bn_atten",))

    def basic_block(p, q):
        conv(f"{p}.conv1", q + ("conv1",))
        _bn(sd, f"{p}.bn1", out, q + ("bn1",))
        conv(f"{p}.conv2", q + ("conv2",))
        _bn(sd, f"{p}.bn2", out, q + ("bn2",))
        if f"{p}.downsample.0.weight" in sd:
            conv(f"{p}.downsample.0", q + ("downsample_conv",))
            _bn(sd, f"{p}.downsample.1", out, q + ("downsample_bn",))

    r = ("cp", "resnet")
    conv("cp.resnet.conv1", r + ("conv1",))
    _bn(sd, "cp.resnet.bn1", out, r + ("bn1",))
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        for b in (0, 1):
            basic_block(f"cp.resnet.{layer}.{b}", r + (f"{layer}_{b}",))
    arm("cp.arm16", ("cp", "arm16"))
    arm("cp.arm32", ("cp", "arm32"))
    cbr("cp.conv_head32", ("cp", "conv_head32"))
    cbr("cp.conv_head16", ("cp", "conv_head16"))
    cbr("cp.conv_avg", ("cp", "conv_avg"))
    cbr("ffm.convblk", ("ffm", "convblk"))
    conv("ffm.conv1", ("ffm", "conv1"))
    conv("ffm.conv2", ("ffm", "conv2"))
    for name in ("conv_out", "conv_out16", "conv_out32"):
        cbr(f"{name}.conv", (name, "conv"))
        conv(f"{name}.conv_out", (name, "conv_out"))
    return split_batch_stats(out)


def convert_segnext(sd, depths):
    """mmseg SegNeXt (MSCAN + LightHamHead) state dict -> (params, stats).

    torch names (official SegNeXt release / mmseg ConvModule conventions):
    backbone.patch_embed1.proj.{0,1,3,4} (StemConv),
    backbone.patch_embed{2..4}.{proj,norm}, backbone.block{s}.{b}.*,
    backbone.norm{s} (LayerNorm), decode_head.{squeeze,hamburger,align}
    (ConvModule norm name 'gn' for GroupNorm; 'bn' accepted), and
    decode_head.conv_seg. ref: the parser loaded via mmseg
    (src/pretrained/face_parsing/face_parsing_demo.py:182-186, configs
    pretrained_ckpts/face_parsing/segnext.*.py).
    """
    out: Dict = {}

    def take(p, q, bias=True):
        _set(out, q + ("weight",), _np(sd[f"{p}.weight"]))
        if bias and f"{p}.bias" in sd:
            _set(out, q + ("bias",), _np(sd[f"{p}.bias"]))

    def convmodule(p, q_conv, q_norm):
        """mmcv ConvModule with GN: conv (no bias) + norm."""
        take(f"{p}.conv", q_conv, bias=False)
        norm = "gn" if f"{p}.gn.weight" in sd else "bn"
        _set(out, q_norm + ("weight",), _np(sd[f"{p}.{norm}.weight"]))
        _set(out, q_norm + ("bias",), _np(sd[f"{p}.{norm}.bias"]))

    bb = ("backbone",)
    # stage 1 stem: proj indices 0=conv 1=bn 3=conv 4=bn
    take("backbone.patch_embed1.proj.0", bb + ("stem_conv1",))
    _bn(sd, "backbone.patch_embed1.proj.1", out, bb + ("stem_bn1",))
    take("backbone.patch_embed1.proj.3", bb + ("stem_conv2",))
    _bn(sd, "backbone.patch_embed1.proj.4", out, bb + ("stem_bn2",))
    for s in (2, 3, 4):
        take(f"backbone.patch_embed{s}.proj", bb + (f"patch_embed{s}_proj",))
        _bn(sd, f"backbone.patch_embed{s}.norm", out,
            bb + (f"patch_embed{s}_norm",))
    for s in range(1, 5):
        for b in range(depths[s - 1]):
            p = f"backbone.block{s}.{b}"
            q = bb + (f"block{s}_{b}",)
            _set(out, q + ("layer_scale_1",), _np(sd[f"{p}.layer_scale_1"]))
            _set(out, q + ("layer_scale_2",), _np(sd[f"{p}.layer_scale_2"]))
            _bn(sd, f"{p}.norm1", out, q + ("norm1",))
            _bn(sd, f"{p}.norm2", out, q + ("norm2",))
            take(f"{p}.attn.proj_1", q + ("attn_proj_1",))
            take(f"{p}.attn.proj_2", q + ("attn_proj_2",))
            for c in ("conv0", "conv0_1", "conv0_2", "conv1_1", "conv1_2",
                      "conv2_1", "conv2_2", "conv3"):
                take(f"{p}.attn.spatial_gating_unit.{c}",
                     q + ("attn_spatial", c))
            take(f"{p}.mlp.fc1", q + ("mlp_fc1",))
            take(f"{p}.mlp.dwconv.dwconv", q + ("mlp_dwconv",))
            take(f"{p}.mlp.fc2", q + ("mlp_fc2",))
        _set(out, bb + (f"norm{s}_weight",), _np(sd[f"backbone.norm{s}.weight"]))
        _set(out, bb + (f"norm{s}_bias",), _np(sd[f"backbone.norm{s}.bias"]))

    dh = ("decode_head",)
    convmodule("decode_head.squeeze", dh + ("squeeze_conv",),
               dh + ("squeeze_norm",))
    # ham_in: ConvModule(norm_cfg=None) -> biased conv, no norm
    take("decode_head.hamburger.ham_in.conv", dh + ("hamburger", "ham_in"))
    convmodule("decode_head.hamburger.ham_out",
               dh + ("hamburger", "ham_out"),
               dh + ("hamburger", "ham_out_norm"))
    convmodule("decode_head.align", dh + ("align_conv",), dh + ("align_norm",))
    take("decode_head.conv_seg", dh + ("conv_seg",))
    return split_batch_stats(out)


def segnext_variant_from_sd(sd):
    """Infer the size variant from the checkpoint shapes: stage-1 dim
    (patch_embed1.proj.0 out-channels x2) and stage-3 depth."""
    dim1 = int(_np(sd["backbone.patch_embed1.proj.0.weight"]).shape[0]) * 2
    if dim1 == 32:
        return "tiny"
    depth3 = 1 + max(
        int(m.group(1))
        for k in sd
        for m in [re.match(r"backbone\.block3\.(\d+)\.", k)]
        if m
    )
    return {4: "small", 12: "base", 27: "large"}[depth3]


def load_segnext_checkpoint(path, variant=None):
    """mmseg segnext .pth -> (variables, variant) for models.segnext.SegNeXt."""
    import torch

    from e4s_tpu.models.segnext import SEGNEXT_VARIANTS

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = remove_module_prefix(sd)
    inferred = segnext_variant_from_sd(sd)
    if variant is not None and variant != inferred:
        print(
            f"[e4s_tpu] segnext variant {variant!r} requested but checkpoint "
            f"is {inferred!r}; using {inferred!r}"
        )
    variant = inferred
    params, stats = convert_segnext(sd, SEGNEXT_VARIANTS[variant]["depths"])
    return {"params": params, "batch_stats": stats}, variant


def load_bisenet_checkpoint(path):
    """79999_iter.pth -> variables dict for models.bisenet.BiSeNet."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = remove_module_prefix(sd)
    params, stats = convert_bisenet(sd)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# FaceVid2Vid
# ---------------------------------------------------------------------------


def fold_spectral_norm(sd, prefix):
    """Fold eval-mode spectral norm: W = W_orig / (u^T W_mat v)."""
    w = _np(sd[f"{prefix}.weight_orig"])
    u = _np(sd[f"{prefix}.weight_u"])
    v = _np(sd[f"{prefix}.weight_v"])
    w_mat = w.reshape(w.shape[0], -1)
    sigma = float(u @ (w_mat @ v))
    return w / sigma


def _fv_conv(sd, p, out, q, bias=True):
    if f"{p}.weight_orig" in sd:
        _set(out, q + ("weight",), fold_spectral_norm(sd, p))
    else:
        _set(out, q + ("weight",), _np(sd[f"{p}.weight"]))
    if bias and f"{p}.bias" in sd:
        _set(out, q + ("bias",), _np(sd[f"{p}.bias"]))


def _fv_convnorm(sd, p, out, q):
    """torch {p}.conv + {p}.norm -> q/conv, q/norm (Same/Up/Down blocks)."""
    _fv_conv(sd, f"{p}.conv", out, q + ("conv",))
    _bn(sd, f"{p}.norm", out, q + ("norm",))


def _fv_resbottleneck(sd, p, out, q):
    for i in (1, 2, 3):
        _fv_conv(sd, f"{p}.conv{i}", out, q + (f"conv{i}",))
        _bn(sd, f"{p}.norm{i}", out, q + (f"norm{i}",))
    if f"{p}.skip.weight" in sd:
        _fv_conv(sd, f"{p}.skip", out, q + ("skip",))
        _bn(sd, f"{p}.norm4", out, q + ("norm4",))


def _fv_resblock(sd, p, out, q):
    _fv_conv(sd, f"{p}.conv1", out, q + ("conv1",))
    _fv_conv(sd, f"{p}.conv2", out, q + ("conv2",))
    _bn(sd, f"{p}.norm1", out, q + ("norm1",))
    _bn(sd, f"{p}.norm2", out, q + ("norm2",))


def _fv_spade(sd, p, out, q):
    _fv_conv(sd, f"{p}.mlp_shared.0", out, q + ("mlp_shared_conv",))
    _fv_conv(sd, f"{p}.mlp_gamma", out, q + ("mlp_gamma",))
    _fv_conv(sd, f"{p}.mlp_beta", out, q + ("mlp_beta",))


def _fv_spade_block(sd, p, out, q):
    _fv_conv(sd, f"{p}.conv_0", out, q + ("conv_0",))
    _fv_conv(sd, f"{p}.conv_1", out, q + ("conv_1",))
    _fv_spade(sd, f"{p}.norm_0", out, q + ("norm_0",))
    _fv_spade(sd, f"{p}.norm_1", out, q + ("norm_1",))
    if f"{p}.conv_s.weight_orig" in sd or f"{p}.conv_s.weight" in sd:
        _fv_conv(sd, f"{p}.conv_s", out, q + ("conv_s",), bias=False)
        _fv_spade(sd, f"{p}.norm_s", out, q + ("norm_s",))


def convert_kp_detector(sd):
    out: Dict = {}
    i = 0
    while f"predictor.down_blocks.down{i}.conv.weight" in sd:
        _fv_convnorm(sd, f"predictor.down_blocks.down{i}", out,
                     ("predictor", f"down_{i}"))
        i += 1
    _fv_conv(sd, "predictor.conv", out, ("predictor", "conv"))
    i = 0
    while f"predictor.up_blocks.up{i}.conv.weight" in sd:
        _fv_convnorm(sd, f"predictor.up_blocks.up{i}", out,
                     ("predictor", f"up_{i}"))
        i += 1
    _fv_conv(sd, "kp", out, ("kp",))
    return split_batch_stats(out)


def convert_he_estimator(sd):
    out: Dict = {}
    for i in (1, 2, 3, 4, 5):
        _fv_conv(sd, f"conv{i}", out, (f"conv{i}",))
        _bn(sd, f"norm{i}", out, (f"norm{i}",))
    for name, n in (("block1", 3), ("block3", 3), ("block5", 5), ("block7", 2)):
        tag = name[-1]
        for i in range(n):
            _fv_resbottleneck(sd, f"{name}.b{tag}_{i}", out, (f"{name}_{i}",))
    _fv_resbottleneck(sd, "block2", out, ("block2",))
    _fv_resbottleneck(sd, "block4", out, ("block4",))
    _fv_resbottleneck(sd, "block6", out, ("block6",))
    for fc in ("fc_roll", "fc_pitch", "fc_yaw", "fc_t", "fc_exp"):
        _set(out, (f"{fc}_weight",), _np(sd[f"{fc}.weight"]))
        _set(out, (f"{fc}_bias",), _np(sd[f"{fc}.bias"]))
    return split_batch_stats(out)


def convert_fv_generator(sd):
    out: Dict = {}
    # dense motion
    dm = "dense_motion_network"
    i = 0
    while f"{dm}.hourglass.encoder.down_blocks.{i}.conv.weight" in sd:
        _fv_convnorm(sd, f"{dm}.hourglass.encoder.down_blocks.{i}", out,
                     ("dense_motion_network", "hourglass", f"encoder_down_{i}"))
        i += 1
    i = 0
    while f"{dm}.hourglass.decoder.up_blocks.{i}.conv.weight" in sd:
        _fv_convnorm(sd, f"{dm}.hourglass.decoder.up_blocks.{i}", out,
                     ("dense_motion_network", "hourglass", f"decoder_up_{i}"))
        i += 1
    _fv_conv(sd, f"{dm}.hourglass.decoder.conv", out,
             ("dense_motion_network", "hourglass", "decoder_conv"))
    _bn(sd, f"{dm}.hourglass.decoder.norm", out,
        ("dense_motion_network", "hourglass", "decoder_norm"))
    _fv_conv(sd, f"{dm}.mask", out, ("dense_motion_network", "mask"))
    _fv_conv(sd, f"{dm}.compress", out, ("dense_motion_network", "compress"))
    _bn(sd, f"{dm}.norm", out, ("dense_motion_network", "norm"))
    if f"{dm}.occlusion.weight" in sd:
        _fv_conv(sd, f"{dm}.occlusion", out, ("dense_motion_network", "occlusion"))
    # encoder path
    _fv_convnorm(sd, "first", out, ("first",))
    i = 0
    while f"down_blocks.{i}.conv.weight" in sd:
        _fv_convnorm(sd, f"down_blocks.{i}", out, (f"down_blocks_{i}",))
        i += 1
    _fv_conv(sd, "second", out, ("second",))
    i = 0
    while f"resblocks_3d.3dr{i}.conv1.weight" in sd:
        _fv_resblock(sd, f"resblocks_3d.3dr{i}", out, (f"resblocks_3d_{i}",))
        i += 1
    _fv_convnorm(sd, "third", out, ("third",))
    _fv_conv(sd, "fourth", out, ("fourth",))
    # SPADE decoder
    _fv_conv(sd, "decoder.fc", out, ("decoder", "fc"))
    for i in range(6):
        _fv_spade_block(sd, f"decoder.G_middle_{i}", out, ("decoder", f"G_middle_{i}"))
    _fv_spade_block(sd, "decoder.up_0", out, ("decoder", "up_0"))
    _fv_spade_block(sd, "decoder.up_1", out, ("decoder", "up_1"))
    _fv_conv(sd, "decoder.conv_img", out, ("decoder", "conv_img"))
    return split_batch_stats(out)


def load_facevid2vid_checkpoint(path):
    """00000189-checkpoint.pth.tar -> variables for FaceVid2Vid.

    ref: src/pretrained/face_vid2vid/driven_demo.py:46-53
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for key, conv in (
        ("kp_detector", convert_kp_detector),
        ("he_estimator", convert_he_estimator),
        ("generator", convert_fv_generator),
    ):
        params, stats = conv(remove_module_prefix(ckpt[key]))
        out[key] = {"params": params, "batch_stats": stats}
    return out


# ---------------------------------------------------------------------------
# GPEN stack
# ---------------------------------------------------------------------------


def convert_gpen_full_generator(sd):
    """GPEN-BFR-512.pth (FullGenerator) -> params tree.

    torch names: ecd{i}.0.{0,1}, final_linear.0, generator.style.{i},
    generator.input.input, generator.conv1.{conv,noise,activate},
    generator.convs.{j}, generator.to_rgbs.{j}.
    """
    out: Dict = {}
    i = 0
    while f"ecd{i}.0.0.weight" in sd:
        _set(out, (f"ecd{i}", "conv", "weight"), _np(sd[f"ecd{i}.0.0.weight"]))
        if f"ecd{i}.0.0.bias" in sd:
            _set(out, (f"ecd{i}", "conv", "bias"), _np(sd[f"ecd{i}.0.0.bias"]))
        if f"ecd{i}.0.1.bias" in sd:
            _set(out, (f"ecd{i}", "activate", "bias"), _np(sd[f"ecd{i}.0.1.bias"]))
        i += 1
    # downsampling ecds have Blur at index 0: conv at .0.1, act at .0.2
    i = 1
    while f"ecd{i}.0.1.weight" in sd:
        _set(out, (f"ecd{i}", "conv", "weight"), _np(sd[f"ecd{i}.0.1.weight"]))
        if f"ecd{i}.0.2.bias" in sd:
            _set(out, (f"ecd{i}", "activate", "bias"), _np(sd[f"ecd{i}.0.2.bias"]))
        i += 1
    _set(out, ("final_linear", "weight"), _np(sd["final_linear.0.weight"]))
    _set(out, ("final_linear", "bias"), _np(sd["final_linear.0.bias"]))

    g: Dict = {}
    for i in range(1, 9):
        _set(g, (f"style_{i}", "weight"), _np(sd[f"generator.style.{i}.weight"]))
        _set(g, (f"style_{i}", "bias"), _np(sd[f"generator.style.{i}.bias"]))
    _set(g, ("input",), _np(sd["generator.input.input"]))

    def styled(p, q):
        _set(g, q + ("conv", "weight"), _np(sd[f"{p}.conv.weight"]).squeeze(0))
        _set(g, q + ("conv", "modulation", "weight"), _np(sd[f"{p}.conv.modulation.weight"]))
        _set(g, q + ("conv", "modulation", "bias"), _np(sd[f"{p}.conv.modulation.bias"]))
        _set(g, q + ("noise_weight",), _np(sd[f"{p}.noise.weight"]))
        _set(g, q + ("activate", "bias"), _np(sd[f"{p}.activate.bias"]))

    def torgb(p, q):
        _set(g, q + ("conv", "weight"), _np(sd[f"{p}.conv.weight"]).squeeze(0))
        _set(g, q + ("conv", "modulation", "weight"), _np(sd[f"{p}.conv.modulation.weight"]))
        _set(g, q + ("conv", "modulation", "bias"), _np(sd[f"{p}.conv.modulation.bias"]))
        _set(g, q + ("bias",), _np(sd[f"{p}.bias"]))

    styled("generator.conv1", ("conv1",))
    torgb("generator.to_rgb1", ("to_rgb1",))
    j = 0
    while f"generator.convs.{j}.conv.weight" in sd:
        styled(f"generator.convs.{j}", (f"convs_{j}",))
        j += 1
    j = 0
    while f"generator.to_rgbs.{j}.conv.weight" in sd:
        torgb(f"generator.to_rgbs.{j}", (f"to_rgbs_{j}",))
        j += 1
    out["generator"] = g
    return out


def convert_rrdbnet(sd):
    out: Dict = {}
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
        _set(out, (name, "weight"), _np(sd[f"{name}.weight"]))
        _set(out, (name, "bias"), _np(sd[f"{name}.bias"]))
    i = 0
    while f"body.{i}.rdb1.conv1.weight" in sd:
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for c in range(1, 6):
                _set(out, (f"body_{i}", rdb, f"conv{c}", "weight"),
                     _np(sd[f"body.{i}.{rdb}.conv{c}.weight"]))
                _set(out, (f"body_{i}", rdb, f"conv{c}", "bias"),
                     _np(sd[f"body.{i}.{rdb}.conv{c}.bias"]))
        i += 1
    return out


def convert_parsenet(sd):
    """ParseNet-latest.pth -> (params, batch_stats)."""
    out: Dict = {}

    def pn_conv(p, q):
        _set(out, q + ("conv2d", "weight"), _np(sd[f"{p}.conv2d.weight"]))
        if f"{p}.conv2d.bias" in sd:
            _set(out, q + ("conv2d", "bias"), _np(sd[f"{p}.conv2d.bias"]))
        if f"{p}.norm.norm.weight" in sd:
            _bn(sd, f"{p}.norm.norm", out, q + ("norm",))

    def pn_res(p, q):
        if f"{p}.shortcut_func.conv2d.weight" in sd:
            pn_conv(f"{p}.shortcut_func", q + ("shortcut",))
        pn_conv(f"{p}.conv1", q + ("conv1",))
        pn_conv(f"{p}.conv2", q + ("conv2",))

    pn_conv("encoder.0", ("encoder_0",))
    i = 1
    while f"encoder.{i}.conv1.conv2d.weight" in sd:
        pn_res(f"encoder.{i}", (f"encoder_{i}",))
        i += 1
    i = 0
    while f"body.{i}.conv1.conv2d.weight" in sd:
        pn_res(f"body.{i}", (f"body_{i}",))
        i += 1
    i = 0
    while f"decoder.{i}.conv1.conv2d.weight" in sd:
        pn_res(f"decoder.{i}", (f"decoder_{i}",))
        i += 1
    pn_conv("out_img_conv", ("out_img_conv",))
    pn_conv("out_mask_conv", ("out_mask_conv",))
    return split_batch_stats(out)


def convert_retinaface(sd):
    """RetinaFace-R50.pth -> (params, batch_stats)."""
    out: Dict = {}

    def conv(p, q, bias=True):
        _set(out, q + ("weight",), _np(sd[f"{p}.weight"]))
        if bias and f"{p}.bias" in sd:
            _set(out, q + ("bias",), _np(sd[f"{p}.bias"]))

    def bottleneck(p, q):
        for c in (1, 2, 3):
            conv(f"{p}.conv{c}", q + (f"conv{c}",))
            _bn(sd, f"{p}.bn{c}", out, q + (f"bn{c}",))
        if f"{p}.downsample.0.weight" in sd:
            conv(f"{p}.downsample.0", q + ("downsample_conv",))
            _bn(sd, f"{p}.downsample.1", out, q + ("downsample_bn",))

    conv("body.conv1", ("body", "conv1"))
    _bn(sd, "body.bn1", out, ("body", "bn1"))
    for li, blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for b in range(blocks):
            bottleneck(f"body.layer{li}.{b}", ("body", f"layer{li}_{b}"))

    def convbn(p, q):
        conv(f"{p}.0", q + ("conv",))
        _bn(sd, f"{p}.1", out, q + ("bn",))

    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        convbn(f"fpn.{name}", ("fpn", name))
    for s in ("ssh1", "ssh2", "ssh3"):
        for blk in ("conv3X3", "conv5X5_1", "conv5X5_2", "conv7X7_2", "conv7x7_3"):
            convbn(f"{s}.{blk}", (s, blk))
    for i in range(3):
        conv(f"ClassHead.{i}.conv1x1", (f"ClassHead_{i}",))
        conv(f"BboxHead.{i}.conv1x1", (f"BboxHead_{i}",))
        conv(f"LandmarkHead.{i}.conv1x1", (f"LandmarkHead_{i}",))
    return split_batch_stats(out)


def load_gpen_checkpoints(base_dir):
    """Load the 4 GPEN checkpoints (ref: INSTALLATION.md table) into the
    variables dict accepted by FaceEnhancement."""
    import torch

    w = lambda name: os.path.join(base_dir, "weights", name)
    out = {}
    paths = {
        "facegan": (w("GPEN-BFR-512.pth"), convert_gpen_full_generator, False),
        "srmodel": (w("realesrnet_x4.pth"), convert_rrdbnet, "params_ema"),
        "parsenet": (w("ParseNet-latest.pth"), convert_parsenet, False),
        "retinaface": (w("RetinaFace-R50.pth"), convert_retinaface, False),
    }
    for key, (path, conv, subkey) in paths.items():
        if not os.path.exists(path):
            continue
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if subkey and subkey in sd:
            sd = sd[subkey]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = remove_module_prefix(sd)
        res = conv(sd)
        if isinstance(res, tuple):
            out[key] = {"params": res[0], "batch_stats": res[1]}
        else:
            out[key] = {"params": res}
    return out


def convert_lpips_lin(sd, n_layers=5):
    """richzhang LPIPS lin state dict (keys like lin0.model.1.weight or
    0.1.weight depending on release) -> {'lin_i': [1,C,1,1]}."""
    out: Dict = {}
    for i in range(n_layers):
        for key in (f"lin{i}.model.1.weight", f"{i}.1.weight", f"lin{i}.weight"):
            if key in sd:
                out[f"lin_{i}"] = _np(sd[key])
                break
    return out
